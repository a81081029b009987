package graft.devtools

/** Dev-only probe: RETURN * / WITH * scope with named relationship and
  * path variables (ADVICE round-8 item — verify what * actually
  * expands to before changing it). */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4, "star-probe")
    import spark.implicits._
    val nodes = Seq(
      ("WasteItem", "u:w1", "Bauschutt"), ("WasteItem", "u:w2", "Asche"),
      ("WasteStream", "u:s1", "Restmuell"), ("Facility", "u:f1", "Hof A"))
      .toDF("label", "uid", "name")
    val edges = Seq(
      ("u:w1", "DISPOSED_IN", "u:s1"), ("u:w2", "DISPOSED_IN", "u:s1"),
      ("u:w1", "DISPOSED_AT", "u:f1")).toDF("src_uid", "rel_type", "dst_uid")
    def t(tag: String, q: String): Unit =
      try {
        val df = graft.graph.CypherFrontend.run(q, nodes, edges)
        println(s"[$tag] OK cols=${df.columns.mkString(",")} rows=${df.count()}")
        df.show(5, truncate = false)
      } catch {
        case e: Throwable => println(s"[$tag] FAIL ${e.getMessage.take(200)}")
      }
    t("return-star-rel",
      "MATCH (w:WasteItem)-[r:DISPOSED_IN]->(s) RETURN * ORDER BY w.name")
    t("with-star-type",
      "MATCH (w:WasteItem)-[r:DISPOSED_IN]->(s) WITH * RETURN w.name AS n, type(r) AS t ORDER BY n")
    t("with-star-path",
      "MATCH p = (w:WasteItem)-[r:DISPOSED_IN]->(s) WITH * RETURN w.name AS n, length(p) AS len ORDER BY n")
    t("return-star-varlen",
      "MATCH (w:WasteItem)-[r*1..2]->(t) RETURN * ORDER BY w.name")
    t("with-star-varlen-size",
      "MATCH (w:WasteItem)-[r*1..2]->(t) WITH * RETURN w.name AS n, size(r) AS k ORDER BY n, k")
    t("return-star-path-refuses",
      "MATCH p = (w:WasteItem)-[r:DISPOSED_IN]->(s) RETURN *")
    spark.stop()
  }
}
