package graft.devtools

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the text-pipeline expressions. */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.local(32, "graft-scratch")

    val docs = graft.core.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .repartition(32).localCheckpoint(true)
    time("warm count")(docs.count())

    val words = split(lower(trim(col("text"))), "\\s+")
    val w = docs.select(col("doc_id"), words.as("w"))
    time("split only")(w.agg(sum(size(col("w")))).collect())

    val shingles = array_distinct(
      transform(sequence(lit(1), size(col("w")) - 2),
        i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1),
          element_at(col("w"), i + 2))))
    // size >= 3 filter everywhere shingles are built: a 1-2 token doc
    // makes sequence(1, size-2) descend and element_at(w, 0) throw
    time("shingles no distinct")(w.filter(size(col("w")) >= 3).select(col("doc_id"),
      transform(sequence(lit(1), size(col("w")) - 2),
        i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1),
          element_at(col("w"), i + 2))).as("sh")).agg(sum(size(col("sh")))).collect())
    time("shingles+distinct")(w.filter(size(col("w")) >= 3)
      .select(col("doc_id"), shingles.as("sh"))
      .agg(sum(size(col("sh")))).collect())
    time("shingles ckpt")(w.filter(size(col("w")) >= 3)
      .select(col("doc_id"), shingles.as("shingles")).localCheckpoint(true))

    val hs = w.selectExpr("doc_id",
      "transform(w, x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)) AS hs")
    time("token md5 hashes")(hs.agg(sum(size(col("hs")))).collect())
    val sim = hs.selectExpr("doc_id",
      """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, b) -> acc +
        |  IF(aggregate(hs, 0, (v, h) -> v + IF((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
        |     shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))) AS simhash""".stripMargin)
    time("simhash nested agg")(sim.agg(max(col("simhash"))).collect())
    time("simhash nested agg 2")(sim.agg(max(col("simhash"))).collect())

    for (i <- 1 to 3) {
      time(s"d06 full warm $i")(graft.queries.TextQueries.d06JaccardPairs(spark, dir).count())
      time(s"d07 full warm $i")(graft.queries.TextQueries.d07MinhashLsh(spark, dir).count())
      time(s"d09 full warm $i")(graft.queries.TextQueries.d09SimhashPairs(spark, dir).count())
      time(s"e04 full warm $i")(graft.queries.SimilarityQueries.e04CosineNeardup(spark, dir).count())
    }

    // --- d06/d07 internals ---
    val sh = w.filter(size(col("w")) >= 3)
      .select(col("doc_id"), shingles.as("shingles")).localCheckpoint(true)
    val ex = sh.select(col("doc_id"), size(col("shingles")).as("n"),
      explode(col("shingles")).as("s"))
    val mhCols = (0 until 16).map(j => min(md5(concat(lit(s"$j:"), col("s")))).as(s"mh$j"))
    time("minhash sigs")(ex.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*).count())
    val exh = ex.select(col("doc_id"), col("n"), xxhash64(col("s")).as("s"))
    time("pair join str key")(
      ex.select(col("doc_id").as("doc_a"), col("n").as("na"), col("s"))
        .join(ex.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("s")), Seq("s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common")).count())
    time("pair join hash key")(
      exh.select(col("doc_id").as("doc_a"), col("n").as("na"), col("s"))
        .join(exh.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("s")), Seq("s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common")).count())
    time("intersect verify")(
      sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb")),
          col("doc_a") < col("doc_b") && (col("doc_a") % 100 === col("doc_b") % 100))
        .select(size(array_intersect(col("sa"), col("sb"))).as("c")).agg(max("c")).collect())
    spark.stop()
  }
}
