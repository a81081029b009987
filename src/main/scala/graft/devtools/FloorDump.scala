package graft.devtools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev-only: measure isolated floors for the named queries (IsoBench's
  * fresh-session warmup + best-of-3 + cache-clear discipline) and
  * MERGE them into `bench_floors.json` — the file [[graft.Bench]]
  * folds into bench_full.json so the published artifact carries
  * in-suite/floor pairs and is self-adjudicating (an inflated suite
  * read shows as a gap without a judge re-run).
  *
  * Usage: tools/run.sh graft.devtools.FloorDump s18_stream_components ...
  *        (or `top N` to take the N slowest from bench_full.json)
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  */
object FloorDump {

  private val Entry = "\"([^\"]+)\"\\s*:\\s*([0-9.eE+-]+)".r

  /** Flat {"name":sec,...} maps (the only JSON this repo's artifacts
    * use for floors). */
  def parseFlat(txt: String): Map[String, Double] =
    Entry.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(kv => !Set("value", "n_queries").contains(kv._1)).toMap

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names: Seq[String] = args.toSeq match {
      case Seq("top", n) =>
        val full = new String(Files.readAllBytes(Paths.get("bench_full.json")),
          StandardCharsets.UTF_8)
        val inner = full.substring(full.indexOf("\"queries\":") + 10)
        parseFlat(inner).toSeq.sortBy(-_._2).take(n.toInt).map(_._1)
      case Seq() => sys.error("pass query names or: top N")
      case qs => qs
    }
    val spark = graft.core.GraftSession.local(cpus, "graft-floordump")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val wd = if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
    def clearCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    def afterQuery(name: String): Unit = {
      spark.streams.active.foreach { q =>
        try q.stop() catch { case _: Throwable => () }
      }
      if (name.startsWith("s"))
        try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        catch { case _: Throwable => () }
    }
    val measured = names.map { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      fn(spark, wd).count(); clearCaches(); afterQuery(name)
      val dt = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        clearCaches(); afterQuery(name); t
      }.min
      System.err.println(f"[floor] $name%-26s $dt%.3f s")
      name -> dt
    }
    spark.stop()
    val existing =
      if (Files.isRegularFile(Paths.get("bench_floors.json")))
        parseFlat(new String(Files.readAllBytes(Paths.get("bench_floors.json")),
          StandardCharsets.UTF_8))
      else Map.empty[String, Double]
    val merged = (existing ++ measured).toSeq.sortBy(_._1)
    def sec(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    Files.write(Paths.get("bench_floors.json"),
      merged.map { case (k, v) => "\"" + k + "\":" + sec(v) }
        .mkString("{", ",", "}\n").getBytes(StandardCharsets.UTF_8))
    println(s"bench_floors.json: ${merged.size} floors")
  }
}
