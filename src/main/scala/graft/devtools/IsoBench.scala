package graft.devtools

/** Dev-only isolated-query bench: runs the named SparkEntry queries in a
  * FRESH session with the exact warmup + best-of-3 + cache-clear
  * discipline Bench uses, so an in-suite time can be diffed against an
  * isolated one to separate plan cost from session-level residue
  * (GC/code-cache/state-store churn from the 170 neighboring queries).
  *
  * Usage: tools/run.sh graft.devtools.IsoBench d06_jaccard_pairs d10_clean_corpus
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = if (args.nonEmpty) args.toSeq else sys.error("pass query names")
    val spark = graft.core.GraftSession.local(cpus, "graft-isobench")
    // SPARK_GRAFT_CONF="k=v;k=v": runtime conf overrides (e.g. the
    // graft.coclick.bucketCap knob) for stress-point readings
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k.trim, v.trim)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF: malformed token '$kv' (expected key=value)")
        }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val wd = if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
    def clearCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      fn(spark, wd).count(); clearCaches() // codegen/JIT warm at tiny SF
      val dt = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        clearCaches(); t
      }
      println(f"[iso] $name%-24s min=${dt.min}%.3f runs=${dt.map(d => f"$d%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
