package graft.devtools

/** Dev-only: time one SparkEntry query (warm + N timed runs) and print
  * its formatted physical plan.
  * Usage: tools/run.sh graft.devtools.TimeOne <name> [sfDir] [runs]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.GraftSession.local(32, "graft-time-one")
    val fn = graft.SparkEntry.queries(name)
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    fn(spark, "/root/testdata/sf0.001").count() // codegen/JIT warm
    clear()
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
      clear()
    }
    println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
