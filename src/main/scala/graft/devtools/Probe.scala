package graft.devtools
import org.apache.spark.sql.SparkSession
/** Dev-only plan/timing probe: tools/run.sh graft.devtools.Probe <query> <sfDir>. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // time construction + execution together: eager localCheckpoints
    // inside query builders run jobs at construction time
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val n = df.count()
    println("rows=" + n + " build=" + tBuild + "s total=" + (System.nanoTime() - t0) / 1e9 + "s")
    if (sys.env.contains("PROBE_EXPLAIN")) df.explain("formatted")
    spark.stop()
  }
}
