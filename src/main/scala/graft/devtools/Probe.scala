package graft.devtools
/** Dev-only plan/timing probe: tools/run.sh graft.devtools.Probe <query> <sfDir>. */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.devtools.Probe <query> [sfDir]")
      sys.exit(2)
    }
    val name = args(0); val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    if (!graft.SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; valid: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val spark = graft.core.GraftSession.local(32, "graft-probe")
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
