package graft.devtools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev-only: write `.explain("formatted")` for the named SparkEntry
  * queries to <outDir>/<name>_<suffix>.txt — the before/after plan
  * evidence the optimization rounds commit under plans/r11/.
  *
  * Usage: tools/run.sh graft.devtools.PlanDump <outDir> <suffix> <name...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  *
  * Note: building a query's DataFrame executes any eager stages inside
  * it (streaming runs, localCheckpoints, fixpoint loops) — the dumped
  * plan is the FINAL projection's plan, which is what the join/exchange
  * claims in OPTIMIZATION_r11.md are about.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
