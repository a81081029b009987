package graft.devtools

/** Dev-only: dump a single SparkEntry query to parquet for exact
  * (no-rounding) offline comparison against the DuckDB oracle.
  * Usage: tools/run.sh graft.devtools.DumpOne <name> <sfDir> <outDir>
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = graft.core.GraftSession.local(8, "graft-dump-one")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
