package graft.devtools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only micro-profiler (scratch space — contents change per
  * investigation; currently: where does a staged streaming query's
  * wall-clock go?). */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.local(32, "graft-scratch")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val parts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8")
    sys.env.get("SPARK_GRAFT_NODATA").foreach(v =>
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v))
    (1 to 2).foreach { round =>
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val streamDir = Files.createTempDirectory("graft-scr-in")
      val ckpt = Files.createTempDirectory("graft-scr-ckpt")
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        time("stage copy") {
          val src = java.nio.file.Paths.get(s"$dir/events.parquet")
          Files.copy(src, streamDir.resolve("000_events.parquet"))
        }
        val mkSrc = () => graft.core.Tables.withEventTs(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(streamDir.toString))
        val clicks = mkSrc().filter(col("event_type") === "click")
          .select(col("event_id").as("c_event"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "1 hour")
        val errors = mkSrc().filter(col("event_type") === "error")
          .select(col("event_id").as("e_event"), col("user_id").as("e_user"),
            col("ts").as("e_ts"))
          .withWatermark("e_ts", "1 hour")
        val joined = clicks.join(errors,
          expr("c_user = e_user AND e_ts BETWEEN c_ts - INTERVAL 30 MINUTES AND c_ts"))
          .select(col("c_event"), col("e_event"), col("c_user").as("user_id"))
        val sink = "scr_" + round
        val q = time("start()") {
          joined.writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt.toString)
            .trigger(Trigger.AvailableNow())
            .start()
        }
        time("awaitTermination")(q.awaitTermination(300000))
        q.stop()
        q.recentProgress.foreach { p =>
          println(s"batch ${p.batchId}: rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}")
          p.stateOperators.foreach(so =>
            println(s"  stateOp: commit=${so.customMetrics} rowsTotal=${so.numRowsTotal}"))
        }
        time("read sink")(spark.table(sink).count())
        spark.catalog.dropTempView(sink)
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        graft.core.TempDirs.deleteQuietly(streamDir, "scr")
        graft.core.TempDirs.deleteQuietly(ckpt, "scr")
      }
    }
    spark.stop()
  }
}
