package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Event-time tumbling-window aggregation under Structured Streaming
  * equals the batch computation over the same events (SURVEY §2.10):
  * the engine's streaming path is the batch plan re-run incrementally.
  */
class StreamingWindowSpec extends SparkSpec {

  test("streaming tumbling window over events == batch groupBy window") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, dir)
    // stream with the RAW on-disk schema, then normalize `ts` through the
    // same shared helper Tables.events uses — never a hardcoded conversion
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file stream source requires a directory — stage the file into one
    val streamDir = Files.createTempDirectory("graft-events")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val src = Tables.withEventTs(spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString))

    val ckpt = Files.createTempDirectory("graft-win").toString
    val agg = src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
    val q = agg.writeStream
      .format("memory").queryName("win_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_stream")
        .select(col("window.start").as("win_start"), col("event_type"), col("cnt"), col("total_value"))
        .orderBy("win_start", "event_type").collect()
      val batch = batchEvents
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
        .select(col("window.start").as("win_start"), col("event_type"), col("cnt"), col("total_value"))
        .orderBy("win_start", "event_type").collect()
      assert(streamed.length === batch.length)
      assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }
}
