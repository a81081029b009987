package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** readStream over an actual parquet directory — the production source
  * shape (MemoryStream elsewhere covers semantics; this covers the file
  * source: schema-pinned discovery, maxFilesPerTrigger batching) — with
  * the streaming windowed agg checked for exact batch equivalence on
  * the driver's events table.
  */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("parquet file stream: windowed agg equals the batch result") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = graft.core.Tables.events(spark, dir)
    // the file source watches a DIRECTORY; stage the table file into one
    val streamDir = Files.createTempDirectory("graft-fs-in")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
    // same `ts` normalization Tables.events applies, via the shared helper
    val streamEv = graft.core.Tables.withEventTs(streamIn)

    def windowed(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("w"), col("event_type"), col("cnt"))

    val ckpt = Files.createTempDirectory("graft-filestream").toString
    val q = windowed(streamEv)
      .writeStream.format("memory").queryName("fs_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val got = spark.table("fs_out")
        .orderBy("w", "event_type").collect().map(_.toString).toSeq
      val want = windowed(batchDf)
        .orderBy("w", "event_type").collect().map(_.toString).toSeq
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
