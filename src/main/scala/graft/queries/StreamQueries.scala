package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming driven through the DuckDB gate (SURVEY §2.10):
  * the events table replayed through a real `readStream` file source →
  * event-time window aggregation → AvailableNow trigger → memory sink,
  * with the final result checked hash-exactly against a batch SQL
  * oracle. This is the incremental-equals-batch contract a streaming
  * engine owes its users, enforced per round — the watermark/late-data
  * and stateful paths are spec-covered (StreamingWindowSpec,
  * StreamingSessionizeSpec); this entry proves the production source +
  * sink wiring end-to-end.
  *
  * Scale notes: the file source discovers and batches files
  * incrementally (`maxFilesPerTrigger`) — at 100 TB the same plan runs
  * over an arriving directory with a watermark bounding state; the
  * tumbling-window agg shuffles once per micro-batch on (window,
  * event_type), exactly like its batch twin q18.
  */
object StreamQueries extends QueryPack {

  def s01StreamWindow(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // the file source watches a directory; stage the table file into one
    val streamDir = Files.createTempDirectory("graft-s01-in")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val ev = graft.core.Tables.withEventTs(
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString))
    val agg = ev
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double")
          .as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("cnt"), col("total_value"))
    // unique sink/checkpoint per invocation: Verify and Bench both call
    // the query function repeatedly in one session
    val sink = "s01_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = Files.createTempDirectory("graft-s01-ckpt").toString
    val q = agg.writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      // a timed-out stream must be LOUD — returning the half-filled
      // memory table would hand the gate (and the bench) silent garbage
      if (!q.awaitTermination(300000))
        sys.error("s01_stream_window: stream did not finish within 300s")
    } finally {
      q.stop()
      // the result lives in the memory sink; the staged input copy and
      // the checkpoint are dead weight — delete them so repeated bench/
      // verify invocations don't accumulate temp dirs
      def rm(p: java.nio.file.Path): Unit = {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
      rm(streamDir)
      rm(Paths.get(ckpt))
    }
    s.table(sink).orderBy("win_start", "event_type")
  }

  val queries: Map[String, QueryFn] = Map(
    "s01_stream_window" -> (s01StreamWindow _))

  val oracles: Map[String, String] = Map(
    "s01_stream_window" ->
      """SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS win_start, event_type,
        | CAST(count(*) AS BIGINT) AS cnt,
        | CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1,2 ORDER BY win_start, event_type""".stripMargin)
}
