package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class Ev(uid: String, name: String, segment: String, ts: java.sql.Timestamp)

/** Structured Streaming ingest: watermarked dedup + foreachBatch
  * idempotent upsert (SURVEY §2.10). */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming upsert: duplicates across batches collapse, updates fill") {
    val dir = Files.createTempDirectory("graft-stream").toString + "/nodes"
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val nodes = StreamingIngest.dedup(mem.toDF(), "uid", "ts", "10 minutes")
      .select(lit("Thing").as("label"), col("uid"), col("name"), col("segment"),
        col("ts").as("created_at"), col("ts").as("updated_at"))
    val q = nodes.writeStream
      .outputMode("update")
      .option("checkpointLocation", dir + "-ckpt")
      .foreachBatch(StreamingIngest.upsertBatch(dir, Seq("segment")) _)
      .start()
    try {
      mem.addData(
        Ev("u1", "Alpha", "S1", ts("2026-01-01 10:00:00")),
        Ev("u1", "Alpha", "S1", ts("2026-01-01 10:00:01")), // in-batch dup
        Ev("u2", "Beta", "S2", ts("2026-01-01 10:00:02")))
      q.processAllAvailable()
      val after1 = spark.read.parquet(dir)
      assert(after1.count() === 2)

      mem.addData(
        Ev("u1", "Alpha", "S9", ts("2026-01-01 10:01:00")), // cross-batch update
        Ev("u3", "Gamma", "", ts("2026-01-01 10:01:30")))
      q.processAllAvailable()
      val after2 = spark.read.parquet(dir)
      assert(after2.count() === 3)
      val u1 = after2.filter(col("uid") === "u1").head()
      assert(u1.getAs[String]("segment") === "S9") // non-empty incoming wins
      val u3 = after2.filter(col("uid") === "u3").head()
      assert(u3.getAs[String]("segment") === "")
    } finally q.stop()
  }
}
