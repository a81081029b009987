package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class Evt(user_id: Long, ts: java.sql.Timestamp, kind: String)

/** Watermarked stream-stream interval join: each click joined to errors
  * of the same user within the preceding 10 minutes — state bounded by
  * both watermarks (SURVEY §2.10; the streaming form of q26's range
  * join). */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("click joins errors within preceding 10 minutes, across batches") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Evt]
    val errors = MemoryStream[Evt]
    val c = clicks.toDF().select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val e = errors.toDF().select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val joined = c.join(e,
      expr("c_user = e_user AND e_ts BETWEEN c_ts - INTERVAL 10 MINUTES AND c_ts"))
    val ckpt = Files.createTempDirectory("graft-ssj").toString
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      errors.addData(
        Evt(1, ts("2026-01-01 10:00:00"), "error"),
        Evt(2, ts("2026-01-01 10:00:00"), "error"))
      q.processAllAvailable()
      // click 5 min after user 1's error (joins), 20 min after user 2's
      // (outside window), user 3 with no error
      clicks.addData(
        Evt(1, ts("2026-01-01 10:05:00"), "click"),
        Evt(2, ts("2026-01-01 10:20:00"), "click"),
        Evt(3, ts("2026-01-01 10:05:00"), "click"))
      q.processAllAvailable()
      // late-arriving error for user 3 still inside its click's window
      errors.addData(Evt(3, ts("2026-01-01 10:01:00"), "error"))
      q.processAllAvailable()
      val out = spark.table("ssj_out")
        .select(col("c_user"), col("e_ts")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
      assert(out === Set(
        (1L, "2026-01-01 10:00:00.0"),
        (3L, "2026-01-01 10:01:00.0")))
    } finally q.stop()
  }

  test("s07 left-outer gate = inner join rows + null-padded unmatched clicks") {
    val dir = "/root/testdata/sf0.001"
    val outer = graft.queries.StreamQueries.s07StreamOuterJoin(spark, dir).collect()
    val inner = graft.queries.StreamQueries.s02StreamJoin(spark, dir).collect()
    // the matched subset of the outer result IS the inner join
    val matched = outer.filter(r => !r.isNullAt(1)).map(_.toString).sorted.toSeq
    assert(matched == inner.map(_.toString).sorted.toSeq,
      "outer join's matched rows diverge from the inner join")
    // every unmatched click emits exactly one null-padded row — the
    // watermark-driven eviction actually drained (no state stuck open)
    val nClicks = graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === "click").count()
    val matchedClicks = outer.filter(r => !r.isNullAt(1)).map(_.getLong(0)).distinct.length
    val nullRows = outer.count(_.isNullAt(1))
    assert(nullRows == nClicks - matchedClicks,
      s"$nullRows null rows for ${nClicks - matchedClicks} unmatched clicks")
  }
}
