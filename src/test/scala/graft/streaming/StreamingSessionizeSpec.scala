package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StreamingSessionize.{Click, Session}

/** flatMapGroupsWithState sessionization: gap-closed sessions emitted
  * incrementally, watermark timeout flushes the tail session. */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gap closes a session; timeout flushes the last one") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Click]
    val ckpt = Files.createTempDirectory("graft-sess").toString
    val q = StreamingSessionize.sessions(mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // user 1: two events 5 min apart (one session), then 2h later two
      // more (second session closes the first)
      mem.addData(
        Click(1, ts("2026-01-01 10:00:00"), 1.0),
        Click(1, ts("2026-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      mem.addData(
        Click(1, ts("2026-01-01 12:00:00"), 5.0),
        Click(1, ts("2026-01-01 12:01:00"), 7.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Session].collect()
      assert(closed.length === 1)
      val s1 = closed.head
      assert(s1.user_id === 1)
      assert(s1.n_events === 2)
      assert(s1.duration_sec === 300)
      assert(s1.total_value === 3.0)

      // advance the watermark far past 12:01 + gap via another user's
      // event → event-time timeout flushes user 1's open session
      mem.addData(Click(2, ts("2026-01-01 15:00:00"), 0.5))
      q.processAllAvailable()
      mem.addData(Click(2, ts("2026-01-01 15:00:01"), 0.5)) // trigger another batch
      q.processAllAvailable()
      val after = spark.table("sess_out").as[Session].collect()
      assert(after.length === 2, after.mkString(";"))
      val s2 = after.find(_.sess_start_us == ts("2026-01-01 12:00:00").getTime * 1000).get
      assert(s2.n_events === 2)
      assert(s2.total_value === 12.0)
    } finally q.stop()
  }

  test("late in-watermark event extends the session backward") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Click]
    val ckpt = Files.createTempDirectory("graft-sess-late").toString
    val q = StreamingSessionize.sessions(mem.toDS())
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(Click(1, ts("2026-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      // 5 minutes late (inside the 10-min watermark delay): must merge
      // AND pull the session start back to 10:00, not report a
      // zero-duration session starting 10:05
      mem.addData(Click(1, ts("2026-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // far-future event closes user 1's session by gap
      mem.addData(Click(1, ts("2026-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      val closed = spark.table("sess_late").as[Session].collect()
      assert(closed.length === 1, closed.mkString(";"))
      val s = closed.head
      assert(s.sess_start_us === ts("2026-01-01 10:00:00").getTime * 1000)
      assert(s.n_events === 2)
      assert(s.duration_sec === 300)
      assert(s.total_value === 3.0)
    } finally q.stop()
  }
}
