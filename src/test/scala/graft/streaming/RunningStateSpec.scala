package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.SparkSpec

case class UserAgg(user_id: Long, n_events: Long, max_value: Double)

/** `mapGroupsWithState` (the 1-output-per-group sibling of the
  * sessionizer's flatMapGroupsWithState): a per-user running event
  * counter + max-value tracker carried across micro-batches. State per
  * key is two numbers — bounded regardless of stream length.
  */
class RunningStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def counted(events: org.apache.spark.sql.Dataset[StreamingSessionize.Click]) =
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[StreamingSessionize.Click], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, Double.MinValue))
          val batch = rows.toSeq
          val next = UserAgg(uid, prev.n_events + batch.size,
            math.max(prev.max_value, batch.map(_.value).max))
          state.update(next)
          next
      }

  test("running per-user counts accumulate across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamingSessionize.Click]
    val ckpt = Files.createTempDirectory("graft-runstate").toString
    val q = counted(mem.toDS())
      .writeStream.format("memory").queryName("runstate_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(
        StreamingSessionize.Click(1, ts("2026-01-01 10:00:00"), 1.0),
        StreamingSessionize.Click(1, ts("2026-01-01 10:01:00"), 5.0),
        StreamingSessionize.Click(2, ts("2026-01-01 10:00:30"), 2.0))
      q.processAllAvailable()
      mem.addData(
        StreamingSessionize.Click(1, ts("2026-01-01 10:05:00"), 3.0))
      q.processAllAvailable()
      // update mode: latest row per user wins
      val latest = spark.table("runstate_out")
        .as[UserAgg].collect()
        .groupBy(_.user_id).view.mapValues(_.last).toMap
      assert(latest(1L) === UserAgg(1L, 3L, 5.0))
      assert(latest(2L) === UserAgg(2L, 1L, 2.0))
    } finally q.stop()
  }
}
