package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Per-user activity rollup on the Spark 4 `transformWithState` API —
  * the successor of `flatMapGroupsWithState` (StreamingSessionize uses
  * the classic API; this covers the new one): typed `ValueState` plus
  * explicit event-time timers, so the operator decides per key when to
  * emit, instead of encoding it in a timeout conf.
  *
  * Semantics: accumulate per-user click count / first / last event
  * time; (re)arm one timer at last-activity + gap; when the watermark
  * passes the timer, emit the user's rollup once and clear state. Only
  * order-insensitive aggregates (count/min/max) live in state, so the
  * emitted row is independent of intra-batch row order — what makes
  * the operator batch-oracle-able (unlike a running double sum).
  *
  * Scale notes: state is one fixed-size record + one timer per live
  * key, partitioned by the grouping shuffle and GC'd by the timers;
  * the backing store is RocksDB (transformWithState requires it),
  * which keeps state off-heap and incrementally checkpointed — the
  * configuration a 100 TB/day stream runs anyway.
  */
object StreamingActivity {

  case class Click(user_id: Long, ts: java.sql.Timestamp)
  case class Activity(cnt: Long, firstUs: Long, lastUs: Long, timerMs: Long)
  case class Rollup(user_id: Long, n_clicks: Long, first_us: Long, last_us: Long)

  val GapUs: Long = 30L * 60 * 1000000 // 30 min of inactivity closes a user

  private def usOf(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  class Processor extends StatefulProcessor[Long, Click, Rollup] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Activity] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Activity]("activity",
        Encoders.product[Activity], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Click],
                                 timers: TimerValues): Iterator[Rollup] = {
      // fold the batch with order-insensitive ops only
      var cnt = 0L
      var minUs = Long.MaxValue
      var maxUs = Long.MinValue
      rows.foreach { c =>
        val us = usOf(c.ts)
        cnt += 1; if (us < minUs) minUs = us; if (us > maxUs) maxUs = us
      }
      val merged =
        if (state.exists()) {
          val a = state.get()
          getHandle.deleteTimer(a.timerMs) // re-arm below
          Activity(a.cnt + cnt, math.min(a.firstUs, minUs),
            math.max(a.lastUs, maxUs), 0L)
        } else Activity(cnt, minUs, maxUs, 0L)
      val timerMs = (merged.lastUs + GapUs) / 1000
      getHandle.registerTimer(timerMs)
      state.update(merged.copy(timerMs = timerMs))
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Rollup] = {
      val out =
        if (state.exists()) {
          val a = state.get()
          Iterator.single(Rollup(key, a.cnt, a.firstUs, a.lastUs))
        } else Iterator.empty
      state.clear()
      out
    }
  }

  /** Watermarked click stream → appended once-per-user rollups, each
    * emitted when the watermark passes its user's idle timer. */
  def rollups(clicks: Dataset[Click], watermarkDelay: String): Dataset[Rollup] = {
    implicit val enc = Encoders.product[Rollup]
    clicks
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
