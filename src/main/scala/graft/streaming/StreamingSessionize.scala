package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization (SURVEY §2.10 north star;
  * the stateful analog of the batch q21 gap-sessionizer) via
  * `flatMapGroupsWithState`: per-user session state with event-time
  * timeout, sessions emitted when closed by a gap or by watermark
  * expiry.
  *
  * Scale notes: state is one small record per live user key, partitioned
  * by the grouping key's shuffle; watermark-driven timeout bounds state
  * size — the two properties that keep this runnable on an unbounded
  * stream.
  */
object StreamingSessionize {

  case class Click(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(startUs: Long, lastUs: Long, n: Int, total: Double)
  case class Session(user_id: Long, sess_start_us: Long, n_events: Int,
                     duration_sec: Long, total_value: Double)

  val GapUs: Long = 30L * 60 * 1000000 // 30 min inactivity gap

  /** Exact epoch microseconds. `Timestamp.getTime * 1000` silently
    * truncates to milliseconds — on micro-precision event time that
    * shifts every session boundary and start/duration off the batch
    * sessionizer (q21) by up to 999 us. */
  private def usOf(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def toSession(uid: Long, st: SessionState): Session =
    Session(uid, st.startUs, st.n, (st.lastUs - st.startUs) / 1000000L,
      math.rint(st.total * 100) / 100)

  def sessionFunc(uid: Long, events: Iterator[Click],
                  state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(uid, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(c => (usOf(c.ts), c.value))
    val closed = Seq.newBuilder[Session]
    var cur = state.getOption
    for (c <- sorted) {
      val us = usOf(c.ts)
      cur match {
        case Some(st) if us - st.lastUs > GapUs =>
          closed += toSession(uid, st)
          cur = Some(SessionState(us, us, 1, c.value))
        case Some(st) if us < st.startUs - GapUs =>
          // late event (within watermark) more than a gap BEFORE the
          // open session: it can never merge — emit it as its own
          // earlier session rather than folding it in with a negative
          // gap (which the forward test above would silently accept)
          closed += toSession(uid, SessionState(us, us, 1, c.value))
        case Some(st) =>
          // late-but-mergeable events extend the session BACKWARD too:
          // startUs must track min or a late first event reports the
          // wrong session start/duration
          cur = Some(SessionState(math.min(st.startUs, us),
            math.max(st.lastUs, us), st.n + 1, st.total + c.value))
        case None =>
          cur = Some(SessionState(us, us, 1, c.value))
      }
    }
    cur.foreach { st =>
      state.update(st)
      // close the session once the watermark passes last activity + gap
      state.setTimeoutTimestamp((st.lastUs + GapUs) / 1000)
    }
    closed.result().iterator
  }

  /** Watermarked stream of clicks → appended closed sessions. */
  def sessions(clicks: Dataset[Click], watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val enc = Encoders.product[Session]
    implicit val encState = Encoders.product[SessionState]
    clicks
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionFunc _)
  }
}
