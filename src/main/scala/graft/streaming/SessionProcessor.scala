package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One closed session: emitted exactly once, when a later event of the
  * same user lands beyond the gap (data close) or when the event-time
  * watermark passes last event + gap (timer close).
  */
case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long)

object SessionProcessor {
  /** O(1) per-user state: the one OPEN session + its registered timer. */
  case class SessState(start_us: Long, last_us: Long, n: Long, timerMs: Long)
}

/** Custom sessionization on `transformWithState` with EVENT-TIME TIMERS —
  * the semantics `session_window` cannot express get written directly:
  * sessions close either by DATA (a same-user event beyond the gap, emitted
  * immediately) or by TIME (an event-time timer registered at
  * last + gap fires when the watermark passes it), each session emitted
  * exactly once in append fashion. The timer is re-registered (old one
  * deleted) every time the session extends, so at most one live timer per
  * key exists and a stale timer can never emit a still-open session.
  *
  * Gap convention matches the engine's batch/lag forms and Spark's own
  * `session_window` tie rule (StreamingParitySpec "gap-tie"): an event at
  * exactly prev+gap stays IN the session (`diff > gap` closes).
  *
  * Scale posture: state is one fixed-size record per ACTIVE user,
  * RocksDB-backed (the transformWithState requirement), GC'd on emission;
  * timers are one per active user. This is the production sessionizer for
  * an unbounded event firehose — O(active users) state, O(1) per event.
  */
class SessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, StreamEvent, SessionOut] {
  import SessionProcessor.SessState

  private val gapMs = gapUs / 1000L

  @transient private var sess: ValueState[SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[SessState](
      "session", Encoders.product[SessState], TTLConfig.NONE)

  override def handleInputRows(
      user: Long,
      rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[SessionOut] = {
    val out = ArrayBuffer.empty[SessionOut]
    // deterministic intra-batch order (micro-batch iterator order is not
    // guaranteed): ascending (ts, event_id), matching the lag protocol
    val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
    var s: SessState = if (sess.exists()) sess.get() else null
    sorted.foreach { e =>
      if (s == null) {
        s = SessState(e.ts_us, e.ts_us, 1L, 0L)
      } else if (e.ts_us - s.last_us > gapUs) {
        out += SessionOut(user, s.start_us, s.n) // data close
        s = SessState(e.ts_us, e.ts_us, 1L, s.timerMs)
      } else {
        s = s.copy(last_us = math.max(s.last_us, e.ts_us), n = s.n + 1)
      }
    }
    if (s != null) {
      if (s.timerMs != 0L) getHandle.deleteTimer(s.timerMs)
      val timerMs = s.last_us / 1000L + gapMs
      getHandle.registerTimer(timerMs)
      sess.update(s.copy(timerMs = timerMs))
    }
    out.iterator
  }

  override def handleExpiredTimer(
      user: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
    if (sess.exists()) {
      val s = sess.get()
      sess.clear() // timer close: watermark passed last + gap
      Iterator.single(SessionOut(user, s.start_us, s.n))
    } else Iterator.empty
  }
}
