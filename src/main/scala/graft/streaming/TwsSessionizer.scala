package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time sessionization on the `transformWithState` ARBITRARY
  * STATE V2 API — the v2 twin of [[EventStream.sessionize]]
  * (flatMapGroupsWithState): identical gap semantics, but idle-session
  * closure uses the v2 TIMER surface (`registerTimer` /
  * `handleExpiredTimer`) instead of `GroupStateTimeout.EventTimeTimeout`.
  * `st_tws_session` runs both twins' semantics under the driver's hash
  * gate; the legacy query's oracle replays them.
  *
  * Timer discipline: exactly one live timer per key — each input batch
  * deletes whatever timers exist and registers the open session's
  * `last + gap` (in ms, the engine's timer resolution). A fired timer
  * closes the open session and clears state; a timer that outlived its
  * session (deleted-and-reregistered races can't happen with the
  * delete-all discipline, but defensive anyway) finds no state and
  * emits nothing.
  *
  * State is O(1) per user (start, last, count) exactly like the legacy
  * twin; at 100 TB/day the v2 API is the deployment choice because its
  * state lives in RocksDB with per-key timers indexed off-heap, not in
  * a heap map the executor must fit.
  */
class TwsSessionizer(gapMinutes: Int)
    extends StatefulProcessor[Long, UserEvent, Session] {

  private val gapUs = gapMinutes * 60L * 1000000L

  @transient private var st: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SessionState]("session",
      Encoders.product[SessionState], TTLConfig.NONE)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
      timerValues: TimerValues): Iterator[Session] = {
    val sorted = rows.map(e => micros(e.ts)).toSeq.sorted
    if (sorted.isEmpty) return Iterator.empty
    var closed = List.empty[Session]
    var cur = if (st.exists()) Some(st.get()) else None
    sorted.foreach { ts =>
      cur match {
        case Some(s) if ts - s.last_us <= gapUs =>
          cur = Some(s.copy(last_us = ts, n = s.n + 1))
        case Some(s) =>
          closed ::= Session(key, s.start_us, s.last_us, s.n)
          cur = Some(SessionState(ts, ts, 1))
        case None =>
          cur = Some(SessionState(ts, ts, 1))
      }
    }
    cur.foreach { s =>
      st.update(s)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer((s.last_us + gapUs) / 1000L) // ms epoch
    }
    closed.reverseIterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
    if (!st.exists()) Iterator.empty
    else {
      val s = st.get()
      st.clear()
      Iterator.single(Session(key, s.start_us, s.last_us, s.n))
    }
  }
}
