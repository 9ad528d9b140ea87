package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Input to [[TwsCounter]]: one event, money already converted to exact
  * cents by the SQL layer (the repo-wide rule — floating round
  * semantics stay in ONE place, the same `round(x*100)::long` both
  * engines run, so the processor only ever sums longs).
  */
case class TwsEvent(user_id: Long, cents: Long)

/** The per-key state: lifetime event count + cents total. */
case class TwsTotals(n: Long, cents: Long)

/** One output row per (key, micro-batch with input). */
case class TwsCount(user_id: Long, n_batch: Long, n_total: Long,
  cents_total: Long)

/** Spark 4.x `transformWithState` processor — the arbitrary-state API
  * that replaces flatMapGroupsWithState ([[EventStream.sessionize]]
  * pins the legacy API; `st_tws_count` pins this one): typed
  * `ValueState` per key, explicitly read/updated per micro-batch,
  * emitting a running (batch delta, lifetime totals) row whenever a
  * key receives input.
  *
  * Batch-internal sums are order-free (long adds), so the emitted rows
  * are deterministic however Spark orders the per-key iterator. State
  * is two longs per key, RocksDB-resident (transformWithState requires
  * the RocksDB provider — at 100 TB/day that is the point: keyspace-
  * sized state lives off-heap with incremental checkpoints, and
  * `TTLConfig` bounds it by retention where the keyspace is unbounded;
  * the gate keeps NONE so the fixture's three batches all hit live
  * state).
  */
class TwsCounter(ttlMs: Long = -1L)
    extends StatefulProcessor[Long, TwsEvent, TwsCount] {

  @transient private var totals: ValueState[TwsTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[TwsTotals]("totals",
      Encoders.product[TwsTotals],
      // finite ttlMs = the bounded-retention deployment
      // (`st_tws_ttl` pins expired keys restarting from zero);
      // non-positive = NONE, the lifetime-counter gate (`st_tws_count`)
      if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
      else TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
      timerValues: TimerValues): Iterator[TwsCount] = {
    var n = 0L
    var cents = 0L
    rows.foreach { e => n += 1; cents += e.cents }
    if (n == 0) Iterator.empty
    else {
      val prev = if (totals.exists()) totals.get() else TwsTotals(0L, 0L)
      val next = TwsTotals(prev.n + n, prev.cents + cents)
      totals.update(next)
      Iterator.single(TwsCount(key, n, next.n, next.cents))
    }
  }
}
