package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One exploded LSH band arrival: `band_key` is the grouping key
  * (`band_idx:band_val`), `ts` the document's ingest event time (the
  * WATERMARKED column, kept as a field so the operator's event-time
  * plumbing sees it; whole-second fixtures make its ms value exact),
  * and `phase` the harness phase tag carried through to the output so
  * the read-back aggregate can separate first-pass admission from the
  * post-eviction re-send without re-deriving arrival order.
  */
case class LshBandEvent(band_key: String, doc_id: Long, phase: Int,
  ts: java.sql.Timestamp)

/** One output row per band arrival: did this (doc, band) collide with
  * the admission index — i.e. was the band already held by an earlier
  * document whose state is still inside the horizon, or by a
  * smaller-id document in the same micro-batch?
  */
case class LshAdmit(doc_id: Long, phase: Int, collided: Boolean)

/** Per-band admission state: the first document that claimed the band
  * and the epoch-ms instant the claim expires (first arrival's event
  * time + horizon — collisions do NOT refresh it, so expiry is a pure
  * function of the first arrival and both engines replay it exactly).
  */
case class LshBandState(first_doc: Long, expiry_ms: Long)

/** Streaming NEAR-DUPLICATE ADMISSION — the state shape a crawl
  * pipeline actually streams: every arriving document's MinHash bands
  * probe a band→first-claimant index, and the document is admitted iff
  * NONE of its bands collide (the read-back aggregate counts per-doc
  * collisions; `st_lsh_dedup` gates it). State grows with DISTINCT
  * content inside the horizon, not with event volume — the property
  * the stream_shapes `lsh` row measures at ×10/×100.
  *
  * Determinism contract (the whole point of the design — every branch
  * below is replayed bit-for-bit by the DuckDB oracle):
  *   - WITHIN a micro-batch, the winner of a previously-unclaimed band
  *     is the MINIMUM doc_id among the batch's arrivals for that band
  *     (the iterator's order is engine-internal; min is order-free).
  *   - ACROSS batches, liveness is `expiry_ms > current watermark`
  *     (strict — eviction owns the boundary, matching the engine's
  *     own reach-fires timer convention) — computed HERE, in this
  *     processor, so the comparison is part of the declared semantics
  *     rather than an engine implementation detail (the trap
  *     st_dedup's guard band exists for does not arise).
  *   - Expiry never refreshes on collision: state is pinned to the
  *     FIRST arrival, so the oracle derives it from min(doc_id) alone.
  *
  * Timers are the PHYSICAL eviction path: admission registers a timer
  * at the claim's expiry; when the watermark passes it, the state row
  * is deleted from RocksDB (state size stays bounded by the horizon's
  * distinct-band volume — at 100 TB/day the index holds the horizon,
  * never the crawl's history). The input path's own liveness check
  * makes the SEMANTICS independent of when the engine schedules timer
  * firing relative to input processing; the guard in
  * [[handleExpiredTimer]] keeps a stale timer (one whose claim was
  * already superseded by a re-admission) from deleting fresh state.
  *
  * Per-batch memory is O(bucket size) doc ids for the one band being
  * processed — bounded in production by the same [[graft.queries.Dedup
  * .BandCap]] discipline the batch query applies upstream (a degenerate
  * band is a collision cluster, not dedup signal).
  */
class LshAdmitter(horizonMs: Long)
    extends StatefulProcessor[String, LshBandEvent, LshAdmit] {

  @transient private var st: ValueState[LshBandState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[LshBandState]("band",
      Encoders.product[LshBandState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[LshBandEvent],
      timerValues: TimerValues): Iterator[LshAdmit] = {
    val buf = rows.toArray
    if (buf.isEmpty) return Iterator.empty
    val wm = timerValues.getCurrentWatermarkInMs()
    // live claim = state present AND the watermark has NOT reached its
    // expiry (strict >: the engine's timer surface fires a timer the
    // moment the watermark reaches its expiry ms — measured, not
    // assumed — so the inclusive boundary belongs to EVICTION; this
    // check agrees with the timer at equality whichever of the two
    // paths gets to the key first, and the oracle replays the same
    // strict comparison)
    if (st.exists() && st.get().expiry_ms > wm) {
      buf.iterator.map(e => LshAdmit(e.doc_id, e.phase, collided = true))
    } else {
      val winner = buf.minBy(_.doc_id)
      val claim = LshBandState(winner.doc_id, winner.ts.getTime + horizonMs)
      st.update(claim)
      // exactly one live timer per band: a re-admission after expiry
      // must not leave the superseded claim's timer free to delete the
      // fresh claim later
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(claim.expiry_ms)
      buf.iterator.map(e =>
        LshAdmit(e.doc_id, e.phase, collided = e.doc_id != winner.doc_id))
    }
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[LshAdmit] = {
    // physical eviction. The guard covers the one race the
    // delete-on-readmission discipline cannot: input processing in the
    // SAME batch already re-admitted the band (state's expiry is past
    // this timer's), so the state must survive this stale firing.
    if (st.exists() && st.get().expiry_ms <= expiredTimerInfo.getExpiryTimeInMs())
      st.clear()
    Iterator.empty
  }
}
