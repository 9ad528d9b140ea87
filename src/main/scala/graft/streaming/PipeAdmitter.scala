package graft.streaming

/** One band arrival of the COMPOSED ingest curation pipeline
  * (`st_pipeline`): the same exploded-band shape as [[LshBandEvent]],
  * plus (a) `band_idx` disambiguating WHICH content index the band
  * probes — `>= 0` = the MinHash LSH bands (near-dup), `-1` = the
  * exact-fingerprint pseudo-band, `-2` = the holdout diversion (a
  * doc-unique pass-through key that is logged but never claims) — and
  * (b) the document's STATELESS screen verdicts (`lex`/`sem`/`gok`),
  * computed as pure row expressions in the same micro-batch and
  * carried through the admitter so the per-doc manifest row is
  * assembled entirely from what the stream itself decided.
  */
case class PipeBandEvent(band_key: String, doc_id: Long, band_idx: Int,
  phase: Int, source: String, lex: Boolean, sem: Boolean, gok: Boolean,
  ts: java.sql.Timestamp)

/** Per-arrival verdict row for one band of one document instance —
  * the pipeline sink's unit. The read-back aggregate folds a doc's
  * rows into one manifest line: exact = collided on band −1, near-dup
  * = collided on any band ≥ 0, holdout = the −2 marker, and the
  * stateless screen flags ride along unchanged.
  */
case class PipeVerdict(doc_id: Long, band_idx: Int, phase: Int,
  collided: Boolean, source: String, lex: Boolean, sem: Boolean, gok: Boolean)

/** The curation pipeline's admission processor: ONE [[AdmitterBase]]
  * state machine serving BOTH content indexes at once — the
  * exact-fingerprint band and the MinHash LSH bands are just different
  * key spaces (`f|…` vs `0:…`–`3:…`) over the same band→first-claimant
  * state, so exact dedup and near-dup admission share the claim,
  * expiry, eviction, and within-batch min-doc semantics that
  * `st_lsh_dedup` proved, and the oracle replays both with the same
  * closed-form liveness rule. Holdout keys (`h|…`) pass through
  * stateless — diverted at the splitter, logged through the same sink.
  */
class PipeAdmitter(horizonMs: Long)
    extends AdmitterBase[PipeBandEvent, PipeVerdict](horizonMs) {
  override protected def docIdOf(e: PipeBandEvent): Long = e.doc_id
  override protected def tsMsOf(e: PipeBandEvent): Long = e.ts.getTime
  override protected def emit(e: PipeBandEvent, collided: Boolean): PipeVerdict =
    PipeVerdict(e.doc_id, e.band_idx, e.phase, collided,
      e.source, e.lex, e.sem, e.gok)
  override protected def passThrough(key: String): Boolean =
    key.startsWith("h|")
}
