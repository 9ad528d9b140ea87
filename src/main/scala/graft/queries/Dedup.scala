package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** Deduplication operators over `documents` / `embeddings` — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB): every variant is expressed as
  * per-row signature computation (embarrassingly parallel, inside
  * codegen) followed by an equi-join on a compact blocking key — never a
  * full cross join. MinHash banding makes the candidate join an
  * equi-shuffle on (band, signature); candidate verification touches
  * only the surviving pairs. Exact dedup is a hash aggregate on a
  * 16-byte key. All hash functions are md5-derived so the DuckDB oracle
  * replays them bit-for-bit.
  */
object Dedup extends QueryModule {

  /** Non-empty word tokens (same byte-level tokenizer as WordCount). */
  private def words: Column =
    filter(graft.functions.ByteSplit.split(col("text")), t => t =!= "")

  /** documents (doc_id, lang, text) staged to (doc_id, lang, sh):
    * word 3-gram shingles, whole text when <3 tokens — the fused
    * one-pass [[graft.functions.WordShingles]] expression (replacing a
    * byte_split → filter → two zip_with passes → slice chain that
    * materialized three intermediate arrays per row; bit-identical,
    * ShinglesSpec). An earlier lesson pinned there still applies to any
    * lambda rewrite: higher-order lambdas touching non-lambda
    * expressions get those expressions re-inlined PER ELEMENT by
    * CollapseProject — O(tokens²) per row.
    */
  private[graft] def shingleDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      graft.functions.WordShingles.of(col("text")).as("sh"))

  /** documents staged to (doc_id, lang, sh). [[graft.core.FanOut]]
    * between the scan and the shingle pipeline: zip_with shingling +
    * per-shingle md5 is the CPU hot spot of every dedup variant, and a
    * single-file table would otherwise run all of it on one core.
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    shingleDocs(graft.core.FanOut(Tables(s, dir).documents))

  /** Minhash banding for an n-doc corpus — the text analog of
    * [[lshRowsForN]]'s operating-point discipline (closes VERDICT r2
    * stretch #9). B = 2^r pins the S-curve threshold at
    * J* = (1/B)^(1/r) = 0.5 — the dedup operating point — at EVERY
    * scale; r grows with log₂ n because the expected chance-candidate
    * volume (Σ over ~n²/2 background pairs of B·J_bg^r) must stay O(n):
    * with background Jaccard J_bg ≲ 0.2, each +1 on r cuts the per-band
    * false-positive rate ~5×, so r ∝ log n keeps the candidate join
    * linear as the corpus grows. ([[BandCap]] remains the hard backstop
    * for adversarial buckets regardless of r.)
    *
    * r = max(2, ⌈log₂(n)/5⌉):
    *   - 500 docs (the sf0.01 gate) → r=2, B=4, 8 hashes — EXACTLY the
    *     constants the oracled query bakes in below (static oracle SQL
    *     cannot depend on runtime n; the same compromise [[ddEmbedLsh]]
    *     documents for its r=8/B=24);
    *   - 10⁹ docs → r=6, B=64, 384 hashes/doc — the classic industrial
    *     minhash range. At extreme n, cap B and let J* drift up rather
    *     than paying 2^r bands. MinhashConfigSpec asserts both.
    */
  def minhashRowsForN(n: Long): Int = {
    val log2n = 64 - java.lang.Long.numberOfLeadingZeros(math.max(2L, n) - 1)
    math.max(2, math.ceil(log2n / 5.0).toInt)
  }

  /** Bands for r hashes-per-band, holding J* = 0.5: B = 2^r. */
  def minhashBandsForR(r: Int): Int = 1 << r

  // the oracled configuration = minhashRowsForN(500)'s operating point
  private[graft] val BandRows = 2
  private[graft] val Bands = 4 // = minhashBandsForR(BandRows)
  private[graft] val NumHashes = BandRows * Bands

  /** Hot-key caps for the candidate joins — the boilerplate guard.
    *
    * A shingle shared by k documents contributes k² rows to the postings
    * self-join; in real crawl data boilerplate (license headers,
    * navigation chrome) makes k ≈ corpus size, turning one key into a
    * quadratic straggler that kills the job at 100 TB. An
    * everywhere-shingle carries no dedup signal, so the standard
    * mitigation is to DROP postings longer than a cap before the join,
    * bounding candidate generation at O(n·cap). [[BandCap]] applies the
    * same guard to the minhash band join's buckets (a degenerate band —
    * e.g. every near-empty doc hashing to one signature — is a collision
    * cluster, not evidence of n² distinct near-dup pairs).
    *
    * Both caps are replayed bit-for-bit by the DuckDB oracles, so the two
    * engines agree at every scale factor; at the gate corpora they are
    * inert (measured max posting length 14, max band bucket 13 at sf0.1).
    */
  val PostingCap = 64
  val BandCap = 64

  /** Exact dedup: md5 over canonicalized text, keep the smallest doc_id
    * per group. One hash-aggregate shuffle on a 16-byte key; at 100 TB
    * the partial aggregate already collapses per-partition duplicates.
    */
  def ddExact(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .groupBy(graft.functions.CanonFp.of(col("text")).as("fingerprint"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("fingerprint")

  /** INCREMENTAL exact dedup — the shape a production corpus actually
    * runs daily: a new batch (here doc_id ≡ 0 mod 4) deduped against
    * the accumulated historical fingerprint store (everything else)
    * AND within itself, emitting only first-seen survivors. The
    * historical side carries fingerprints only — 16 bytes/doc, never
    * the text — so at 100 TB of corpus the store is ~tens of GB,
    * bucketed on fingerprint; the anti-join then co-locates with zero
    * shuffle of history, and the new batch (the small side) is the
    * only moving data. Re-fingerprinting the full corpus per batch —
    * [[ddExact]]'s shape — is the anti-pattern this query replaces.
    */
  def ddIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    val fp = graft.functions.CanonFp.of(col("text"))
    val history = docs.where(pmod(col("doc_id"), lit(4)) =!= 0)
      .select(fp.as("fingerprint")).distinct()
    val batch = docs.where(pmod(col("doc_id"), lit(4)) === 0)
      .select(col("doc_id"), fp.as("fingerprint"))
    batch.join(history, Seq("fingerprint"), "left_anti")
      .groupBy("fingerprint")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_in_batch"))
      .orderBy("fingerprint")
  }

  /** BLOOM-GATED incremental dedup — the production accelerator in
    * front of [[ddIncremental]]'s anti-join: the history's fingerprint
    * set collapses to a fixed-size Bloom bit set
    * ([[Sketches.bloomBit]], 256 bits / 3 hashes at gate — widen the
    * constants, nothing else changes), and every batch document is
    * first probed against the BROADCAST bits. bloom_hit = false proves
    * the fingerprint is new WITHOUT touching the history table — at
    * 100 TB that is the point: the history side ships 32-byte
    * OR-mergeable partials instead of a shuffle, and only the (few)
    * bloom-accepted rows pay the exact join. Both the gate decision
    * AND the exact membership go under the oracle per batch document,
    * so the structural no-false-negative guarantee (is_dup ⇒
    * bloom_hit) is hash-enforced row by row, and the false-positive
    * rows (bloom_hit ∧ ¬is_dup — the rows the exact join exists to
    * re-check) are pinned exactly.
    */
  def ddBloomGate(s: SparkSession, dir: String): DataFrame =
    bloomGateCore(Tables(s, dir).documents)

  /** Core of [[ddBloomGate]] over any (doc_id, text) frame, so
    * SketchesSpec can pin the is_dup ⇒ bloom_hit arm on a fixture with
    * real cross-split duplicates (the testdata corpus has none).
    */
  private[graft] def bloomGateCore(docs: DataFrame): DataFrame = {
    val ks = explode(sequence(lit(0), lit(Sketches.BloomHashes - 1))).as("k")
    val fp = graft.functions.CanonFp.of(col("text"))
    val history = docs.where(pmod(col("doc_id"), lit(4)) =!= 0)
      .select(fp.as("fingerprint")).distinct()
    val bits = history.select(ks, col("fingerprint"))
      .select(Sketches.bloomBit(col("k"), col("fingerprint")).as("bit"))
      .distinct()
    val batch = docs.where(pmod(col("doc_id"), lit(4)) === 0)
      .select(col("doc_id"), fp.as("fingerprint"))
    // membership = ALL of the probe's DISTINCT bits present (same
    // collision-exact contract as ta_bloom)
    val probeBits = batch.select(col("doc_id"), ks, col("fingerprint"))
      .select(col("doc_id"),
        Sketches.bloomBit(col("k"), col("fingerprint")).as("bit"))
      .distinct()
    val need = probeBits.groupBy("doc_id").agg(count(lit(1)).as("need"))
    val hits = probeBits.join(broadcast(bits), Seq("bit"))
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
    val gate = need.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("hits"), lit(0L)) === col("need")).as("bloom_hit"))
    batch.join(gate, Seq("doc_id"))
      .join(history.withColumn("__dup", lit(true)), Seq("fingerprint"), "left")
      .select(col("doc_id"), col("fingerprint"), col("bloom_hit"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
      .orderBy("doc_id")
  }

  /** MinHash + LSH banded near-dup: shingle → 8 minhashes → 4 bands of
    * 2 → candidate pairs from band-equality self-join → verify exact
    * shingle-set Jaccard on candidates only.
    *
    * Minhashes come from [[graft.functions.MinhashSig]] — the whole
    * signature computed in ONE pass inside the row that holds the
    * shingle array. The previous build (explode → per-family md5 →
    * min-aggregate on doc_id) was correct but shuffled one row per
    * (doc, shingle-hash) to reassemble per-doc minima; at 100 TB that
    * exchange carries the whole shingle corpus for a one-row-per-doc
    * result. Fused, the signature build is pure map work — the FIRST
    * shuffle of the query is the banded candidate join itself.
    *
    * The candidate self-join is an equi-join on (band_idx, band_val):
    * cost scales with band-bucket sizes, not n². Verification re-joins
    * the shingle arrays by doc_id on candidates only.
    */
  /** Materialize `result` into the CacheManager-tracked cache WHILE the
    * builder's intermediate caches are still live, then release those
    * intermediates — the unpersist-hygiene contract shared by the three
    * persisting dedup builders ([[ddMinhashLsh]], [[ngramJaccard]],
    * [[ddEmbedLsh]]). The returned DataFrame is cached and fully
    * computed (the intermediates are never needed again); the ONLY
    * block-manager resident a builder leaves behind is its own result —
    * small by construction (capped candidate pairs), and the caller
    * releases it with `.unpersist()` / `clearCache()` when done
    * (DedupHygieneSpec asserts both halves). Without the eager
    * materialization here, unpersisting the intermediates would make
    * the caller's later action re-run the shingle/signature pipeline
    * once per branch — the very work the persists exist to share.
    */
  private def settled(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    try { result.persist().count(); result }
    finally intermediates.foreach(_.unpersist())
  }

  /** (doc_id, band_idx, band_val [, carry…]) for a (doc_id, sh [,
    * carry…]) frame — the LSH banding shared VERBATIM by
    * [[ddMinhashLsh]] and the streaming admission query
    * ([[StreamingQueries.stLshDedup]]): one fused
    * [[graft.functions.MinhashSig]] pass, then the fixed
    * [[Bands]]×[[BandRows]] hex slices. Pure row expressions, so the
    * same derivation runs on batch and streaming frames; `carry` names
    * extra columns to thread through (the streaming query carries its
    * event time and phase tag).
    */
  private[graft] def bandsOf(sig: DataFrame, carry: String*): DataFrame = {
    val kept = carry.map(col)
    sig
      .select(col("doc_id") +:
        graft.functions.MinhashSig.sig(col("sh"), NumHashes).as("sig") +:
        kept: _*)
      .select(col("doc_id") +:
        explode(array(bandStructsOf(col("sig")): _*)).as("band") +:
        kept: _*)
      .select(col("doc_id") +: col("band.band_idx") +: col("band.band_val") +:
        kept: _*)
  }

  /** The [[Bands]]×[[BandRows]] hex-slice (band_idx, band_val) structs
    * over a minhash signature column — the banding arithmetic under
    * [[bandsOf]], factored so the ingest curation pipeline
    * ([[StreamingQueries.stPipeline]]) can prepend its
    * exact-fingerprint pseudo-band to the SAME slices inside one fused
    * explode (one scan, no stream self-union).
    */
  private[graft] def bandStructsOf(sig: Column): Seq[Column] =
    (0 until Bands).map(b =>
      struct(lit(b).as("band_idx"),
        substring(sig, b * BandRows * 8 + 1, BandRows * 8).as("band_val")))

  def ddMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // persist: the shingle pipeline feeds the minhash build AND both
    // verification branches (sa/sb) — without it the zip_with shingling
    // re-runs three times. Production would stage this as a bucketed
    // table; here the block-manager cache is the same role. Released
    // before return — see [[settled]].
    val sig = shingled(s, dir).select(col("doc_id"), col("sh")).persist()
    sig.count() // eager materialization — see ngramJaccard's barrier note
    try minhashLshFrom(sig) finally sig.unpersist()
  }

  /** [[ddMinhashLsh]]'s whole derivation over an ALREADY-SETTLED
    * (doc_id, sh) frame, so a composing pipeline
    * ([[ddPipelineManifest]]) can share ONE staged shingle pass between
    * this and its other shingle consumers instead of re-running
    * tokenize+shingle per stage. Returns the settled (persisted,
    * materialized) pair frame; `sig` stays persisted — the caller owns
    * its release.
    */
  private[graft] def minhashLshFrom(sig: DataFrame): DataFrame = {
    val bands = bandsOf(sig)
      // persist + eager count: okBands, the semi-join probe, and both
      // self-join branches all read this tiny (n·Bands rows) table —
      // settle it once instead of re-running the signature kernel 4×
      .persist()
    bands.count()
    // Drop degenerate band buckets (> BandCap members) before the
    // self-join — see [[BandCap]]. Count-then-semi-join, NOT
    // collect_list-then-filter: a grouped list for the hot bucket would
    // hold every member in one aggregation buffer (the very blowup the
    // cap exists to prevent); counting is constant-space and map-side
    // combined.
    val okBands = bands.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("bc"))
      .where(col("bc") <= BandCap)
      .select("band_idx", "band_val")
    // shuffle_hash on the survivor set: at scale it is the (near-)full
    // distinct band-key table — never broadcast-able
    val keptBands = bands
      .join(okBands.hint("shuffle_hash"), Seq("band_idx", "band_val"), "left_semi")
      // same rationale as the postings join: shuffle on the band key,
      // never broadcast a signature table
      .hint("shuffle_hash")
    val cand = keptBands.as("x").join(keptBands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    settled(
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("n_common", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("n_union", size(array_union(col("sha"), col("shb"))))
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_union"),
          round(col("n_common").cast("double") / col("n_union"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b"),
      bands)
  }

  /** SimHash (16-bit, md5-nibble hyperplanes): per token, each hex digit
    * of md5 votes ±1 on one bit; the sign of the per-document vote sum
    * sets the bit. Near-dups share most bits.
    *
    * The whole signature comes from [[graft.functions.SimhashSig]] in
    * one pass over the token array — the previous explode → 16
    * conditional sums → doc_id aggregate shuffled one row per token to
    * reassemble sums the holding row can accumulate locally
    * (bit-identical; SimhashSigSpec). The query is now exchange-free
    * map work until the output sort. Null signatures (token-less docs)
    * are filtered to match the exploded form, where such docs produced
    * no aggregate row.
    */
  def ddSimhash(s: SparkSession, dir: String): DataFrame =
    graft.core.FanOut(Tables(s, dir).documents)
      .select(col("doc_id"),
        graft.functions.SimhashSig.sig(words).as("simhash16"))
      .where(col("simhash16").isNotNull)
      .orderBy("doc_id")

  /** n-gram Jaccard near-dup via an inverted shingle index.
    *
    * The naive formulation — self-join documents on the blocking key and
    * intersect shingle arrays — is O(pairs-in-block) and dies at scale
    * (1000 docs/lang ⇒ 500k array intersections per block; 100 TB ⇒
    * never finishes). Instead: explode each doc's DISTINCT shingles,
    * equi-join the postings on (lang, shingle), and count hits per
    * (doc_a, doc_b) — cost is Σ_shingle |postings|², i.e. proportional
    * to genuinely-shared content, and it's all hash shuffles on
    * high-cardinality keys. |∪| falls out of the sizes:
    * |A∪B| = |A| + |B| − |A∩B|. Pairs with no shared shingle can never
    * reach J ≥ 0.2, so skipping them is semantics-preserving.
    *
    * The one skew risk — a super-frequent boilerplate shingle whose k²
    * join rows dwarf everything else — is capped: postings longer than
    * [[PostingCap]] are dropped from the index before the self-join, and
    * doc sizes are recomputed over the KEPT postings so Jaccard is
    * measured on the non-boilerplate shingle space consistently in both
    * numerator and denominator. The DuckDB oracle replays the identical
    * cap.
    */
  def ddNgramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccard(shingleDocs(graft.core.FanOut(Tables(s, dir).documents)), PostingCap)

  /** Core of [[ddNgramJaccard]]: `staged` is (doc_id, lang, sh) from
    * [[shingleDocs]]; cap-parameterized so tests can exercise the
    * hot-shingle guard on a synthetic boilerplate corpus.
    */
  private[graft] def ngramJaccard(staged: DataFrame, cap: Int): DataFrame = {
    val (pc, kept) = pairCounts(staged, cap)
    settled(pc
      .withColumn("n_union", col("na") + col("nb") - col("n_common"))
      .where(col("n_common") * 5 >= col("n_union"))
      .select(col("lang"), col("doc_a"), col("doc_b"), col("n_common"), col("n_union"),
        round(col("n_common").cast("double") / col("n_union"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b"), kept)
  }

  /** Shared candidate machinery of [[ngramJaccard]] and
    * [[ddContainment]]: (lang, doc_a, doc_b, n_common, na, nb) for
    * every posting-overlapping pair under the hot-shingle cap, plus
    * the still-persisted postings frame — each CALLER settles its own
    * final projection against it (so exactly one cached frame, the
    * caller's result, survives — DedupHygieneSpec's contract).
    */
  private[graft] def pairCounts(staged: DataFrame, cap: Int)
      : (DataFrame, DataFrame) = {
    // persist: feeds the size table and BOTH candidate self-join branches
    // — without it the shingle pipeline + cap re-runs three times.
    // Materialized EAGERLY (count) before the fan-out: the self-join's two
    // shuffle-map stages run concurrently, and letting them populate the
    // cache lazily makes both race to compute the same partitions
    // (per-partition cache locks, duplicated work under contention —
    // observed 3× run-to-run swings at sf0.1). One deliberate pass, then
    // every branch reads settled cache. Production would stage this as a
    // bucketed table; the eager count is the same barrier. Released
    // before return — see [[settled]].
    val kept = cappedPostings(staged, cap).persist()
    kept.count()
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_sh"))
    // shuffle_hash hint (on the join inputs, not the shared persisted df —
    // a hint on `kept` would also dangle over the `sizes` branch): Spark
    // would otherwise BROADCAST one side of the self-join — rebuilding the
    // whole shingle pipeline for the build side AND collecting every
    // posting to the driver, which is exactly what must not happen at
    // 100 TB. A shuffled hash join keys both sides on (lang, shingle) —
    // the scalable shape.
    val common = kept.as("x").hint("shuffle_hash").join(kept.as("y").hint("shuffle_hash"),
        col("x.lang") === col("y.lang") && col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.lang").as("lang"), col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).cast("int").as("n_common"))
    (common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b"),
      kept)
  }

  /** CONTAINMENT pairs — the asymmetric near-SUBSET detector Jaccard
    * structurally misses: a 40-shingle snippet wholly inside a
    * 400-shingle page has J = 40/400 = 0.1 (invisible at any sane
    * Jaccard threshold) but containment C(a→b) = |Sa∩Sb|/|Sa| = 1.0 —
    * the quote/boilerplate/wrapper-page relationship a dedup pipeline
    * must see (Broder 1997 distinguishes resemblance from containment
    * for exactly this). Same capped-postings candidate machinery and
    * pair-count join as [[ddNgramJaccard]] ([[pairCounts]] is shared
    * verbatim — same O(n·cap) volume bound); the selection keeps pairs
    * where the SMALLER side is ≥ 80 % contained
    * (n_common·5 ≥ 4·min(na, nb), integer-exact), emitting both
    * directional containments.
    */
  def ddContainment(s: SparkSession, dir: String): DataFrame =
    containmentPairs(shingleDocs(graft.core.FanOut(Tables(s, dir).documents)),
      PostingCap)

  /** Core of [[ddContainment]], cap-parameterized like [[ngramJaccard]]. */
  private[graft] def containmentPairs(staged: DataFrame, cap: Int): DataFrame = {
    val (pc, kept) = pairCounts(staged, cap)
    settled(pc
      .where(col("n_common") * 5 >= least(col("na"), col("nb")) * 4)
      .select(col("lang"), col("doc_a"), col("doc_b"),
        col("n_common"), col("na"), col("nb"),
        round(col("n_common").cast("double") / col("na"), 6).as("c_ab"),
        round(col("n_common").cast("double") / col("nb"), 6).as("c_ba"))
      .orderBy("doc_a", "doc_b"), kept)
  }

  /** Capped postings index: explode each doc's distinct shingles, count
    * postings per (lang, shingle), keep only those within the cap, and
    * semi-join the postings against the survivors. Count-then-semi-join
    * rather than collect_list-then-filter: a grouped doc list for the
    * hot shingle would hold k doc_ids in ONE aggregation buffer — the
    * memory blowup the cap exists to prevent — while counting is
    * constant-space and map-side combined. Both shuffles key on
    * (lang, shingle), the same key the candidate self-join uses.
    * (Package-visible for the hot-shingle spec.)
    */
  private[graft] def cappedPostings(staged: DataFrame, cap: Int): DataFrame = {
    val postings = staged
      .select(col("lang"), col("doc_id"), explode(array_distinct(col("sh"))).as("shingle"))
    val ok = postings.groupBy("lang", "shingle")
      .agg(count(lit(1)).as("pc"))
      .where(col("pc") <= cap)
      .select("lang", "shingle")
    // shuffle_hash on the survivor set: it is the distinct-shingle table
    // minus the hot keys — billions of keys at 100 TB, never
    // broadcast-able. Both semi-join sides then shuffle on
    // (lang, shingle), and the postings exchange is reused by the
    // counting aggregate above.
    postings.join(ok.hint("shuffle_hash"), Seq("lang", "shingle"), "left_semi")
  }

  private[graft] def dot(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.DotProduct(Bridge.expression(x), Bridge.expression(y)))
  }

  /** Embedding cosine near-dup, blocked by label. The dot product is a
    * left fold in double precision — bit-identical in Spark and DuckDB
    * (same operand casts, same association). Threshold applies to the
    * rounded value so the comparison is engine-stable.
    *
    * SCALE NOTE: all-pairs within label blocks is O(|block|²) — the
    * small-scale ORACLE for [[ddEmbedLsh]], which is the 100 TB path
    * (candidates from a banded equi-join, never all-pairs).
    */
  def ddEmbedNear(s: SparkSession, dir: String): DataFrame = {
    // Norms are computed once per VECTOR before the join (n rows), not
    // once per PAIR after it (n²/blocks rows) — the arithmetic
    // (sqrt(dot(e,e))) is identical so results are bit-equal, but the
    // per-pair work drops from 3 interpreted array folds to 1.
    val e = graft.core.FanOut(Tables(s, dir).embeddings)
      .select(col("label"), col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val a = e.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("norm").as("na"))
    val b = e.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("norm").as("nb"))
    a.join(b, Seq("label"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .where(col("cosine") >= 0.35)
      .select("label", "vec_a", "vec_b", "cosine")
      .orderBy("vec_a", "vec_b")
  }

  // ---- random-hyperplane LSH for embedding near-dup (the scale path) ----

  /** testdata embeddings are 64-dim float; a length mismatch nulls the
    * dot (and the row drops at the threshold filter) rather than erring.
    */
  private val EmbedDims = 64
  private[graft] val LshBands = 24
  private[graft] val LshRowsPerBand = 8
  private val LshBits = LshBands * LshRowsPerBand

  /** Bits-per-band for n vectors: ⌈log₂ n⌉ keeps EXPECTED random
    * collisions per band at ~n (n²/2^r ≤ n), the linear-cost operating
    * point; add bands to buy recall back. The oracled [[ddEmbedLsh]]
    * uses the fixed r=8/B=24 (static oracle SQL can't depend on runtime
    * n; the rule says r=9 at the 500-row gate — the one bit of
    * collision headroom is deliberately traded to keep the inlined
    * hyperplane table at 192 literals, see [[graft.ScaleConfig]]); a
    * production pipeline calls this with its corpus size.
    */
  def lshRowsForN(n: Long): Int =
    math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(math.max(2L, n) - 1))

  /** Deterministic ±1 hyperplane weights from md5("hp|bit|dim") — fixed
    * constants computed at PLAN time and inlined as literals into both
    * the Spark plan and the DuckDB oracle SQL, so the two engines run
    * the identical projection bit-for-bit.
    */
  private def hpWeight(bit: Int, dim: Int): Float = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp|$bit|$dim".getBytes("UTF-8"))
    if ((h(0) & 0xff) >= 0x80) 1f else -1f
  }
  /** Generalized hyperplane table: bit b's weights depend only on
    * (b, dim), so the r=8/B=24 gate table IS the 192-bit prefix of any
    * wider rule-resolved table — the gate config and the scale config
    * share their leading hyperplanes by construction.
    */
  private def hyperplanesFor(bits: Int): IndexedSeq[Seq[Float]] =
    (0 until bits).map(b => (0 until EmbedDims).map(d => hpWeight(b, d)))
  private val hyperplanes: IndexedSeq[Seq[Float]] = hyperplanesFor(LshBits)

  /** Embedding near-dup via random-hyperplane LSH — the 100 TB shape.
    *
    * sign(w_j · e) over [[LshBits]] fixed hyperplanes gives each vector a
    * bit signature; signatures are banded ([[LshBands]] bands of
    * [[LshRowsPerBand]] bits) and candidates come from an EQUI-join on
    * (band_idx, band_val) — never an all-pairs join. Exact cosine runs
    * on candidates only, same threshold as [[ddEmbedNear]].
    *
    * Scale law: expected random collisions per band ≈ n²/2^r (r = bits
    * per band), so r must grow with log₂(n) — see [[lshRowsForN]]. Here
    * r=8, B=24: recall ≈0.4 at the (deliberately low) cosine-0.35
    * threshold, rising toward 1 for true near-dups, and the candidate
    * join stays an equi-shuffle whose volume is measured, not assumed
    * (EmbedLshSpec). LSH is probabilistic: pairs ddEmbedNear finds can
    * be missed — the oracle replays the identical hyperplanes, so the
    * hash-compare is still exact.
    */
  /** The compositional signature build — [[LshBits]] separate dots, one
    * array read each. Semantically identical to [[fusedSig]] (asserted in
    * EmbedLshSpec); kept as the cross-check oracle for the fused kernel.
    */
  private[graft] def sigViaDots: Column =
    concat((0 until LshBits).map(j =>
      when(dot(col("embedding"), typedlit(hyperplanes(j))) >= 0, "+").otherwise("-")): _*)

  /** One-pass fused signature: all [[LshBits]] accumulators over a single
    * traversal of the embedding ([[graft.functions.HyperplaneSig]]).
    */
  private[graft] def fusedSigFor(bits: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.HyperplaneSig(
      Bridge.expression(col("embedding")), bits, EmbedDims,
      hyperplanesFor(bits).flatten.toArray))
  }
  private[graft] def fusedSig: Column = fusedSigFor(LshBits)

  /** [[ddEmbedLsh]]'s whole pipeline with the banding PARAMETERIZED —
    * the [[splitThresholds]]/[[TextAnalysis.seqPackShardsForN]] pattern
    * applied to the one config whose fixed gate value has a measured
    * quadratic wall: at 200 k diverse vectors, r=8 means n²/2⁸ ≈ 150 n
    * chance collisions per band × 24 bands (observed: a 69 GB candidate
    * shuffle that exhausts local disk — BENCH_NOTES round-6 study).
    * A production run passes r = [[lshRowsForN]](n) (and any band
    * count); the oracled [[ddEmbedLsh]] keeps the r=8/B=24 gate config
    * that its 192-literal oracle SQL replays. [[graft.ScaleStudy]]
    * drives this rule-resolved path for the scale benchmarks.
    */
  private[graft] def embedLshPairs(
      e0: DataFrame, rowsPerBand: Int, bands: Int): DataFrame = {
    val bits = rowsPerBand * bands
    val e = e0.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val sig = e.select(col("vec_id"), fusedSigFor(bits).as("sig"))
    val bandRows = sig.select(
      col("vec_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band_idx"),
          substring(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("band_val"))): _*)).as("band"))
      .select(col("vec_id"), col("band.band_idx"), col("band.band_val"))
      // persist + eager count: both candidate self-join branches read
      // this (n·Bands tiny rows); settling it once halves the signature
      // kernel work and avoids racing cache materialization — same
      // barrier rationale as ngramJaccard. Released before return —
      // see [[settled]].
      .persist()
    bandRows.count()
    val bandsKeyed = bandRows
      // shuffle on the band key, never broadcast-collect a signature table
      .hint("shuffle_hash")
    val cand = bandsKeyed.as("x").join(bandsKeyed.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("norm").as("na"))
    val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("norm").as("nb"))
    settled(
      cand.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn("cosine", round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
        .where(col("cosine") >= 0.35)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b"),
      bandRows)
  }

  def ddEmbedLsh(s: SparkSession, dir: String): DataFrame =
    embedLshPairs(graft.core.FanOut(Tables(s, dir).embeddings),
      LshRowsPerBand, LshBands)

  // ---- SemDeDup: centroid-cell-blocked semantic dedup ----

  /** Gate config for [[ddSemdedup]]: same k/iteration budget as
    * [[Similarity.simKmeansIvf]] (k ≈ √n at test scale), same 0.35
    * cosine threshold as [[ddEmbedNear]]/[[ddEmbedLsh]] so all three
    * embedding-dedup paths share one operating point.
    */
  private[graft] val SemdedupK = 16
  private[graft] val SemdedupIters = 3
  private[graft] val SemdedupThreshold = 0.35

  /** Where [[ddSemdedup]] persists its trained centroids — per-run
    * unique, interpolated into the oracle SQL below, and deliberately
    * NOT routed through [[graft.core.TempDirs]]: the DuckDB oracle
    * replays these files AFTER this JVM exits (same contract as
    * [[Similarity.KmeansCentroidDir]]).
    */
  private[graft] lazy val SemdedupCentroidDir = java.nio.file.Files
    .createTempDirectory("graft_semdedup_centroids_").toString

  /** Model sink for [[ddSemdedupSampled]] — same persistence contract
    * as [[SemdedupCentroidDir]].
    */
  private[graft] lazy val SemdedupSampledCentroidDir = java.nio.file.Files
    .createTempDirectory("graft_semdedup_s_centroids_").toString

  /** Model sink for [[ddSemdedupCapped]] — same persistence contract
    * as [[SemdedupCentroidDir]].
    */
  private[graft] lazy val SemdedupCappedCentroidDir = java.nio.file.Files
    .createTempDirectory("graft_semdedup_c_centroids_").toString

  /** Per-cell population bound for [[ddSemdedupCapped]] — the hot-key
    * cap the within-cell pair join was missing (every OTHER candidate
    * join here has one: [[PostingCap]], [[BandCap]]). The k ≈ √n rule
    * bounds the EXPECTED Σ|cell|² at n^1.5, but real embeddings
    * cluster: one skewed cell makes the pair join quadratic in that
    * cell's population with no bound at all. A cell over
    * [[SemdedupCellCap]] members is handled in two sound pieces
    * instead of one quadratic join:
    *
    *   - CORE COLLAPSE: members within [[SemdedupCoreTau]] cosine of
    *     the cell's own centroid are mutually ≥ [[SemdedupThreshold]]-
    *     similar BY THE TRIANGLE INEQUALITY on angles (2·arccos(0.822)
    *     = arccos(0.3514) ≤ arccos(0.35)), so all but the lowest-id
    *     core member drop with NO pair join at all — O(|cell|) work,
    *     one dot against the broadcast centroid. Every core drop is a
    *     TRUE drop under the uncapped semantics (witness: the core
    *     minimum, same cell, lower id, provably ≥ τ-similar). This is
    *     exactly the tight-semantic-cluster case that makes real
    *     cells skew, handled at full recall.
    *   - BLOCKED REMAINDER: non-core members pair only within md5-coin
    *     blocks sized so the expected block is ≤ the cap (the coin is
    *     geometry-independent, so the bound holds REGARDLESS of how
    *     the remainder clusters — the property a similarity-aware
    *     splitter cannot give). Cross-block pairs are skipped: the
    *     explicit, quantified recall trade, same discipline as
    *     [[PostingCap]]/[[BandCap]] (which drop hot keys outright).
    *
    * Every drop the capped path makes carries a same-cell lower-id
    * τ-similar witness, so dropped(capped) ⊆ dropped(uncapped) against
    * the same model — SemdedupCappedSpec asserts exactly that
    * contract, plus the block bound on an engineered skewed cell.
    * Cap 32 ≈ the gate corpus's mean cell (500/16), so the machinery
    * is ACTIVE at gate scale and the oracle replays it non-vacuously.
    */
  private[graft] val SemdedupCellCap = 32

  /** Core radius for the centroid collapse: cos(arccos(0.35)/2) =
    * 0.82158…, rounded UP to 0.822 so the pairwise implication keeps
    * a 1.4e-3 margin over the 1e-6 cosine rounding (soundness needs
    * τ' ≥ cos(arccos(τ)/2); rounding up only shrinks the core).
    */
  private[graft] val SemdedupCoreTau = 0.822

  /** Remainder-block granularity: blocks are md5-hex PREFIXES, so the
    * block count grows in powers of 16 — `chars` hex characters give
    * 16^chars blocks, chars picked per cell so |cell|/16^chars ≤ cap.
    * 4 chars (65 536 blocks) covers cells up to 2 M members at cap 32;
    * bigger cells degrade gracefully (expected block = |cell|/65 536).
    */
  private[graft] val SemdedupMaxBlockChars = 4

  /** Core of [[ddSemdedup]], parameterized on the vector set, the
    * centroid sink (so SemdedupSpec can run it on a crafted fixture
    * against its own scratch dir), and the CELL COUNT k: the
    * within-cell pair join costs Σ|cell|² ≈ n²/k, so k must grow with
    * n ([[Similarity.kmeansCellsForN]], cells ≈ √n ⇒ join cost ≈
    * n^1.5) or the pipeline hits the same quadratic wall the round-6
    * scale study measured for fixed-r embed-LSH. The oracled gate
    * pins k = [[SemdedupK]] (= kmeansCellsForN at gate n, asserted by
    * ScaleConfigSpec); [[graft.ScaleStudy]] measures the rule-resolved
    * path at larger n.
    */
  private[graft] def semdedup(vectors: DataFrame, centroidDir: String,
      k: Int = SemdedupK, iters: Int = SemdedupIters,
      trainCap: Option[Int] = None, cellCap: Option[Int] = None): DataFrame = {
    require(k > 0 && iters > 0, s"need positive k/iters, got k=$k iters=$iters")
    val e = vectors
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    // training set: everything, or the trainCap smallest deterministic
    // sample coins (TakeOrdered — no full sort); see
    // [[Similarity.TrainSamplePerCell]] for the corpus-scale rationale
    val trainVecs = trainCap match {
      case Some(cap) => e.select(col("vec_id"), col("embedding"))
        .orderBy(Similarity.kmeansSampleCoin, col("vec_id")).limit(cap)
      case None => e.select(col("vec_id"), col("embedding"))
    }
    KmeansIvf.train(trainVecs, k, iters, seedSmallest = trainCap.isDefined)
      .write.mode("overwrite").parquet(centroidDir)
    // read BACK so assignment provably uses the persisted table the
    // oracle will read — not a diverging in-memory lineage
    val trained = vectors.sparkSession.read.parquet(centroidDir)
    // persist: the assignment feeds both pair-join branches AND the
    // final keep/drop projection — without it the k-distance argmin
    // re-runs three times. Released before return — see [[settled]].
    val assigned = KmeansIvf
      .assignCells(e.select(col("vec_id"), col("embedding")), trained)
      .join(e.select(col("vec_id"), col("norm")), Seq("vec_id"))
      .persist()
    assigned.count()
    // pair-join universe and drop set: uncapped = the plain within-cell
    // join; capped = core collapse + md5-blocked remainder (see
    // [[SemdedupCellCap]] for the scheme and its soundness argument)
    val (keyed, extraDrops) = cellCap match {
      case None => (assigned.withColumn("subcell", lit("")), None)
      case Some(cap) =>
        // per-cell populations: ≤ k rows — broadcast back onto the rows
        val counts = assigned.groupBy("cell").agg(count(lit(1)).as("__cc"))
        val cents = broadcast(trained.select(col("cid").as("cell"),
          col("centroid").as("__ce"),
          sqrt(dot(col("centroid"), col("centroid"))).as("__cn")))
        // chars = ceil(log16(cc/cap)) as an integer-exact CASE ladder
        // (a floating log could land either side of a power of 16 and
        // silently disagree with the oracle's replay)
        val ladder = (1 to SemdedupMaxBlockChars).foldLeft(
          when(col("__cc") <= cap, 0)) { (acc, c) =>
          acc.when(col("__cc") <= cap.toLong * (1L << (4 * c)), c)
        }.otherwise(SemdedupMaxBlockChars)
        // persist: five consumers read this frame (core min, core
        // drops, both pair-join branches, the final projection) — the
        // measured ×10 overhead of recomputing the enrichment per
        // consumer was ~1.5× the whole query. Released in [[settled]].
        val lbl = assigned.join(broadcast(counts), Seq("cell"))
          .join(cents, Seq("cell"))
          .withColumn("__cosc", round(
            dot(col("embedding"), col("__ce")) / (col("norm") * col("__cn")), 6))
          .withColumn("__core",
            col("__cc") > cap && col("__cosc") >= SemdedupCoreTau)
          .withColumn("__chars", ladder)
          .withColumn("subcell", when(col("__core"), lit("core")).otherwise(
            expr("substr(md5(concat('graft-semdedup-block|', " +
              "cast(vec_id as string))), 1, __chars)")))
          .select("vec_id", "cell", "subcell", "embedding", "norm", "__core")
          .persist()
        // core collapse: all but the lowest-id core member drop — the
        // O(|cell|) replacement for the quadratic join on the tight
        // cluster that made the cell oversized in the first place
        val coreMin = lbl.where(col("__core"))
          .groupBy("cell").agg(min("vec_id").as("__cmin"))
        val coreDrops = lbl.where(col("__core"))
          .join(broadcast(coreMin), Seq("cell"))
          .where(col("vec_id") > col("__cmin"))
          .select(col("vec_id"))
        (lbl, Some(coreDrops))
    }
    val pairSide = keyed.where(cellCap match {
      case None => lit(true)
      case Some(_) => !col("__core")
    })
    val a = pairSide.select(col("cell"), col("subcell"),
      col("vec_id").as("vec_a"), col("embedding").as("ea"), col("norm").as("na"))
    val b = pairSide.select(col("cell"), col("subcell"),
      col("vec_id").as("vec_b"), col("embedding").as("eb"), col("norm").as("nb"))
    val pairDrops = a.join(b, Seq("cell", "subcell"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .where(col("cosine") >= SemdedupThreshold)
      .select(col("vec_b").as("vec_id"))
    val dropped = extraDrops.fold(pairDrops)(pairDrops.unionByName(_))
      .distinct()
      .withColumn("__dropped", lit(true))
    val labeled = keyed
      .select(col("vec_id"), col("cell"), col("subcell"))
      .join(dropped, Seq("vec_id"), "left")
      .withColumn("kept", col("__dropped").isNull)
    settled(
      (if (cellCap.isDefined)
        labeled.select("vec_id", "cell", "subcell", "kept")
      else labeled.select("vec_id", "cell", "kept"))
        .orderBy("vec_id"),
      Seq(assigned) ++ (if (cellCap.isDefined) Seq(keyed) else Nil): _*)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC dedup by
    * k-means-cell blocking — cluster the embedding space, then compare
    * pairs only WITHIN each Voronoi cell, dropping every vector that
    * has ANY lower-id similar neighbor in its cell (including
    * neighbors that are themselves dropped — on a transitive chain
    * a~b, b~c with a≁c this drops BOTH b and c, stricter than a
    * greedy scan over survivors, which would keep c; cells are small,
    * the distinction is one aggregate vs an inherently sequential
    * scan). The production answer to
    * [[ddEmbedNear]]'s O(n²) all-pairs: the trained centroid table
    * (k rows, broadcast) assigns every vector a cell with one map-side
    * argmin pass, the pair join is an EQUI-join on the cell id — cost
    * Σ|cell|², bounded because k grows with n (cells ≈ √n, the
    * [[Similarity.ivfBitsForN]] discipline) — and the keep/drop rule is
    * one aggregate over the surviving pairs, no iterative clustering.
    * Training + assignment + pairing + the lower-id-neighbor drop
    * rule all run under the oracle: DuckDB replays argmin assignment
    * over the persisted centroids the engine trained (identical
    * ‖v‖²−2v·c+‖c‖² arithmetic, lowest-cid ties), the within-cell
    * rounded-cosine pairs, and the drop set.
    */
  def ddSemdedup(s: SparkSession, dir: String): DataFrame =
    semdedup(graft.core.FanOut(Tables(s, dir).embeddings)
      .select(col("vec_id"), col("embedding")), SemdedupCentroidDir)

  /** SemDeDup with cluster training on a fixed deterministic sample
    * ([[Similarity.TrainSamplePerCell]]·k smallest coins) — the
    * corpus-scale training path: Lloyd touches 8k² distance pairs per
    * iteration instead of n·k, while cell ASSIGNMENT and the
    * within-cell dedup still cover every vector. Downstream of
    * training the query is [[ddSemdedup]] verbatim, and the oracle
    * replays the identical SQL against the sampled centroid table —
    * out-of-sample training leakage cannot hash-match
    * (SemdedupSampledSpec re-trains from an independently-computed
    * sample and pins bit-equality with the persisted table).
    */
  def ddSemdedupSampled(s: SparkSession, dir: String): DataFrame =
    semdedup(graft.core.FanOut(Tables(s, dir).embeddings)
      .select(col("vec_id"), col("embedding")), SemdedupSampledCentroidDir,
      trainCap = Some(Similarity.TrainSamplePerCell * SemdedupK))

  /** SemDeDup with the per-cell population cap — the skew-proof
    * production twin (see [[SemdedupCellCap]] for the scheme: core
    * collapse for the tight cluster + md5-blocked remainder for the
    * unconditional bound, every drop provably sound). Sampled
    * training like [[ddSemdedupSampled]] (the corpus-scale
    * configuration this variant belongs to); the oracle replays
    * assignment, the per-cell count → block-width ladder, the
    * centroid-cosine core test, the lowest-id core collapse, the
    * md5-prefix blocks, and the blocked keep/drop rule — a pair
    * compared across blocks, a wrong ladder arm, a drifted core
    * boundary, or a core member leaking into the pair join all
    * hash-fail.
    */
  def ddSemdedupCapped(s: SparkSession, dir: String): DataFrame =
    semdedup(graft.core.FanOut(Tables(s, dir).embeddings)
      .select(col("vec_id"), col("embedding")), SemdedupCappedCentroidDir,
      trainCap = Some(Similarity.TrainSamplePerCell * SemdedupK),
      cellCap = Some(SemdedupCellCap))

  /** Window width (tokens) for [[ddDupSpans]] — spans shorter than this
    * are treated as chance collisions; same role as the 50-token
    * threshold in Lee et al.'s suffix-array dedup, scaled to this
    * corpus's 40–90-token documents.
    */
  private[graft] val DupSpanK = 8

  /** Cross-document duplicated-SPAN detection — the fixed-width-window
    * form of exact substring dedup (Lee et al. 2021, arXiv:2107.06499,
    * "Deduplicating Training Data Makes Language Models Better":
    * suffix-array spans ≥ 50 tokens; here every k=[[DupSpanK]]-token
    * sliding window, which composes to arbitrary-length spans — a
    * duplicated span of length L ≥ k is exactly L−k+1 duplicated
    * windows, the property DupSpansSpec pins). Each window ships as the
    * md5 of its tokens — 16 bytes to the shuffle regardless of text
    * width — and counts as duplicated when its gram occurs in ≥ 2
    * DISTINCT documents. Cost is one gram-keyed distinct+aggregate and
    * one 1:1 equi-join of the window stream against the hot-gram set —
    * no pair join anywhere, so (unlike the candidate-join families) a
    * boilerplate gram shared by k docs costs k rows, not k², and needs
    * no [[PostingCap]]-style guard. Per-doc manifest: window count,
    * duplicated-window count, duplicated ratio.
    */
  def ddDupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpans(graft.core.FanOut(Tables(s, dir).documents))

  /** Core of [[ddDupSpans]] over any (doc_id, text) frame, so
    * DupSpansSpec can pin the span-composition arithmetic on a crafted
    * fixture.
    */
  private[graft] def dupSpans(docs0: DataFrame): DataFrame = {
    val t = docs0
      .select(col("doc_id"),
        filter(graft.functions.ByteSplit.split(col("text")),
          x => x =!= "").as("__w"))
      .where(size(col("__w")) >= DupSpanK)
    // persist: the window stream feeds the hot-gram build AND the final
    // join — one tokenize+md5 pass instead of two. Released before
    // return — see [[settled]].
    // fused k-window md5 kernel: one joined byte stream per doc, one
    // md5 per window — replaces the per-window slice/array_join/md5
    // transform (three allocations per window). Bit-identical hex
    // (GramMd5Spec fuzz vs the staged builtin form).
    val grams = t.select(col("doc_id"),
        explode(graft.functions.GramMd5.of(col("__w"), DupSpanK)).as("gh"))
      .persist()
    grams.count()
    settled(dupSpanManifest(grams), grams)
  }

  /** Hot-gram build + per-doc manifest over a (doc_id, gh) window
    * stream — the whole post-tokenize plan of [[ddDupSpans]], split out
    * so PlanShapeSpec can assert its join topology on an unpersisted
    * input (the oracled query caches its result, hiding the plan).
    */
  private[graft] def dupSpanManifest(grams: DataFrame): DataFrame = {
    val hot = grams.select("gh", "doc_id").distinct()
      .groupBy("gh").agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2)
    grams.join(hot, Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("nd").isNotNull, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_ratio",
        round(col("n_dup_windows").cast("double") / col("n_windows"), 6))
      .orderBy("doc_id")
  }

  /** Duplicated-span EXTENTS — the step a pipeline actually cuts on
    * (Lee et al. 2021 removes the duplicated SPANS, not the documents):
    * compose [[ddDupSpans]]'s per-window duplicate flags into maximal
    * runs of consecutive duplicated windows and emit one
    * (doc_id, start_tok, end_tok) extent per run, where a run of
    * consecutive duplicated k-windows starting at i and ending at j
    * covers tokens [i, j + k − 1] — the L−k+1-window composition
    * property DupSpansSpec pins is exactly the merge invariant (a
    * duplicated span of L tokens is L−k+1 consecutive duplicated
    * windows and merges back to one extent of L tokens).
    *
    * Plan shape: the same gram-keyed hot-set build and 1:1 equi-join
    * as [[ddDupSpans]] (no pair join — a gram in k docs costs k rows),
    * then the run merge is gaps-and-islands INSIDE each document:
    * island = window index − its per-doc rank, one doc-keyed window +
    * one (doc, island) aggregate, both bounded by document length —
    * never anything corpus-global.
    */
  def ddDupSpanExtents(s: SparkSession, dir: String): DataFrame =
    dupSpanExtents(graft.core.FanOut(Tables(s, dir).documents))

  /** Core of [[ddDupSpanExtents]] over any (doc_id, text) frame, so
    * DupSpansSpec can pin the merge arithmetic on crafted fixtures.
    */
  private[graft] def dupSpanExtents(docs0: DataFrame): DataFrame = {
    val t = docs0
      .select(col("doc_id"),
        filter(graft.functions.ByteSplit.split(col("text")),
          x => x =!= "").as("__w"))
      .where(size(col("__w")) >= DupSpanK)
    // positional window stream: (doc_id, i, gh), i = 0-based start token
    // (fused gram_md5 kernel — see dupSpans)
    val grams = t.select(col("doc_id"),
        posexplode(graft.functions.GramMd5.of(col("__w"), DupSpanK))
        .as(Seq("i", "gh")))
      .persist()
    grams.count()
    val hot = grams.select("gh", "doc_id").distinct()
      .groupBy("gh").agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2)
      .select("gh")
    // gaps-and-islands: consecutive duplicated windows share
    // i − rank(i), so each maximal run collapses to one group
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    val extents = grams.join(hot, Seq("gh"))
      .withColumn("island", col("i") - row_number().over(w))
      .groupBy("doc_id", "island")
      .agg(min("i").as("start_tok"),
        (max("i") + lit(DupSpanK - 1)).as("end_tok"),
        count(lit(1)).as("n_dup_windows"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).cast("long").as("span_tokens"),
        col("n_dup_windows"))
      .orderBy("doc_id", "start_tok")
    settled(extents, grams)
  }

  /** Span CUTTING — the transformation [[ddDupSpanExtents]] only plans:
    * remove every token covered by a duplicated window from each
    * document (Lee et al. 2021 cut the spans and kept the documents).
    * A token is cut iff ANY duplicated k-window covers it, which is
    * exactly the union of the extents — overlap-safe without a merge
    * step. Emits the cleaning manifest a pipeline audits: original /
    * kept / cut token counts plus the md5 of the kept token stream
    * (so the oracle pins the cut CONTENT, not just its size).
    *
    * Plan shape: the dup-window starts collapse to ONE bounded array
    * per document (|starts| ≤ doc length), join back 1:1 on doc_id,
    * and the cut itself is in-row array arithmetic — covered =
    * flatten of per-start ranges, kept = indexed filter against it.
    * No pair join, nothing corpus-global; docs shorter than
    * [[DupSpanK]] (no windows) pass through whole via the left join.
    */
  def ddSpanCut(s: SparkSession, dir: String): DataFrame =
    spanCut(graft.core.FanOut(Tables(s, dir).documents))

  /** Core of [[ddSpanCut]] over any (doc_id, text) frame, so
    * DupSpansSpec can pin the cut arithmetic on crafted fixtures.
    */
  private[graft] def spanCut(docs0: DataFrame): DataFrame = {
    val t = docs0.select(col("doc_id"),
      filter(graft.functions.ByteSplit.split(col("text")),
        x => x =!= "").as("__w"))
    val grams = t.where(size(col("__w")) >= DupSpanK)
      .select(col("doc_id"),
        // fused gram_md5 kernel — see dupSpans
        posexplode(graft.functions.GramMd5.of(col("__w"), DupSpanK))
        .as(Seq("i", "gh")))
      .persist()
    grams.count()
    val hot = grams.select("gh", "doc_id").distinct()
      .groupBy("gh").agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2)
      .select("gh")
    val starts = grams.join(hot, Seq("gh"))
      .groupBy("doc_id").agg(collect_list(col("i")).as("__starts"))
    val out = t.join(starts, Seq("doc_id"), "left")
      .withColumn("__covered", when(col("__starts").isNull, array())
        .otherwise(array_distinct(flatten(transform(col("__starts"),
          j => sequence(j, j + lit(DupSpanK - 1)))))))
      .withColumn("__keep", filter(col("__w"),
        (x, idx) => !array_contains(col("__covered"), idx)))
      .select(col("doc_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        size(col("__keep")).cast("long").as("n_kept"),
        (size(col("__w")) - size(col("__keep"))).cast("long").as("n_cut"),
        md5(array_join(col("__keep"), " ")).as("kept_md5"))
      .orderBy("doc_id")
    settled(out, grams)
  }

  /** Connected components over an undirected pair list — the cluster-
    * formation step a dedup pipeline runs AFTER pair generation, turning
    * verified near-dup pairs into keep/drop groups (cluster id = the
    * minimum member id, the canonical "keep" document).
    *
    * Min-label propagation with an automatic diameter escape hatch:
    * every node starts at least(self, min neighbor) and each round
    * takes the min of its label and its neighbors' labels — all
    * hash-partitioned joins/aggregates on node id, nothing driver-sided
    * (the convergence probe is `isEmpty` on the changed-label diff, an
    * O(1)-row answer). Rounds = component diameter, and near-dup
    * components are quasi-cliques (diameter 2-3 in practice) — but a
    * pathological CHAIN corpus (doc A ≈ B ≈ C ≈ … pairwise, never
    * transitively identical) has diameter Θ(n), so if propagation has
    * not converged after [[MaxPropagationRounds]] rounds the work is
    * abandoned and [[starLabels]] — the alternating large-star/
    * small-star contraction, O(log² n) rounds — produces the identical
    * labeling (components and their min labels are graph properties,
    * not algorithm properties; ClusterChainSpec asserts equality on
    * chains and seeded random graphs). Lineage is truncated per round
    * (localCheckpoint) so the plan does not grow with iteration count.
    *
    * Contract: self-pairs (doc_a == doc_b) are IGNORED by both paths —
    * a doc related only to itself is simply unclustered, which every
    * consumer already treats as a singleton (`coalesce(cluster_id,
    * doc_id)`). ClusterChainSpec pins the two paths' agreement on
    * inputs containing self-pairs.
    */
  def clusterPairs(pairs: DataFrame): DataFrame =
    propagateLabels(pairs, MaxPropagationRounds)._1
      .getOrElse(starLabels(pairs)._1)

  /** Propagation-round budget before [[clusterPairs]] switches to the
    * star contraction. A round is one MATERIALIZATION carrying TWO
    * propagation hops (see [[propagateLabels]]), so the budget is the
    * same 10 hops as before the fusion: quasi-clique dedup components
    * converge in 2-4 hops, so 10 is already 2-3× slack; past it the
    * graph is chain-shaped and each further hop advances the min label
    * by ONE edge while a star round roughly halves every chain.
    */
  private[graft] val MaxPropagationRounds = 5

  /** Min-label propagation to fixpoint, bounded: returns
    * (Some(labels), rounds) on convergence within `maxRounds`, else
    * (None, maxRounds). Package-visible so specs can measure the round
    * count against the component diameter.
    */
  private[graft] def propagateLabels(
      pairs: DataFrame, maxRounds: Int): (Option[DataFrame], Int) = {
    val e = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      // self-pairs carry no clustering information; dropping them here
      // keeps this path's node set IDENTICAL to starLabels' (which must
      // drop them for its star-fixpoint test) — the two algorithms are
      // interchangeable on ANY input, not just self-loop-free input
      .where(col("a") =!= col("b"))
      .distinct().persist()
    var labels = e.groupBy(col("a").as("doc_id"))
      .agg(min("b").as("mn"))
      .select(col("doc_id"), least(col("doc_id"), col("mn")).as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    // min label over each node's neighborhood under labeling `l`
    def neighborMin(l: DataFrame, out: String): DataFrame = e
      .join(l.select(col("doc_id").as("b"), col("cluster_id").as("nl")), "b")
      .groupBy(col("a").as("doc_id")).agg(min("nl").as(out))
    while (!converged && rounds < maxRounds) {
      rounds += 1
      // TWO propagation hops per materialization — half the driver
      // round trips (checkpoint + convergence probe) for the same
      // shuffle volume. hop1 is a plain subplan (labels and e are
      // cached leaves, so its double reference re-reads blocks, not
      // lineage). Equivalence: with m = hop1's labeling,
      //   least(l(v), min_{u∈N(v)} m(u)) = least(m(v), min_{u∈N(v)} m(u))
      // because m(v) = least(l(v), min_{u∈N(v)} l(u)) and
      // min_u m(u) ≤ min_u l(u) — so `next` IS the exact 2-hop label.
      val hop1 = labels.join(neighborMin(labels, "nmin"), "doc_id")
        .select(col("doc_id"),
          least(col("cluster_id"), col("nmin")).as("cluster_id"))
      // carry a per-row changed flag through the (eager) checkpoint:
      // the convergence test is then a predicate scan of the already-
      // materialized round, not a labels-vs-next join job. The flag
      // sees BOTH hops: labels decrease monotonically, and a hop-1
      // change at u forces nmin2(u) ≤ hop1(w*) < l(u) via u's changed
      // neighbor w*, so no hop-1 change can hide behind a quiet hop 2.
      val next = labels.join(neighborMin(hop1, "nmin2"), "doc_id")
        .select(col("doc_id"),
          least(col("cluster_id"), col("nmin2")).as("cluster_id"),
          (col("nmin2") < col("cluster_id")).as("__chg"))
        .localCheckpoint(true)
      converged = next.where(col("__chg")).isEmpty
      labels = next.select("doc_id", "cluster_id")
    }
    e.unpersist()
    (if (converged) Some(labels) else None, rounds)
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (the
    * large-star/small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the chain-pathology path of
    * [[clusterPairs]], O(log² n) rounds regardless of diameter:
    *
    *   - large-star: every node links each LARGER neighbor to the
    *     minimum of its closed neighborhood — long tails fold onto
    *     local minima in parallel;
    *   - small-star: every node links its smaller neighbors (and
    *     itself) to their minimum — stars flatten one level.
    *
    * Both steps are a groupBy-min plus an equi-join on the node id —
    * the same shuffle key throughout, nothing driver-sided — and each
    * round's edge set is localCheckpointed (lineage stays flat). At
    * the fixpoint the edge set is a disjoint union of stars centered
    * on component minima, from which the (doc_id, cluster_id) labeling
    * reads off directly. Returns (labels, rounds).
    */
  private[graft] def starLabels(pairs: DataFrame): (DataFrame, Int) = {
    // LAZY initial checkpoint: round 1's eager `next` checkpoint
    // computes every partition of this edge set anyway (the small-star
    // aggregate shuffles all of it), so the deferred materialization
    // costs no extra job — one driver action saved vs eager.
    var e = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .where(col("a") =!= col("b"))
      .distinct().localCheckpoint(false)
    var rounds = 0
    var done = false
    while (!done) {
      rounds += 1
      // LARGE-STAR: (v, m(u)) for every neighbor v > u,
      // m(u) = min(N(u) ∪ {u})
      val minsL = e.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val ls = e.where(col("b") > col("a"))
        .join(minsL, "a")
        .where(col("b") =!= col("m"))
        .select(col("b").as("x"), col("m").as("y"))
      // LAZY checkpoint, same rationale as the initial edge set: the
      // small-star step references this twice (the lineage cut is what
      // matters), and `next`'s eager checkpoint job materializes all
      // of its partitions — eager here only added a driver action.
      val afterLarge = ls.select(col("x").as("a"), col("y").as("b"))
        .union(ls.select(col("y").as("a"), col("x").as("b")))
        .distinct().localCheckpoint(false)
      // SMALL-STAR: (v, m(u)) for every neighbor v < u plus (u, m(u)),
      // m(u) = min of the smaller neighbors
      val smaller = afterLarge.where(col("b") < col("a"))
      val withM = smaller
        .join(smaller.groupBy("a").agg(min("b").as("m")), "a")
      val ss = withM.where(col("b") =!= col("m"))
        .select(col("b").as("x"), col("m").as("y"))
        .union(withM.select(col("a").as("x"), col("m").as("y")))
      val next = ss.select(col("x").as("a"), col("y").as("b"))
        .union(ss.select(col("y").as("a"), col("x").as("b")))
        .distinct().localCheckpoint(true)
      // set equality as ONE action: both sides are distinct edge sets,
      // so the union of the two anti-joins is empty iff they are equal
      // (one job per round instead of two — the frames are already
      // checkpointed, so each probe is a local scan + broadcast probe)
      done = next.join(e, Seq("a", "b"), "left_anti")
        .unionByName(e.join(next, Seq("a", "b"), "left_anti"))
        .isEmpty
      e = next
    }
    // fixpoint = disjoint stars: non-roots carry exactly one edge to
    // their (smaller) root; roots are the components' minima
    val nonRoots = e.where(col("b") < col("a"))
      .select(col("a").as("doc_id"), col("b").as("cluster_id"))
    val roots = nonRoots.select(col("cluster_id").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
    (nonRoots.unionByName(roots), rounds)
  }

  /** Cluster formation under the oracle: components of the VERIFIED
    * minhash near-dup pairs at J ≥ 0.5 (the banding design point), one
    * row per clustered document with its canonical keep id. DuckDB
    * replays the full minhash pair derivation, then closes it
    * transitively with a recursive CTE — a propagation that mislabeled
    * one chained component hash-mismatches.
    */
  def ddCluster(s: SparkSession, dir: String): DataFrame =
    clusterPairs(
      ddMinhashLsh(s, dir).where(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b"))
      .orderBy("doc_id")

  /** Chain length for [[ddClusterChain]]'s pathological fixture —
    * diameter 31 ≫ [[MaxPropagationRounds]], so min-label propagation
    * is GUARANTEED to abandon and the star-contraction fallback is the
    * code path under the oracle's hash.
    */
  private[graft] val ChainBlock = 32

  /** Deterministic chain-shaped near-dup pairs over the corpus: doc i
    * pairs with doc i+1 except across [[ChainBlock]] boundaries —
    * consecutive runs of diameter [[ChainBlock]]−1 (doc_ids are dense
    * 0..N−1 in this corpus, asserted by the oracle's row counts). Built
    * as a self-equi-join on doc_id+1, no window, no global sort.
    */
  private[graft] def chainPairs(docs: DataFrame): DataFrame = {
    val a = docs.select(col("doc_id").as("doc_a"))
    val b = docs.select(col("doc_id").as("doc_b"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .where(col("doc_a") % ChainBlock =!= (ChainBlock - 1))
  }

  /** Cluster formation on the CHAIN pathology, under the driver's hash
    * gate — the input real near-dup corpora never produce (quasi-clique
    * components converge in 2-3 propagation rounds) but boilerplate
    * chains can (A ≈ B ≈ C pairwise, never transitively identical).
    * [[chainPairs]] makes every component a path of diameter
    * [[ChainBlock]]−1 > [[MaxPropagationRounds]], so [[clusterPairs]]
    * provably abandons propagation and the [[starLabels]] large-star/
    * small-star contraction produces the labeling being hashed
    * (ClusterChainSpec additionally asserts the propagation path alone
    * does NOT converge on this fixture). The oracle replays the
    * expected components in closed form: dense ids make each chain's
    * minimum `doc_id − doc_id % block`.
    */
  def ddClusterChain(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents.select("doc_id")
    docs
      .join(clusterPairs(chainPairs(docs)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Fixed-point scale for [[ddPagerank]] — 10¹² units of probability
    * mass keep six significant digits through three damped iterations
    * while every quantity stays far inside int64 (the total mass is
    * PrScale by construction, so no sum exceeds ~10¹⁴).
    */
  private[graft] val PrScale = 1000000000000L
  private[graft] val PrIters = 3
  private[graft] val PrDamp = 85 // ×1/100 — the classic 0.85

  /** PageRank centrality over the verified near-dup pair graph — the
    * graph-analytics complement to [[ddCluster]]: where components give
    * keep/drop GROUPS, centrality ranks members WITHIN a quasi-clique
    * (the most-connected member is the best canonical representative
    * when no quality score is available, and degree alone can't break
    * clique ties the damped walk can).
    *
    * Everything is INTEGER fixed-point so the oracle replays it
    * exactly: pr₀ = S div N; per round, each node emits
    * pr div deg to every neighbor and collects
    * base + (85 · Σ incoming) div 100, base = ((S div N)·15) div 100 —
    * floor division on positive int64 is engine-identical, so three
    * iterations stay bit-exact (no float damping drift). [[PrIters]]
    * fixed rounds, unrolled in the oracle's CTE chain.
    *
    * Scale shape: one edge-keyed equi-join + one node-keyed aggregate
    * per round (the standard Pregel message round as two exchanges),
    * N arrives as a broadcast 1-row stats frame, nothing driver-sided;
    * rounds are fixed at [[PrIters]] so plan depth is constant.
    */
  def ddPagerank(s: SparkSession, dir: String): DataFrame =
    pagerank(ddMinhashLsh(s, dir).where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b"))

  /** Core of [[ddPagerank]] over any (doc_a, doc_b) pair frame, so a
    * spec can pin closed-form fixtures (stars, cliques, paths).
    */
  private[graft] def pagerank(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .where(col("a") =!= col("b"))
      .distinct().persist()
    e.count()
    val deg = e.groupBy("a").agg(count(lit(1)).as("deg"))
    val n1 = deg.agg(count(lit(1)).as("n_nodes"))
    var pr = deg.crossJoin(broadcast(n1))
      .select(col("a").as("doc_id"), col("deg"), col("n_nodes"),
        expr(s"${PrScale}L div n_nodes").as("pr"))
    for (_ <- 1 to PrIters) {
      val contrib = pr.select(col("doc_id").as("b"),
        expr("pr div deg").as("c"))
      val inSum = e.join(contrib, "b")
        .groupBy(col("a").as("doc_id")).agg(sum("c").as("s"))
      pr = pr.drop("pr").join(inSum, "doc_id")
        .withColumn("pr", expr(s"((${PrScale}L div n_nodes) * 15) div 100" +
          s" + ($PrDamp * s) div 100"))
        .select("doc_id", "deg", "n_nodes", "pr")
        // materialize each superstep (same discipline as KmeansIvf
        // .train): pr_k appears TWICE in pr_{k+1}'s plan (contrib +
        // the re-join), so an unmaterialized loop re-derives every
        // earlier round 2^Δ times wherever exchange reuse misses, and
        // plan depth grows per round. One row per node — the
        // checkpoint is tiny at any scale.
        .localCheckpoint(eager = true)
    }
    val out = pr.select(col("doc_id"), col("deg"), col("pr"))
      .orderBy("doc_id")
    settled(out, e)
  }

  /** The dedup POLICY step — what a pipeline actually DOES with the
    * clusters: per near-dup cluster ([[ddCluster]]), keep the
    * highest-quality member ([[graft.queries.TextAnalysis.taQuality]]'s
    * score; ties broken by doc id), report the survivor with the
    * cluster size and its score. This closes the loop
    * detect → cluster → select that turns the near-dup DETECTORS into
    * an end-to-end dedup: downstream training reads survivors only.
    *
    * Scale shape: quality is a per-row expression pipeline joined to
    * the (tiny relative to the corpus) clustered-doc set — at 100 TB
    * compute quality ONLY for clustered docs by semi-joining first, so
    * the full-corpus scan stays expression-only. Selection is one
    * bounded window per cluster, keyed on cluster_id; cluster sizes are
    * bounded by the LSH band caps upstream, so no window sorts an
    * unbounded group. Tie-break on the ROUNDED score (both engines
    * round to 6 before comparing) keeps the argmax engine-exact.
    */
  def ddKeepBest(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    val clusters = ddCluster(s, dir)
    // semi-join FIRST, score second: quality runs only over the (tiny)
    // clustered-doc set, so the full-corpus scan stays expression-free
    // — the shape the Scaladoc's scale note prescribes
    val clusteredDocs = graft.sources.Tables(s, dir).documents
      .join(clusters.select("doc_id"), Seq("doc_id"), "left_semi")
    val scored = clusters
      .join(TextAnalysis.qualityOf(clusteredDocs).select("doc_id", "quality"), "doc_id")
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")).cast("int"))
      .where(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_id"),
        col("n_members"), col("quality").as("best_quality"))
      .orderBy("cluster_id")
  }

  /** Quality floor for [[ddManifest]]'s last gate — sits at the ~5th
    * percentile of the gate corpus's quality distribution, so the
    * low-quality branch is genuinely exercised under the oracle. Both
    * engines compare the same round(…, 6) double to the same literal.
    */
  private[graft] val ManifestQualityFloor = 0.55

  /** END-TO-END cleaning manifest — the composed keep/drop decision a
    * pipeline actually executes, one row per document:
    * exact-duplicate removal (fingerprint group, min-id keeper), then
    * near-duplicate removal (minhash-LSH → verified pairs → connected
    * components → per-cluster quality keep-best), then a quality
    * floor. Reasons cascade in that order; `decision` is derived from
    * `reason`. The cascade is consistent by construction: an exact-dup
    * group shares all shingles (J = 1), so it lands in one cluster,
    * and ties on (identical) quality break to the min doc_id — the
    * cluster's keeper is never a doc the exact stage dropped.
    *
    * Scale shape: quality is ONE full-corpus scan-speed pass (the
    * manifest needs every doc's score for the floor anyway, so
    * ddKeepBest's semi-join-first trick would save nothing here); the
    * fingerprint stage is a hash-aggregate on a 16-byte key; every
    * join is a doc_id/fingerprint/cluster_id equi-join with the
    * cluster side tiny relative to the corpus (AQE broadcasts it).
    * The pair-join cost lives entirely inside [[ddCluster]], whose
    * caps and banding rules are oracled separately.
    */
  def ddManifest(s: SparkSession, dir: String): DataFrame = {
    val clusters = ddCluster(s, dir).persist()
    clusters.count() // settle: read by keep-best scoring AND membership
    settled(manifestOf(graft.sources.Tables(s, dir).documents, clusters),
      clusters)
  }

  /** Core over any (docs, clusters) pair so ManifestSpec can pin the
    * cascade on closed-form fixtures (incl. the exact-dup branch the
    * all-unique gate corpus never fires).
    */
  private[graft] def manifestOf(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"),
      graft.functions.CanonFp.of(col("text")).as("fingerprint"))
    val exact = fp.join(
        fp.groupBy("fingerprint").agg(min("doc_id").as("__xk")), "fingerprint")
      .select(col("doc_id"), (col("doc_id") =!= col("__xk")).as("__exact_drop"))
    val q = TextAnalysis.qualityOf(docs).select("doc_id", "quality")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("quality").desc, col("doc_id"))
    val kb = clusters.join(q, "doc_id")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("__keep_id"))
    val near = clusters.join(kb, "cluster_id")
      .select(col("doc_id"), (col("doc_id") =!= col("__keep_id")).as("__near_drop"))
    docs.select("doc_id")
      .join(exact, "doc_id")
      .join(near, Seq("doc_id"), "left_outer")
      .join(q, "doc_id")
      .withColumn("reason",
        when(col("__exact_drop"), "exact_dup")
          .when(coalesce(col("__near_drop"), lit(false)), "near_dup")
          .when(col("quality") < ManifestQualityFloor, "low_quality")
          .otherwise("ok"))
      .select(col("doc_id"),
        when(col("reason") === "ok", "keep").otherwise("drop").as("decision"),
        col("reason"), col("quality"))
      .orderBy("doc_id")
  }

  /** LEAKAGE-FREE train/val/test split — the assignment step a training
    * pipeline runs AFTER near-dup clustering: a doc's split is decided
    * by the hash-coin of its CLUSTER's canonical id (its own id when
    * unclustered), so near-duplicate documents can never straddle
    * train and test — the contamination a doc-keyed split silently
    * permits (a test doc's near-dup twin in train is memorization, not
    * generalization). Ratios are parameterized ([[splitThresholds]];
    * the oracle pins the 75/12.5/12.5 default) as hex thresholds on
    * the same stateless md5 coin
    * [[graft.queries.TextAnalysis.taSample]] uses:
    * partition-independent, rerun-reproducible, no RNG state. Scale
    * shape: one left join of the corpus against the (tiny) clustered
    * set + per-row expressions; SplitLeakSpec asserts — independently
    * of this implementation, via the clustered pairs — that every
    * cluster lands in exactly one split.
    */
  def ddSplit(s: SparkSession, dir: String): DataFrame =
    ddSplitWith(s, dir, SplitRatios, SplitNames)

  /** Oracle-pinned default split config: 75 % train, 12.5 % val,
    * 12.5 % test → thresholds "c000"/"e000" in the oracle SQL.
    */
  private[graft] val SplitRatios = Seq(0.75, 0.125, 0.125)
  private[graft] val SplitNames = Seq("train", "val", "test")

  /** Cumulative hex thresholds on the 16-bit coin space for a ratio
    * vector: n ratios (each > 0, summing to 1) → n−1 strictly
    * increasing 4-hex-digit cut points. The k-th split takes coins in
    * [threshold(k−1), threshold(k)) — so any mixture a pipeline wants
    * is two lines of config away, without touching the oracle SQL
    * (which pins the default; the SplitConfig spec pins the rule).
    */
  private[graft] def splitThresholds(ratios: Seq[Double]): Seq[String] = {
    require(ratios.size >= 2 && ratios.forall(_ > 0.0),
      s"need >= 2 positive ratios, got $ratios")
    require(math.abs(ratios.sum - 1.0) < 1e-9, s"ratios must sum to 1: $ratios")
    val cuts = ratios.scanLeft(0.0)(_ + _).tail.init // cumulative, drop 0 and 1
    val rounded = cuts.map(f => math.round(f * 0x10000).toInt)
    // a cut that rounds to 0 or 0x10000 would format as "0000" (empty
    // split) or the 5-char "10000" (lexicographically BELOW "1xxx".."fxxx"
    // on the 4-hex-char coin, silently misrouting ~94% of the coin space)
    require(rounded.forall(c => c > 0 && c < 0x10000),
      s"ratios too extreme for the 16-bit coin space: cuts $rounded " +
        s"must all be in (0, ${0x10000})")
    val hex = rounded.map(c => f"$c%04x")
    require(hex == hex.sorted && hex.distinct == hex,
      s"thresholds must be strictly increasing: $hex (ratios too fine for 16 bits)")
    hex
  }

  private[graft] def ddSplitWith(s: SparkSession, dir: String,
      ratios: Seq[Double], names: Seq[String]): DataFrame = {
    require(names.size == ratios.size, "one name per ratio")
    val thresholds = splitThresholds(ratios)
    val clusters = ddCluster(s, dir).select(col("doc_id"), col("cluster_id"))
    val keyed = Tables(s, dir).documents.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("split_key"))
    val coin = substring(md5(concat(lit("graft-split-1|"), col("split_key"))), 1, 4)
    val split = names.init.zip(thresholds)
      .foldRight(lit(names.last): org.apache.spark.sql.Column) {
        case ((name, th), els) => when(coin < lit(th), lit(name)).otherwise(els)
      }
    keyed
      .select(col("doc_id"), col("split_key"), split.as("split"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination — the training-corpus hygiene pass that
    * flags every train document sharing a word 3-gram with the held-out
    * evaluation split (here: `doc_id % 10 == 0`, standing in for an
    * external benchmark suite). Reported per contaminated train doc:
    * how many of its distinct shingles hit the test set, its total
    * distinct-shingle count, and the contaminated fraction.
    *
    * Scale shape: the test side collapses to its DISTINCT shingle set
    * before the join, so each train posting matches AT MOST once —
    * candidate volume is O(train postings), never quadratic, and no
    * posting cap is needed (unlike the near-dup self-join, a hot
    * boilerplate shingle here contributes one match per train doc,
    * which is the correct answer). Both sides exchange on the shingle
    * key via shuffle_hash; when the held-out set is a real benchmark
    * suite (MBs against 100 TB of train), swap the hint for
    * `broadcast(testSh)` and the train side never shuffles at all —
    * the join becomes a map-side bloom-style filter. Per-doc sizes are
    * per-row arithmetic (`size(array_distinct(sh))`), not a second
    * aggregate over the postings.
    */
  def ddContam(s: SparkSession, dir: String): DataFrame =
    contam(shingled(s, dir), broadcastTest = false)

  /** Core of [[ddContam]], parameterized on the join strategy for the
    * test-shingle side: `broadcastTest = true` is the 100 TB shape for
    * a genuinely-small benchmark suite (the train side never shuffles —
    * ScaleUtilsSpec asserts the BroadcastHashJoin and result
    * invariance); `false` (the oracled default) shuffle-hashes both
    * sides, safe at any test-set size.
    */
  private[graft] def contam(staged: DataFrame, broadcastTest: Boolean): DataFrame = {
    val isTest = pmod(col("doc_id"), lit(10)) === 0
    val testSh = staged.where(isTest)
      .select(explode(array_distinct(col("sh"))).as("shingle")).distinct()
    val testSide = if (broadcastTest) broadcast(testSh) else testSh.hint("shuffle_hash")
    val train = staged.where(!isTest)
      .select(col("doc_id"), array_distinct(col("sh")).as("shd"))
    val hits = train
      .select(col("doc_id"), explode(col("shd")).as("shingle"))
      .join(testSide, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_hit"))
    hits
      .join(train.select(col("doc_id"), size(col("shd")).as("n_sh")), "doc_id")
      .select(col("doc_id"), col("n_hit"), col("n_sh"),
        round(col("n_hit").cast("double") / col("n_sh"), 6).as("contam_ratio"))
      .orderBy("doc_id")
  }

  /** Eval-set membership rule for [[ddContamEmbed]]: every 13th vec_id
    * stands in for an external benchmark's embedded prompts (39 of the
    * gate corpus's 500 vectors — benchmark-sized against the rest).
    */
  private[graft] val ContamEmbedEvalMod = 13
  /** Cosine at or above which a train vector is flagged as semantic
    * contamination — the same rounded-cosine operating point as the
    * near-dup family ([[ddEmbedNear]]), applied cross-set.
    */
  private[graft] val ContamEmbedTau = 0.35

  /** SEMANTIC decontamination — the embedding-space complement of
    * [[ddContam]]'s lexical 3-gram screen: a paraphrased benchmark
    * question shares no shingle with its source but lands next to it
    * in embedding space, so training-corpus hygiene at the frontier
    * runs BOTH screens. Flags every train (non-eval) vector whose
    * cosine against ANY eval vector clears [[ContamEmbedTau]]; reports
    * the closest eval neighbor (ties → lowest eval_id), its cosine,
    * and how many eval vectors it collides with.
    *
    * Scale shape — the whole query is MAP WORK over the train scan:
    * the eval set (a benchmark suite: thousands of rows, MBs — never
    * corpus-scale) collapses into ONE broadcast row holding an array
    * of (eval_id, embedding, norm) structs, and each train row scores
    * it with in-row higher-order folds (the [[Relational.q41HigherOrder]]
    * device): zero exchange of train rows, zero groupBy — the
    * n_hits/argmax aggregation happens INSIDE the row over the
    * cosine array, not across rows. Per-row cost is |eval|·d fused
    * multiply-adds at scan speed, the same shape as [[TextAnalysis]]'s
    * DSIR broadcast-score pass. (A corpus-scale "eval" side would
    * instead ride the banded-LSH candidate machinery — [[ddEmbedLsh]];
    * this operator is the benchmark-sized fast path.)
    *
    * Determinism: the dot is the canonical left fold in doubles
    * (cast-then-multiply-then-fold — bit-identical to the DuckDB
    * replay), cosines round to 6 before every comparison, and the
    * in-row argmax breaks cosine ties on lowest eval_id via struct
    * ordering on (cosine, −eval_id).
    */
  def ddContamEmbed(s: SparkSession, dir: String): DataFrame =
    contamEmbed(Tables(s, dir).embeddings, ContamEmbedEvalMod)

  /** Core of [[ddContamEmbed]], parameterized on the embeddings frame
    * and the eval-membership modulus — ScaleStudy's `contam_embed`
    * mode scales the modulus with n so the eval set stays
    * benchmark-SIZED (constant) while the train side grows, which is
    * the production shape this operator's zero-shuffle plan assumes.
    */
  /** Hard ceiling on the eval-set row count [[contamEmbed]]'s
    * single-broadcast-row plan accepts: past it the collect_list
    * payload approaches the 2 GB single-row / broadcast limits and the
    * zero-shuffle assumption the Scaladoc documents silently breaks.
    * 65 536 rows × (d+2) doubles is ≈ 9 MB at the gate's d=16 and
    * ≈ 400 MB at a production d=768 — the benchmark-suite regime this
    * fast path is for. A corpus-sized eval must fail LOUDLY here and
    * route to the banded-LSH candidate machinery ([[ddEmbedLsh]]).
    */
  private[graft] val ContamEmbedMaxEval = 65536L

  private[graft] def contamEmbed(emb: DataFrame, evalMod: Long): DataFrame = {
    // norms and dots ride the codegen'd [[graft.functions.DotProduct]]
    // kernel on the RAW float arrays — bit-identical to the staged
    // transform-to-double + zip_with/aggregate folds it replaced
    // (float→double widening is exact, same products, same left fold —
    // DotProductSpec pins it), but the per-(row, eval) work drops from
    // two interpreted lambdas + a zipped intermediate array to one
    // tight loop: this screen is |train|·|eval| dots, the hot kernel
    // of both dd_contam_embed and st_pipeline's ingest sem screen
    val e = emb
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val isEval = pmod(col("vec_id"), lit(evalMod)) === 0
    // guard the benchmark-sized-eval assumption before building the
    // one-row payload: one count over the (small by contract) eval
    // side — negligible next to the train scan it protects
    val nEval = e.where(isEval).count()
    require(nEval <= ContamEmbedMaxEval,
      s"dd_contam_embed: eval set has $nEval rows > $ContamEmbedMaxEval — " +
        "the single-broadcast-row fast path is for benchmark-sized eval " +
        "sets; use the banded-LSH candidate path (ddEmbedLsh) for a " +
        "corpus-scale eval side")
    // the benchmark side: ONE row, an array of eval structs (sorted for
    // a deterministic broadcast payload; consumers are order-invariant)
    val evalArr = e.where(isEval)
      .select(struct(col("vec_id").as("eval_id"), col("emb"), col("nrm")).as("ev"))
      .agg(sort_array(collect_list(col("ev"))).as("evals"))
    e.where(!isEval)
      .crossJoin(broadcast(evalArr))
      .withColumn("cos_arr", transform(col("evals"), ev =>
        struct(
          round(dot(col("emb"), ev.getField("emb")) /
            (col("nrm") * ev.getField("nrm")), 6).as("cosine"),
          ev.getField("eval_id").as("eval_id"))))
      .withColumn("hits",
        expr(s"filter(cos_arr, c -> c.cosine >= $ContamEmbedTau)"))
      .where(size(col("hits")) > 0)
      .withColumn("best", expr(
        "array_max(transform(hits, c -> struct(c.cosine AS cosine, -c.eval_id AS neg_id)))"))
      .select(col("vec_id"), (-col("best.neg_id")).as("eval_id"),
        col("best.cosine").as("cosine"), size(col("hits")).as("n_hits"))
      .orderBy("vec_id")
  }

  /** Eval-membership modulus for [[ddContamBoth]] — BOTH screens hold
    * out the same benchmark set ([[ddContam]]'s `doc_id % 10 == 0`
    * rule; documents and embeddings share the id domain), because
    * that is what composing the screens MEANS: one held-out suite,
    * two detection channels over it.
    */
  private[graft] val ContamBothEvalMod = 10L

  /** COMPOSED decontamination — the manifest frontier hygiene actually
    * ships: [[ddContam]]'s lexical 3-gram screen and [[ddContamEmbed]]'s
    * embedding-cosine screen run against the SAME held-out set
    * ([[ContamBothEvalMod]]), and every train doc flagged by EITHER
    * lands here once with per-screen attribution — which screen fired
    * (`lex_hit`/`sem_hit`), the lexical hit counts/ratio, and the
    * closest semantic eval neighbor. The two screens are complements
    * by construction (the embed Scaladoc's framing): verbatim overlap
    * that embeddings may smooth over vs paraphrase that shares no
    * shingle — the union with attribution is what a removal/audit
    * pass consumes.
    *
    * Scale shape: both derivations are reused VERBATIM (the shingle
    * screen's distinct-collapsed test join; the embed screen's one
    * broadcast eval row + in-row folds), and the composition joins
    * two HIT-sized frames (contaminated train docs only — orders of
    * magnitude below corpus size) on doc_id. Sentinels, not nulls,
    * fill the absent screen's columns (-1 eval id, 0 counts/ratios);
    * the booleans carry the semantics.
    */
  def ddContamBoth(s: SparkSession, dir: String): DataFrame = {
    val lex = contam(shingled(s, dir), broadcastTest = false)
      .select(col("doc_id"), col("n_hit").as("n_lex_hits"),
        col("contam_ratio").as("lex_ratio"))
    val sem = contamEmbed(Tables(s, dir).embeddings, ContamBothEvalMod)
      .select(col("vec_id").as("doc_id"), col("eval_id").as("sem_eval_id"),
        col("cosine").as("sem_cosine"), col("n_hits").as("n_sem_hits"))
    lex.withColumn("__lex", lit(true))
      .join(sem.withColumn("__sem", lit(true)), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("__lex"), lit(false)).as("lex_hit"),
        coalesce(col("__sem"), lit(false)).as("sem_hit"),
        coalesce(col("n_lex_hits"), lit(0)).as("n_lex_hits"),
        coalesce(col("lex_ratio"), lit(0.0)).as("lex_ratio"),
        coalesce(col("sem_eval_id"), lit(-1L)).as("sem_eval_id"),
        coalesce(col("sem_cosine"), lit(0.0)).as("sem_cosine"),
        coalesce(col("n_sem_hits"), lit(0)).as("n_sem_hits"))
      .orderBy("doc_id")
  }

  /** Lexical-contamination drop threshold for the pipeline: a train
    * doc whose eval-shingle overlap ratio reaches it is removed (any
    * single shared shingle — [[ddContam]]'s reporting bar — would
    * remove 95% of the gate corpus; 0.2 is the "substantial verbatim
    * overlap" operating point).
    */
  private[graft] val PipelineLexTau = 0.2

  /** Per-domain quota for the pipeline's final cap stage. Smaller than
    * [[TextAnalysis.DomainCapQuota]] (the standalone operator's gate
    * config) because the cap here applies to the POST-quality corpus —
    * the same static-oracle compromise every scale-aware rule
    * documents: the oracled constant is the gate corpus's operating
    * point, a production run scales it with survivor density.
    */
  private[graft] val PipelineDomainQuota = 3

  /** END-TO-END CURATION PIPELINE with per-stage drop attribution —
    * the audit manifest a data team actually ships: every stage the
    * repo proves separately, composed SEQUENTIALLY (first drop wins),
    * one row per corpus document saying what happened to it and at
    * which stage. Stage order is the frontier-pipeline convention
    * (dedup → decontamination → quality → domain bounding), with the
    * benchmark holdout ([[ContamBothEvalMod]] — the same suite both
    * contamination screens test against) excluded up front:
    *
    *   1. `holdout`  — eval-suite docs; never training candidates.
    *   2. `exact`    — not the min-doc_id keeper of its canonical-text
    *                   fingerprint group ([[ddExact]]'s derivation).
    *   3. `near_dup` — has a lower-id, exact-surviving train partner
    *                   at verified minhash J ≥ 0.5 ([[ddMinhashLsh]]'s
    *                   pair derivation VERBATIM — the band caps and
    *                   verification run once, corpus-wide; the
    *                   lower-id-neighbor drop rule is [[ddSemdedup]]'s).
    *   4. `contam_lex` — eval-shingle overlap ratio ≥ [[PipelineLexTau]]
    *                   ([[contam]]'s screen verbatim).
    *   5. `contam_sem` — embedding cosine ≥ [[ContamEmbedTau]] against
    *                   any eval vector ([[contamEmbed]] verbatim; docs
    *                   without an embedding row cannot sem-flag, on
    *                   both engines).
    *   6. `gopher`   — fails any of the five [[TextAnalysis.gopherRules]].
    *   7. `domain_cap` — beyond its domain's [[PipelineDomainQuota]]
    *                   smallest md5 coins AMONG PIPELINE SURVIVORS
    *                   (the sequential-composition stage: the quota
    *                   rank is over what earlier stages let through —
    *                   [[TextAnalysis.taDomainCap]]'s coin discipline).
    *   8. `kept`.
    *
    * Scale shape: one scan computes fingerprints + gopher flags
    * per-row; every stage-flag frame is HIT-sized and left-joins back
    * to the base on doc_id; the only window runs over post-pipeline
    * survivors per domain (already density-bounded by the stages
    * before it). At the gate every stage except `exact` fires on the
    * real corpus (the testdata has no byte-identical dups — declared);
    * PipelineSpec's crafted fixture fires all seven, exact included.
    */
  def ddPipelineManifest(s: SparkSession, dir: String): DataFrame = {
    // ONE staged shingle pass feeds BOTH shingle consumers — the
    // minhash near-dup derivation and the lexical contamination screen
    // previously each re-ran tokenize+shingle over the corpus
    // (ddMinhashLsh's internal stage was released before contam's
    // action fired). Same settle/release discipline as [[settled]]'s
    // other callers: the pipeline's own manifest is the only cached
    // frame left behind.
    val staged = shingled(s, dir).select(col("doc_id"), col("sh")).persist()
    staged.count()
    val pairs = minhashLshFrom(staged).select("doc_a", "doc_b", "jaccard")
    val lexHits = contam(staged, broadcastTest = false)
      .select(col("doc_id"), col("contam_ratio"))
    val sem = contamEmbed(Tables(s, dir).embeddings, ContamBothEvalMod)
      .select(col("vec_id").as("doc_id"))
    settled(
      pipelineCore(graft.core.FanOut(Tables(s, dir).documents), pairs,
        lexHits, sem, PipelineDomainQuota),
      staged, pairs)
  }

  /** Core of [[ddPipelineManifest]] over explicit stage inputs, so the
    * spec can drive every stage (exact dups included) on a crafted
    * corpus: `pairs` = verified near-dup pairs (doc_a < doc_b,
    * jaccard), `lexHits` = (doc_id, contam_ratio), `semFlagged` =
    * sem-screen hit doc_ids.
    */
  private[graft] def pipelineCore(docs: DataFrame, pairs: DataFrame,
      lexHits: DataFrame, semFlagged: DataFrame, quota: Int): DataFrame = {
    val isEval = pmod(col("doc_id"), lit(ContamBothEvalMod)) === 0
    val fp = graft.functions.CanonFp.of(col("text"))
    val base = docs.select(col("doc_id"), col("source"),
      isEval.as("holdout"), fp.as("f"))
    // exact: ddExact's min-per-fingerprint-group keeper, train side only
    val keepers = base.where(!col("holdout"))
      .groupBy("f").agg(min("doc_id").as("keep_id"))
    val flagged = base.join(keepers, Seq("f"), "left")
      .select(col("doc_id"), col("source"), col("holdout"),
        (!col("holdout") && col("doc_id") =!= col("keep_id")).as("x_exact"))
    val exSurvivors = flagged
      .where(!col("holdout") && !col("x_exact"))
      .select(col("doc_id").as("doc_a"))
    val neard = pairs.where(col("jaccard") >= 0.5)
      .join(exSurvivors, Seq("doc_a"), "left_semi")
      .where(pmod(col("doc_b"), lit(ContamBothEvalMod)) =!= 0)
      .select(col("doc_b").as("doc_id")).distinct()
    val lexd = lexHits.where(col("contam_ratio") >= PipelineLexTau)
      .select("doc_id")
    val gok = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"),
        (col("ok_len") && col("ok_wordlen") && col("ok_stopword") &&
          col("ok_dup") && col("ok_symbol")).as("gok"))
    val v = flagged
      .join(neard.withColumn("__near", lit(true)), Seq("doc_id"), "left")
      .join(lexd.withColumn("__lex", lit(true)), Seq("doc_id"), "left")
      .join(semFlagged.withColumn("__sem", lit(true)), Seq("doc_id"), "left")
      .join(gok, Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("holdout"), col("x_exact"),
        coalesce(col("__near"), lit(false)).as("x_near"),
        coalesce(col("__lex"), lit(false)).as("x_lex"),
        coalesce(col("__sem"), lit(false)).as("x_sem"),
        col("gok"))
    val surv = v.where(!col("holdout") && !col("x_exact") && !col("x_near") &&
      !col("x_lex") && !col("x_sem") && col("gok"))
    // taDomainCap's coin discipline over the survivor set; rank is kept
    // for ALL survivors (beyond-quota rows need their attribution), so
    // this is the plain window, not the top-Q group-limit prune — the
    // partition is post-pipeline survivors per domain, already bounded
    val coin = md5(concat(lit("graft-domcap-1|"), col("doc_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(coin, col("doc_id"))
    val capped = surv.select(col("doc_id"), row_number().over(w).as("qrank"))
    v.join(capped, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("holdout"), "holdout")
          .when(col("x_exact"), "exact")
          .when(col("x_near"), "near_dup")
          .when(col("x_lex"), "contam_lex")
          .when(col("x_sem"), "contam_sem")
          .when(!col("gok"), "gopher")
          .when(col("qrank") > quota, "domain_cap")
          .otherwise("kept").as("stage"))
      .withColumn("kept", col("stage") === "kept")
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_pipeline_manifest" -> (ddPipelineManifest _),
    "dd_contam_embed" -> (ddContamEmbed _),
    "dd_contam_both" -> (ddContamBoth _),
    "dd_keep_best" -> (ddKeepBest _),
    "dd_manifest" -> (ddManifest _),
    "dd_split" -> (ddSplit _),
    "dd_contam" -> (ddContam _),
    "dd_cluster" -> (ddCluster _),
    "dd_cluster_chain" -> (ddClusterChain _),
    "dd_exact" -> (ddExact _),
    "dd_incremental" -> (ddIncremental _),
    "dd_minhash_lsh" -> (ddMinhashLsh _),
    "dd_simhash" -> (ddSimhash _),
    "dd_ngram_jaccard" -> (ddNgramJaccard _),
    "dd_embed_near" -> (ddEmbedNear _),
    "dd_embed_lsh" -> (ddEmbedLsh _),
    "dd_semdedup" -> (ddSemdedup _),
    "dd_semdedup_sampled" -> (ddSemdedupSampled _),
    "dd_semdedup_capped" -> (ddSemdedupCapped _),
    "dd_dup_spans" -> (ddDupSpans _),
    "dd_dup_span_extents" -> (ddDupSpanExtents _),
    "dd_span_cut" -> (ddSpanCut _),
    "dd_pagerank" -> (ddPagerank _),
    "dd_bloom_gate" -> (ddBloomGate _),
    "dd_containment" -> (ddContainment _),
  )

  // ---- oracle SQL (DuckDB) ----

  private val shingleCte =
    """WITH w AS (
      |  SELECT doc_id, lang, list_filter(string_split(text, ' '), t -> t <> '') AS w
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN len(w) >= 3
      |         THEN list_transform(range(1, len(w) - 1),
      |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |         ELSE [array_to_string(w, ' ')] END AS sh
      |  FROM w
      |)""".stripMargin

  private val simhashSums = (0 until 16).map(i =>
    s"sum(CASE WHEN substr(h, ${i + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s$i")
    .mkString(",\n    ")
  private val simhashBits = (0 until 16).map(i =>
    s"CASE WHEN s$i >= 0 THEN ${1 << i} ELSE 0 END").mkString(" + ")

  /** dot(embedding, hyperplane(bit)) with the ±1 weights inlined as a
    * SQL list literal — the exact constants the Spark plan uses.
    */
  private def hpDotSql(bit: Int): String = {
    val w = (0 until EmbedDims)
      .map(d => if (hpWeight(bit, d) > 0) "1" else "-1").mkString("[", ",", "]")
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${EmbedDims + 1}), " +
      s"i -> embedding[i]::DOUBLE * ($w)[i])), (x, y) -> x + y)"
  }
  // variadic concat, not a `||` chain: 192 nested binary concats blow
  // DuckDB's binder recursion limit (max 128)
  private val lshSigSql = (0 until LshBits)
    .map(b => s"(CASE WHEN ${hpDotSql(b)} >= 0 THEN '+' ELSE '-' END)")
    .mkString("concat(", ",\n    ", ")")
  private val lshBandSelects = (0 until LshBands).map(b =>
    s"SELECT vec_id, $b AS band_idx, substr(sig, ${b * LshRowsPerBand + 1}, $LshRowsPerBand) AS band_val FROM sig")
    .mkString("\n  UNION ALL\n  ")
  private def embDotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"

  /** The SemDeDup replay, parameterized on the centroid table — shared
    * by the full- and sampled-training twins. Replays the FULL pipeline
    * over the centroids the engine trained and persisted: argmin-cell
    * assignment (identical ‖v‖²−2v·c+‖c‖² double arithmetic, lowest-cid
    * ties — same replay as sim_kmeans_ivf), within-cell rounded-cosine
    * pairs, and the lower-id-neighbor drop set (see ddSemdedup).
    */
  private def semdedupOracleSqlFor(centDir: String,
      cellCap: Option[Int] = None): String = {
    val sharedHead =
      s"""WITH cent AS (
         |  SELECT cid, centroid
         |  FROM read_parquet('$centDir/*.parquet')),
         |d AS (
         |  SELECT e.vec_id, e.embedding, cent.cid,
         |    ${embDotSql("embedding", "embedding")}
         |      - 2.0 * ${embDotSql("embedding", "centroid")}
         |      + ${embDotSql("centroid", "centroid")} AS d2
         |  FROM embeddings e CROSS JOIN cent),
         |rk AS (
         |  SELECT vec_id, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS crank
         |  FROM d),
         |asg0 AS (SELECT cid AS cell, vec_id, embedding FROM rk WHERE crank = 1)"""
        .stripMargin
    cellCap match {
      case None =>
        s"""$sharedHead,
           |p AS (
           |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |    round(${embDotSql("a.embedding", "b.embedding")}
           |      / (sqrt(${embDotSql("a.embedding", "a.embedding")})
           |        * sqrt(${embDotSql("b.embedding", "b.embedding")})), 6) AS cosine
           |  FROM asg0 a JOIN asg0 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
           |dropped AS (
           |  SELECT DISTINCT vec_b AS vec_id FROM p WHERE cosine >= $SemdedupThreshold)
           |SELECT asg0.vec_id, asg0.cell, (dropped.vec_id IS NULL) AS kept
           |FROM asg0 LEFT JOIN dropped ON asg0.vec_id = dropped.vec_id
           |ORDER BY asg0.vec_id""".stripMargin
      case Some(cap) =>
        // capped twin: replay the per-cell count → block-width ladder,
        // the centroid-cosine core test, the lowest-id core collapse,
        // and the md5-prefix-blocked pair rule — the same integer- and
        // rounding-exact arithmetic the Spark side runs
        val ladder = (1 to SemdedupMaxBlockChars)
          .map(c => s"WHEN cc <= ${cap.toLong * (1L << (4 * c))} THEN $c")
          .mkString(s"CASE WHEN cc <= $cap THEN 0 ", " ",
            s" ELSE $SemdedupMaxBlockChars END")
        s"""$sharedHead,
           |cnt AS (SELECT cell, count(*) AS cc FROM asg0 GROUP BY cell),
           |lbl AS (
           |  SELECT a.cell, a.vec_id, a.embedding, cc,
           |    (cc > $cap AND round(${embDotSql("a.embedding", "cent.centroid")}
           |      / (sqrt(${embDotSql("a.embedding", "a.embedding")})
           |        * sqrt(${embDotSql("cent.centroid", "cent.centroid")})), 6)
           |      >= $SemdedupCoreTau) AS is_core,
           |    ($ladder) AS chars
           |  FROM asg0 a JOIN cnt USING (cell) JOIN cent ON cent.cid = a.cell),
           |keyed AS (
           |  SELECT cell, vec_id, embedding, is_core,
           |    CASE WHEN is_core THEN 'core'
           |      ELSE substr(md5('graft-semdedup-block|' ||
           |        CAST(vec_id AS VARCHAR)), 1, chars) END AS subcell
           |  FROM lbl),
           |cmin AS (
           |  SELECT cell, min(vec_id) AS cmin FROM keyed WHERE is_core GROUP BY cell),
           |cdrop AS (
           |  SELECT k.vec_id FROM keyed k JOIN cmin USING (cell)
           |  WHERE k.is_core AND k.vec_id > cmin),
           |p AS (
           |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |    round(${embDotSql("a.embedding", "b.embedding")}
           |      / (sqrt(${embDotSql("a.embedding", "a.embedding")})
           |        * sqrt(${embDotSql("b.embedding", "b.embedding")})), 6) AS cosine
           |  FROM keyed a JOIN keyed b
           |    ON a.cell = b.cell AND a.subcell = b.subcell
           |   AND a.vec_id < b.vec_id
           |  WHERE NOT a.is_core AND NOT b.is_core),
           |dropped AS (
           |  SELECT DISTINCT vec_id FROM (
           |    SELECT vec_b AS vec_id FROM p WHERE cosine >= $SemdedupThreshold
           |    UNION ALL SELECT vec_id FROM cdrop))
           |SELECT keyed.vec_id, keyed.cell, keyed.subcell,
           |  (dropped.vec_id IS NULL) AS kept
           |FROM keyed LEFT JOIN dropped ON keyed.vec_id = dropped.vec_id
           |ORDER BY keyed.vec_id""".stripMargin
    }
  }

  private val minhashSelect = (0 until NumHashes).map { k =>
    val m = k / 4
    s"min(substr(md5('$m|' || sng), ${(k % 4) * 8 + 1}, 8)) AS mh$k"
  }.mkString(",\n    ")
  private val bandSelects = (0 until Bands).map { b =>
    val bandVal = (0 until BandRows).map(r => s"mh${BandRows * b + r}").mkString(" || ")
    s"SELECT doc_id, $b AS band_idx, $bandVal AS band_val FROM sig"
  }.mkString("\n  UNION ALL\n  ")

  /** The full minhash pair derivation — shared verbatim by the
    * dd_minhash_lsh oracle and (as a wrapped derived table) the
    * dd_cluster oracle, so the cluster gate replays the exact pair set
    * the Spark side clusters.
    */
  /** Shared head of the dd_cluster / dd_keep_best oracles: the verified
    * minhash pairs at J ≥ 0.5, closed transitively (recursive CTE),
    * ending in `c(doc_id, cluster_id)`.
    */
  private lazy val clusterCte: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    $minhashOracleSql
       |  ) WHERE jaccard >= 0.5
       |), e AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs
       |), reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
       |), c AS (
       |  SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
       |  FROM reach GROUP BY a
       |)""".stripMargin

  /** The shingle → minhash → band CTE chain ending in
    * `bands(doc_id, band_idx, band_val)` — the replay of [[bandsOf]]
    * over [[shingleDocs]], shared with the streaming-admission oracle
    * (st_lsh_dedup) so both gates replay the identical banding
    * arithmetic.
    */
  private[graft] lazy val bandsOracleCte: String =
    s"""$shingleCte, hashed AS (
       |  SELECT doc_id, unnest(sh) AS sng FROM s
       |), mins AS (
       |  SELECT doc_id,
       |    $minhashSelect
       |  FROM hashed GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, ${(0 until NumHashes).map(k => s"mh$k").mkString(", ")}
       |  FROM mins
       |), bands AS (
       |  $bandSelects
       |)""".stripMargin

  private lazy val minhashOracleSql: String =
    s"""$shingleCte, hashed AS (
         |  SELECT doc_id, unnest(sh) AS sng FROM s
         |), mins AS (
         |  SELECT doc_id,
         |    $minhashSelect
         |  FROM hashed GROUP BY doc_id
         |), sig AS (
         |  SELECT s.doc_id, s.sh, ${(0 until NumHashes).map(k => s"mins.mh$k").mkString(", ")}
         |  FROM s JOIN mins ON s.doc_id = mins.doc_id
         |), bands AS (
         |  $bandSelects
         |), okb AS (
         |  SELECT band_idx, band_val FROM bands
         |  GROUP BY band_idx, band_val HAVING count(*) <= $BandCap
         |), kband AS (
         |  SELECT b.doc_id, b.band_idx, b.band_val
         |  FROM bands b JOIN okb USING (band_idx, band_val)
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM kband x JOIN kband y
         |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         |   AND x.doc_id < y.doc_id
         |)
         |SELECT doc_a, doc_b,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS INTEGER) AS n_common,
         |  CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS INTEGER) AS n_union,
         |  round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
         |    / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
         |FROM cand
         |JOIN sig sa ON sa.doc_id = doc_a
         |JOIN sig sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin

  /** The [[ddPipelineManifest]] replay — each stage's existing oracle
    * derivation (shingle screen, embed screen, gopher rules, exact
    * fingerprint, the FULL minhash pair derivation as a nested
    * subquery) composed with the same first-drop-wins CASE the Spark
    * side runs, and the domain-cap rank computed over the SQL-derived
    * survivor set.
    */
  /** The SCREEN-stage CTE fragments shared by the batch pipeline
    * manifest and the streaming `st_pipeline` oracle: the lexical
    * eval-shingle screen (→ `lexd`: train docs whose overlap ratio
    * clears [[PipelineLexTau]]), the semantic eval-cosine screen
    * (→ `semd`), the gopher rules (→ `gq(doc_id, gok)`), and the
    * train-side exact fingerprints (→ `fpt(doc_id, f)`). Assumes the
    * shingle CTEs (`w`, `s`) precede it in the WITH chain.
    */
  private[graft] lazy val pipelineScreenCtes: String = {
    val stop = TextAnalysis.GopherStopwords.map(w => s"'$w'").mkString(", ")
    s"""t AS (
       |  SELECT DISTINCT unnest(list_distinct(sh)) AS shingle
       |  FROM s WHERE doc_id % $ContamBothEvalMod = 0
       |), tr AS (
       |  SELECT doc_id, list_distinct(sh) AS shd
       |  FROM s WHERE doc_id % $ContamBothEvalMod <> 0
       |), p AS (
       |  SELECT doc_id, unnest(shd) AS shingle FROM tr
       |), h AS (
       |  SELECT p.doc_id, count(*) AS n_hit
       |  FROM p JOIN t USING (shingle) GROUP BY p.doc_id
       |), lexd AS (
       |  SELECT h.doc_id FROM h JOIN tr ON tr.doc_id = h.doc_id
       |  WHERE round(h.n_hit::DOUBLE / len(tr.shd), 6) >= $PipelineLexTau
       |), e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${embDotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings
       |), ev AS (
       |  SELECT vec_id AS eval_id, embedding AS eemb, nrm AS enrm
       |  FROM e WHERE vec_id % $ContamBothEvalMod = 0
       |), ce AS (
       |  SELECT vec_id, embedding, nrm FROM e
       |  WHERE vec_id % $ContamBothEvalMod <> 0
       |), pe AS (
       |  SELECT ce.vec_id,
       |    round(${embDotSql("ce.embedding", "ev.eemb")}
       |      / (ce.nrm * ev.enrm), 6) AS cosine
       |  FROM ce, ev
       |), semd AS (
       |  SELECT DISTINCT vec_id AS doc_id FROM pe
       |  WHERE cosine >= $ContamEmbedTau
       |), gt AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w,
       |    length(replace(text, ' ', '')) AS n_letters
       |  FROM documents
       |), gq AS (
       |  SELECT doc_id,
       |    ((len(w) BETWEEN ${TextAnalysis.GopherMinTokens}
       |        AND ${TextAnalysis.GopherMaxTokens})
       |     AND (len(w) > 0
       |        AND n_letters::DOUBLE / len(w) >= ${TextAnalysis.GopherMinWordLen}
       |        AND n_letters::DOUBLE / len(w) <= ${TextAnalysis.GopherMaxWordLen})
       |     AND (len(list_filter(w, x -> x IN ($stop)))
       |        >= ${TextAnalysis.GopherMinStopHits})
       |     AND (len(w) - len(list_distinct(w))
       |        <= ${TextAnalysis.GopherMaxDupRatio} * len(w))
       |     AND (len(list_filter(w, x -> regexp_matches(x, '[^a-z0-9]')))
       |        <= ${TextAnalysis.GopherMaxSymbolRatio} * len(w))) AS gok
       |  FROM gt
       |), fpt AS (
       |  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
       |  FROM documents WHERE doc_id % $ContamBothEvalMod <> 0
       |)""".stripMargin
  }

  private lazy val pipelineManifestOracle: String = {
    s"""$shingleCte, $pipelineScreenCtes, exd AS (
       |  SELECT DISTINCT a.doc_id FROM fpt a
       |  JOIN fpt b ON a.f = b.f AND b.doc_id < a.doc_id
       |), prs AS (
       |  SELECT doc_a, doc_b FROM (
       |    $minhashOracleSql
       |  ) WHERE jaccard >= 0.5
       |), neard AS (
       |  SELECT DISTINCT prs.doc_b AS doc_id FROM prs
       |  WHERE prs.doc_a % $ContamBothEvalMod <> 0
       |    AND prs.doc_b % $ContamBothEvalMod <> 0
       |    AND prs.doc_a NOT IN (SELECT doc_id FROM exd)
       |), v AS (
       |  SELECT d.doc_id, d.source,
       |    d.doc_id % $ContamBothEvalMod = 0 AS holdout,
       |    d.doc_id IN (SELECT doc_id FROM exd) AS x_exact,
       |    d.doc_id IN (SELECT doc_id FROM neard) AS x_near,
       |    d.doc_id IN (SELECT doc_id FROM lexd) AS x_lex,
       |    d.doc_id IN (SELECT doc_id FROM semd) AS x_sem,
       |    gq.gok AS gok
       |  FROM documents d JOIN gq USING (doc_id)
       |), surv AS (
       |  SELECT doc_id, source FROM v
       |  WHERE NOT holdout AND NOT x_exact AND NOT x_near
       |    AND NOT x_lex AND NOT x_sem AND gok
       |), capped AS (
       |  SELECT doc_id, row_number() OVER (PARTITION BY source
       |    ORDER BY md5('graft-domcap-1|' || CAST(doc_id AS VARCHAR)),
       |      doc_id) AS qrank
       |  FROM surv
       |), m AS (
       |  SELECT v.doc_id, v.source,
       |    CASE WHEN holdout THEN 'holdout'
       |         WHEN x_exact THEN 'exact'
       |         WHEN x_near THEN 'near_dup'
       |         WHEN x_lex THEN 'contam_lex'
       |         WHEN x_sem THEN 'contam_sem'
       |         WHEN NOT gok THEN 'gopher'
       |         WHEN qrank > $PipelineDomainQuota THEN 'domain_cap'
       |         ELSE 'kept' END AS stage
       |  FROM v LEFT JOIN capped USING (doc_id)
       |)
       |SELECT doc_id, source, stage, stage = 'kept' AS kept
       |FROM m ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dd_pipeline_manifest" -> pipelineManifestOracle,
    // same shingle staging; test side deduped to a distinct-shingle set
    // so each train posting contributes at most one hit
    "dd_contam" ->
      s"""$shingleCte, t AS (
         |  SELECT DISTINCT unnest(list_distinct(sh)) AS shingle
         |  FROM s WHERE doc_id % 10 = 0
         |), tr AS (
         |  SELECT doc_id, list_distinct(sh) AS shd FROM s WHERE doc_id % 10 <> 0
         |), p AS (
         |  SELECT doc_id, unnest(shd) AS shingle FROM tr
         |), h AS (
         |  SELECT p.doc_id, count(*) AS n_hit
         |  FROM p JOIN t USING (shingle) GROUP BY p.doc_id
         |)
         |SELECT h.doc_id, CAST(h.n_hit AS INTEGER) AS n_hit,
         |  CAST(len(tr.shd) AS INTEGER) AS n_sh,
         |  round(h.n_hit::DOUBLE / len(tr.shd), 6) AS contam_ratio
         |FROM h JOIN tr ON tr.doc_id = h.doc_id
         |ORDER BY h.doc_id""".stripMargin,
    // the semantic screen: same per-side norms + canonical double fold
    // as dd_embed_near, cross-set; best neighbor = highest rounded
    // cosine, ties to lowest eval_id (the struct-max's (cosine,
    // −eval_id) ordering, replayed as a window rank)
    "dd_contam_embed" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${embDotSql("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |), ev AS (
         |  SELECT vec_id AS eval_id, embedding AS eemb, nrm AS enrm
         |  FROM e WHERE vec_id % $ContamEmbedEvalMod = 0
         |), c AS (
         |  SELECT vec_id, embedding, nrm
         |  FROM e WHERE vec_id % $ContamEmbedEvalMod <> 0
         |), p AS (
         |  SELECT c.vec_id, ev.eval_id,
         |    round(${embDotSql("c.embedding", "ev.eemb")}
         |      / (c.nrm * ev.enrm), 6) AS cosine
         |  FROM c, ev
         |), h AS (
         |  SELECT vec_id, eval_id, cosine FROM p WHERE cosine >= $ContamEmbedTau
         |), r AS (
         |  SELECT vec_id, eval_id, cosine,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cosine DESC, eval_id) AS rn,
         |    count(*) OVER (PARTITION BY vec_id) AS n_hits
         |  FROM h)
         |SELECT vec_id, eval_id, cosine, CAST(n_hits AS INTEGER) AS n_hits
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // the composed manifest: BOTH screens' chains verbatim (lexical at
    // its own mod, semantic re-pointed at the SAME held-out rule),
    // full-outer on doc_id with sentinel fills — a doc flagged by one
    // screen but missing from the union, a wrong attribution boolean,
    // or a drifted sentinel all hash-fail
    "dd_contam_both" ->
      s"""$shingleCte, t AS (
         |  SELECT DISTINCT unnest(list_distinct(sh)) AS shingle
         |  FROM s WHERE doc_id % $ContamBothEvalMod = 0
         |), tr AS (
         |  SELECT doc_id, list_distinct(sh) AS shd
         |  FROM s WHERE doc_id % $ContamBothEvalMod <> 0
         |), p AS (
         |  SELECT doc_id, unnest(shd) AS shingle FROM tr
         |), h AS (
         |  SELECT p.doc_id, count(*) AS n_hit
         |  FROM p JOIN t USING (shingle) GROUP BY p.doc_id
         |), lex AS (
         |  SELECT h.doc_id, CAST(h.n_hit AS INTEGER) AS n_lex_hits,
         |    round(h.n_hit::DOUBLE / len(tr.shd), 6) AS lex_ratio
         |  FROM h JOIN tr ON tr.doc_id = h.doc_id
         |), e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${embDotSql("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |), ev AS (
         |  SELECT vec_id AS eval_id, embedding AS eemb, nrm AS enrm
         |  FROM e WHERE vec_id % $ContamBothEvalMod = 0
         |), ce AS (
         |  SELECT vec_id, embedding, nrm
         |  FROM e WHERE vec_id % $ContamBothEvalMod <> 0
         |), pe AS (
         |  SELECT ce.vec_id, ev.eval_id,
         |    round(${embDotSql("ce.embedding", "ev.eemb")}
         |      / (ce.nrm * ev.enrm), 6) AS cosine
         |  FROM ce, ev
         |), he AS (
         |  SELECT vec_id, eval_id, cosine FROM pe WHERE cosine >= $ContamEmbedTau
         |), re AS (
         |  SELECT vec_id, eval_id, cosine,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cosine DESC, eval_id) AS rn,
         |    count(*) OVER (PARTITION BY vec_id) AS n_hits
         |  FROM he
         |), sem AS (
         |  SELECT vec_id AS doc_id, eval_id, cosine,
         |    CAST(n_hits AS INTEGER) AS n_sem_hits
         |  FROM re WHERE rn = 1)
         |SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         |  lex.doc_id IS NOT NULL AS lex_hit,
         |  sem.doc_id IS NOT NULL AS sem_hit,
         |  coalesce(n_lex_hits, 0) AS n_lex_hits,
         |  coalesce(lex_ratio, 0.0) AS lex_ratio,
         |  CAST(coalesce(eval_id, -1) AS BIGINT) AS sem_eval_id,
         |  coalesce(cosine, 0.0) AS sem_cosine,
         |  coalesce(n_sem_hits, 0) AS n_sem_hits
         |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
         |ORDER BY 1""".stripMargin,
    "dd_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY fingerprint ORDER BY fingerprint""".stripMargin,
    "dd_incremental" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM documents)
        |SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS n_in_batch
        |FROM fp
        |WHERE doc_id % 4 = 0
        |  AND fingerprint NOT IN
        |    (SELECT fingerprint FROM fp WHERE doc_id % 4 <> 0)
        |GROUP BY fingerprint ORDER BY fingerprint""".stripMargin,
    // history fingerprints → 256-bit bloom, per-batch-doc gate decision
    // AND exact membership both replayed (is_dup ⇒ bloom_hit is then
    // hash-enforced row by row)
    "dd_bloom_gate" -> {
      val mbit = Sketches.hexIntSql(
        "md5('graft-bloom-' || CAST(i AS VARCHAR) || '|' || fingerprint)", 2)
      s"""WITH f AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
         |  FROM documents),
         |hist AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id % 4 <> 0),
         |bits AS (
         |  SELECT DISTINCT $mbit % ${Sketches.BloomBits} AS bit
         |  FROM hist, range(0, ${Sketches.BloomHashes}) t(i)),
         |batch AS (SELECT doc_id, fingerprint FROM f WHERE doc_id % 4 = 0),
         |pb AS (
         |  SELECT DISTINCT doc_id, $mbit % ${Sketches.BloomBits} AS bit
         |  FROM batch, range(0, ${Sketches.BloomHashes}) t(i)),
         |need AS (SELECT doc_id, count(*) AS need FROM pb GROUP BY doc_id),
         |hit AS (
         |  SELECT pb.doc_id, count(*) AS hits
         |  FROM pb JOIN bits USING (bit) GROUP BY pb.doc_id)
         |SELECT b.doc_id, b.fingerprint,
         |  (coalesce(hit.hits, 0) = need.need) AS bloom_hit,
         |  (h2.fingerprint IS NOT NULL) AS is_dup
         |FROM batch b
         |JOIN need ON b.doc_id = need.doc_id
         |LEFT JOIN hit ON b.doc_id = hit.doc_id
         |LEFT JOIN hist h2 ON b.fingerprint = h2.fingerprint
         |ORDER BY b.doc_id""".stripMargin
    },
    "dd_minhash_lsh" -> minhashOracleSql,
    // the SAME pair derivation, then the three damped rounds unrolled —
    // all floor division on positive int64, so bit-exact cross-engine;
    // DuckDB sum() returns HUGEINT, cast back before the damping
    "dd_pagerank" -> {
      val base = s"(SELECT (($PrScale // n_nodes) * 15) // 100 FROM nn)"
      def round(prev: String, cur: String): String =
        s"""s$cur AS (
           |  SELECT e.a AS doc_id, CAST(sum(p.pr // p.deg) AS BIGINT) AS s
           |  FROM e JOIN pr$prev p ON e.b = p.doc_id GROUP BY e.a
           |), pr$cur AS (
           |  SELECT deg.a AS doc_id, deg.deg,
           |    $base + ($PrDamp * s$cur.s) // 100 AS pr
           |  FROM deg JOIN s$cur ON deg.a = s$cur.doc_id
           |)""".stripMargin
      s"""WITH pairs AS (
         |  SELECT doc_a, doc_b FROM (
         |    $minhashOracleSql
         |  ) WHERE jaccard >= 0.5
         |), e AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs
         |), deg AS (
         |  SELECT a, count(*) AS deg FROM e GROUP BY a
         |), nn AS (SELECT count(*) AS n_nodes FROM deg),
         |pr0 AS (
         |  SELECT a AS doc_id, deg,
         |    (SELECT $PrScale // n_nodes FROM nn) AS pr
         |  FROM deg
         |), ${round("0", "1")},
         |${round("1", "2")},
         |${round("2", "3")}
         |SELECT doc_id, deg, pr FROM pr3 ORDER BY doc_id""".stripMargin
    },
    // transitive closure (recursive CTE) over the SAME pair derivation
    // the Spark side clusters; cluster id = min reachable doc id
    "dd_cluster" ->
      s"""$clusterCte
         |SELECT doc_id, cluster_id FROM c ORDER BY doc_id""".stripMargin,
    // closed-form components of the chain fixture: dense doc_ids make
    // each run-of-32 chain's minimum doc_id - doc_id % 32
    "dd_cluster_chain" ->
      """SELECT doc_id, doc_id - doc_id % 32 AS cluster_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the cluster closure LEFT-joined to the corpus; split decided by
    // the identical hex-coin thresholds on the cluster-canonical key
    "dd_split" ->
      s"""$clusterCte, k AS (
         |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS split_key
         |  FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
         |)
         |SELECT doc_id, split_key,
         |  CASE WHEN substr(md5('graft-split-1|' || CAST(split_key AS VARCHAR)), 1, 4) < 'c000' THEN 'train'
         |       WHEN substr(md5('graft-split-1|' || CAST(split_key AS VARCHAR)), 1, 4) < 'e000' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM k ORDER BY doc_id""".stripMargin,
    // the cluster closure joined to ta_quality's score formula; argmax
    // per cluster on (rounded quality DESC, doc_id)
    "dd_keep_best" ->
      s"""$clusterCte, q AS (
         |  SELECT doc_id,
         |    round(0.5::DOUBLE * least(1.0::DOUBLE, n_tokens::DOUBLE / 50.0::DOUBLE)
         |      + 0.5::DOUBLE * (n_distinct::DOUBLE / n_tokens), 6) AS quality
         |  FROM (
         |    SELECT doc_id,
         |      len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         |      len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_distinct
         |    FROM documents)
         |), j AS (
         |  SELECT c.doc_id, c.cluster_id, q.quality FROM c JOIN q USING (doc_id)
         |), sel AS (
         |  SELECT cluster_id, doc_id, quality,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY quality DESC, doc_id) AS rn
         |  FROM j
         |), m AS (
         |  SELECT cluster_id, count(*) AS n_members FROM j GROUP BY cluster_id
         |)
         |SELECT s.cluster_id, s.doc_id AS keep_id,
         |  CAST(m.n_members AS INTEGER) AS n_members, s.quality AS best_quality
         |FROM sel s JOIN m USING (cluster_id)
         |WHERE s.rn = 1 ORDER BY s.cluster_id""".stripMargin,
    // the full cascade: the cluster closure + keep-best selection +
    // exact-fingerprint groups + the quality floor, folded into one
    // per-document CASE — same precedence order as the engine
    "dd_manifest" ->
      s"""$clusterCte, q AS (
         |  SELECT doc_id,
         |    round(0.5::DOUBLE * least(1.0::DOUBLE, n_tokens::DOUBLE / 50.0::DOUBLE)
         |      + 0.5::DOUBLE * (n_distinct::DOUBLE / n_tokens), 6) AS quality
         |  FROM (
         |    SELECT doc_id,
         |      len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         |      len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_distinct
         |    FROM documents)
         |), sel AS (
         |  SELECT c.cluster_id, c.doc_id,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY q.quality DESC, c.doc_id) AS rn
         |  FROM c JOIN q USING (doc_id)
         |), kb AS (
         |  SELECT cluster_id, doc_id AS keep_id FROM sel WHERE rn = 1
         |), near AS (
         |  SELECT c.doc_id, kb.keep_id FROM c JOIN kb USING (cluster_id)
         |), fp AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
         |  FROM documents
         |), xk AS (
         |  SELECT fingerprint, min(doc_id) AS xk FROM fp GROUP BY fingerprint
         |), m AS (
         |  SELECT d.doc_id,
         |    (fp.doc_id <> xk.xk) AS exact_drop,
         |    coalesce(near.doc_id <> near.keep_id, false) AS near_drop,
         |    q.quality
         |  FROM documents d
         |  JOIN fp ON fp.doc_id = d.doc_id
         |  JOIN xk ON xk.fingerprint = fp.fingerprint
         |  LEFT JOIN near ON near.doc_id = d.doc_id
         |  JOIN q ON q.doc_id = d.doc_id
         |)
         |SELECT doc_id,
         |  CASE WHEN exact_drop OR near_drop
         |         OR quality < $ManifestQualityFloor THEN 'drop'
         |       ELSE 'keep' END AS decision,
         |  CASE WHEN exact_drop THEN 'exact_dup'
         |       WHEN near_drop THEN 'near_dup'
         |       WHEN quality < $ManifestQualityFloor THEN 'low_quality'
         |       ELSE 'ok' END AS reason,
         |  quality
         |FROM m ORDER BY doc_id""".stripMargin,
    "dd_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
         |  FROM documents
         |), h AS (SELECT doc_id, md5(tok) AS h FROM tok),
         |sums AS (
         |  SELECT doc_id,
         |    $simhashSums
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($simhashBits AS INTEGER) AS simhash16
         |FROM sums ORDER BY doc_id""".stripMargin,
    // Replays the capped-postings formulation exactly: postings index of
    // distinct shingles, hot shingles (> PostingCap docs) dropped, sizes
    // recomputed over kept postings, |A∪B| = na + nb − n_common.
    "dd_ngram_jaccard" ->
      s"""$shingleCte, p AS (
         |  SELECT lang, doc_id, unnest(list_distinct(sh)) AS shingle FROM s
         |), ok AS (
         |  SELECT lang, shingle FROM p
         |  GROUP BY lang, shingle HAVING count(*) <= $PostingCap
         |), kept AS (
         |  SELECT p.lang, p.doc_id, p.shingle FROM p JOIN ok USING (lang, shingle)
         |), sizes AS (
         |  SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id
         |), common AS (
         |  SELECT x.lang AS lang, x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    count(*) AS n_common
         |  FROM kept x JOIN kept y
         |    ON x.lang = y.lang AND x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2, 3
         |)
         |SELECT c.lang, c.doc_a, c.doc_b,
         |  CAST(c.n_common AS INTEGER) AS n_common,
         |  CAST(a.n_sh + b.n_sh - c.n_common AS INTEGER) AS n_union,
         |  round(c.n_common::DOUBLE / (a.n_sh + b.n_sh - c.n_common), 6) AS jaccard
         |FROM common c
         |JOIN sizes a ON a.doc_id = c.doc_a
         |JOIN sizes b ON b.doc_id = c.doc_b
         |WHERE c.n_common * 5 >= a.n_sh + b.n_sh - c.n_common
         |ORDER BY doc_a, doc_b""".stripMargin,
    // same capped-postings CTEs as dd_ngram_jaccard; selection on the
    // smaller side's containment, both directions emitted
    "dd_containment" ->
      s"""$shingleCte, p AS (
         |  SELECT lang, doc_id, unnest(list_distinct(sh)) AS shingle FROM s
         |), ok AS (
         |  SELECT lang, shingle FROM p
         |  GROUP BY lang, shingle HAVING count(*) <= $PostingCap
         |), kept AS (
         |  SELECT p.lang, p.doc_id, p.shingle FROM p JOIN ok USING (lang, shingle)
         |), sizes AS (
         |  SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id
         |), common AS (
         |  SELECT x.lang AS lang, x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    count(*) AS n_common
         |  FROM kept x JOIN kept y
         |    ON x.lang = y.lang AND x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2, 3
         |)
         |SELECT c.lang, c.doc_a, c.doc_b,
         |  CAST(c.n_common AS INTEGER) AS n_common,
         |  CAST(a.n_sh AS INTEGER) AS na, CAST(b.n_sh AS INTEGER) AS nb,
         |  round(c.n_common::DOUBLE / a.n_sh, 6) AS c_ab,
         |  round(c.n_common::DOUBLE / b.n_sh, 6) AS c_ba
         |FROM common c
         |JOIN sizes a ON a.doc_id = c.doc_a
         |JOIN sizes b ON b.doc_id = c.doc_b
         |WHERE c.n_common * 5 >= least(a.n_sh, b.n_sh) * 4
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_embed_near" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
        |p AS (
        |  SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(
        |      list_reduce(list_prepend(0.0::DOUBLE,
        |        list_transform(range(1, len(a.embedding) + 1),
        |          i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)), (x, y) -> x + y)
        |      / (sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |           list_transform(range(1, len(a.embedding) + 1),
        |             i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)), (x, y) -> x + y))
        |        * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |            list_transform(range(1, len(b.embedding) + 1),
        |              i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)), (x, y) -> x + y)))
        |    , 6) AS cosine
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, vec_a, vec_b, cosine FROM p
        |WHERE cosine >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,
    "dd_embed_lsh" ->
      s"""WITH sig AS (
         |  SELECT vec_id,
         |    $lshSigSql AS sig
         |  FROM embeddings
         |), bands AS (
         |  $lshBandSelects
         |), cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM bands x JOIN bands y
         |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         |   AND x.vec_id < y.vec_id
         |), p AS (
         |  SELECT vec_a, vec_b,
         |    round(${embDotSql("a.embedding", "b.embedding")}
         |      / (sqrt(${embDotSql("a.embedding", "a.embedding")})
         |        * sqrt(${embDotSql("b.embedding", "b.embedding")})), 6) AS cosine
         |  FROM cand
         |  JOIN embeddings a ON a.vec_id = vec_a
         |  JOIN embeddings b ON b.vec_id = vec_b)
         |SELECT vec_a, vec_b, cosine FROM p
         |WHERE cosine >= 0.35
         |ORDER BY vec_a, vec_b""".stripMargin,
    // Replays the FULL SemDeDup pipeline over the centroids the engine
    // trained and persisted: argmin-distance cell assignment (identical
    // ‖v‖²−2v·c+‖c‖² double arithmetic, lowest-cid ties — same replay as
    // sim_kmeans_ivf), within-cell rounded-cosine pairs, and the drop
    // set (drop every vector with a lower-id similar same-cell
    // neighbor, dropped or not — see ddSemdedup's Scaladoc).
    "dd_semdedup" -> semdedupOracleSqlFor(SemdedupCentroidDir),
    // Shared verbatim with the full-training twin: past training, the
    // two queries ARE the same query against different model tables.
    "dd_semdedup_sampled" -> semdedupOracleSqlFor(SemdedupSampledCentroidDir),
    "dd_semdedup_capped" -> semdedupOracleSqlFor(SemdedupCappedCentroidDir,
      cellCap = Some(SemdedupCellCap)),
    // k-token windows via range(1, len-(k-2)) -> i = 1..len-k+1, each
    // md5'd; a window is duplicated when its gram occurs in >=2
    // DISTINCT docs (the d CTE collapses within-doc repeats first)
    "dd_dup_spans" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
         |  FROM documents),
         |gr AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(w) - ${DupSpanK - 2}),
         |      i -> md5(array_to_string(w[i:i + ${DupSpanK - 1}], ' ')))) AS gh
         |  FROM w WHERE len(w) >= $DupSpanK),
         |d AS (SELECT DISTINCT doc_id, gh FROM gr),
         |hot AS (SELECT gh FROM d GROUP BY gh HAVING count(*) >= 2)
         |SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(CASE WHEN hot.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_windows,
         |  round(CAST(sum(CASE WHEN hot.gh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS dup_ratio
         |FROM gr LEFT JOIN hot ON gr.gh = hot.gh
         |GROUP BY gr.doc_id
         |ORDER BY gr.doc_id""".stripMargin,
    // Same hot-gram build as dd_dup_spans but with 0-based window
    // positions kept, then the gaps-and-islands merge: consecutive
    // duplicated windows share i − row_number, one extent per island,
    // covering tokens [min(i), max(i) + k − 1]
    "dd_dup_span_extents" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
         |  FROM documents),
         |gr AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS i,
         |    md5(array_to_string(w[i + 1:i + $DupSpanK], ' ')) AS gh
         |  FROM w, LATERAL unnest(range(0, len(w) - ${DupSpanK - 1})) AS u(i)
         |  WHERE len(w) >= $DupSpanK),
         |d AS (SELECT DISTINCT doc_id, gh FROM gr),
         |hot AS (SELECT gh FROM d GROUP BY gh HAVING count(*) >= 2),
         |dup AS (
         |  SELECT gr.doc_id, gr.i,
         |    gr.i - row_number() OVER (PARTITION BY gr.doc_id ORDER BY gr.i) AS island
         |  FROM gr JOIN hot ON gr.gh = hot.gh)
         |SELECT doc_id, CAST(min(i) AS INTEGER) AS start_tok,
         |  CAST(max(i) + ${DupSpanK - 1} AS INTEGER) AS end_tok,
         |  CAST(max(i) + $DupSpanK - min(i) AS BIGINT) AS span_tokens,
         |  CAST(count(*) AS BIGINT) AS n_dup_windows
         |FROM dup GROUP BY doc_id, island
         |ORDER BY doc_id, start_tok""".stripMargin,
    // Same hot-gram build; the cut replays as covered = union of
    // per-start ranges (range() is end-exclusive = Spark's inclusive
    // sequence(j, j+k-1)), kept = 1-based indexed filter against it
    "dd_span_cut" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
         |  FROM documents),
         |gr AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS i,
         |    md5(array_to_string(w[i + 1:i + $DupSpanK], ' ')) AS gh
         |  FROM w, LATERAL unnest(range(0, len(w) - ${DupSpanK - 1})) AS u(i)
         |  WHERE len(w) >= $DupSpanK),
         |d AS (SELECT DISTINCT doc_id, gh FROM gr),
         |hot AS (SELECT gh FROM d GROUP BY gh HAVING count(*) >= 2),
         |starts AS (
         |  SELECT gr.doc_id,
         |    list_distinct(flatten(list_transform(list(gr.i),
         |      j -> range(j, j + $DupSpanK)))) AS covered
         |  FROM gr JOIN hot ON gr.gh = hot.gh GROUP BY gr.doc_id),
         |cut AS (
         |  SELECT w.doc_id, w.w,
         |    CASE WHEN s.covered IS NULL THEN w.w
         |      ELSE list_filter(w.w, (t, ix) ->
         |        NOT list_contains(s.covered, ix - 1)) END AS kept
         |  FROM w LEFT JOIN starts s ON w.doc_id = s.doc_id)
         |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  CAST(len(w) - len(kept) AS BIGINT) AS n_cut,
         |  md5(coalesce(array_to_string(kept, ' '), '')) AS kept_md5
         |FROM cut ORDER BY doc_id""".stripMargin,
  )
}
