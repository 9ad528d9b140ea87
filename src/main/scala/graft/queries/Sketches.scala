package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule

/** Oracle-able sketches — the fixed-state streaming summaries a 100 TB
  * pipeline runs where exact answers stop fitting: heavy hitters via a
  * count–min sketch (Cormode & Muthukrishnan 2005), distinct counting
  * via HyperLogLog registers (Flajolet et al. 2007), and document
  * fingerprinting via winnowing (Schleimer et al. 2003, the MOSS
  * algorithm).
  *
  * Spark's own sketches (approx_count_distinct's HLL++, the KLL/GK
  * percentile summaries — pinned by ApproxAggSpec) are engine-internal
  * and can't be replayed by another engine. These three use md5-derived
  * hashes and integer register state, so the ENTIRE sketch — every
  * bucket count, every register, every selected fingerprint — goes
  * under the driver's DuckDB hash gate. Estimator floating point is
  * confined to one literal-constant division (HLL) or avoided entirely
  * (CMS, winnowing), keeping the gate engine-exact.
  *
  * 100 TB shape, all three: per-row expression work folded into the
  * scan, then ONE aggregate whose state is constant-size (d×w counters,
  * m registers) or per-doc-bounded (winnow fingerprints) — mergeable
  * partials, one exchange, no corpus sort, no pair join.
  */
object Sketches extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables(s, dir).documents

  private def toks: Column =
    filter(graft.functions.ByteSplit.split(col("text")), t => t =!= "")

  /** DuckDB replay of Spark's `conv(hex, 16, 10)`: per-digit strpos
    * fold (DuckDB has no conv()); each term cast BIGINT before the
    * place-value multiply so 8-digit values never overflow INT32.
    */
  private[graft] def hexIntSql(hexExpr: String, nDigits: Int): String =
    (0 until nDigits).map { i =>
      val mult = BigInt(16).pow(nDigits - 1 - i)
      val digit =
        s"(strpos('0123456789abcdef', substr($hexExpr, ${i + 1}, 1)) - 1)::BIGINT"
      if (mult == 1) digit else s"$digit * $mult"
    }.mkString("(", " + ", ")")

  // ---- count–min sketch heavy hitters ----------------------------------

  /** Sketch geometry: d independent rows × w counters. Production sizing
    * is w = ⌈e/ε⌉ for additive error ε·N (ε = 2% → w = 136) and
    * d = ⌈ln 1/δ⌉; the gate's 4×64 keeps every cell exercised by the
    * ~31-token corpus vocabulary while the arithmetic stays
    * width-agnostic (widen `CmsWidth`, nothing else changes).
    */
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 64L
  private[graft] val CmsTopK = 20

  /** Row-d bucket of a token: first 2 hex digits of the salted md5,
    * mod w — one independent hash function per sketch row.
    */
  private[graft] def cmsBucket(d: Column, tok: Column): Column =
    conv(substring(md5(concat(lit("graft-cms-"), d.cast("string"), lit("|"),
      tok)), 1, 2), 16, 10).cast("long") % CmsWidth

  /** Heavy hitters by count–min estimate: build the d×w sketch, then
    * read every vocabulary token's estimate (min over its d counters)
    * next to its exact count — the CMS guarantee est ≥ exact is thus
    * itself under the gate, row by row.
    *
    * Plan: one wc-shaped corpus aggregate to the vocabulary (the only
    * corpus-scale exchange — the sketch is built from WEIGHTED vocab
    * counts, never by exploding the corpus ×d), a 256-cell sketch
    * aggregate, a broadcast probe join, and a TakeOrdered top-k. At
    * 100 TB the sketch build is the point: d×w counters of mergeable
    * partial state replace the unbounded exact-count hash table when
    * the vocabulary itself stops fitting (URLs, n-grams); the exact
    * column here is the gate's ground truth, affordable because the
    * gate vocabulary is finite.
    */
  def taHeavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHittersCore(docs(s, dir))

  /** The sketch + probe over any (text) frame, for SketchesSpec's
    * independent JVM replay.
    */
  private[graft] def heavyHittersCore(d: DataFrame): DataFrame = {
    val counts = d
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("exact"))
    val rows = counts.select(col("tok"), col("exact"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("d"))
      .withColumn("bucket", cmsBucket(col("d"), col("tok")))
    val sketch = rows.groupBy("d", "bucket").agg(sum("exact").as("c"))
    rows.join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy("tok", "exact").agg(min("c").as("est"))
      .select(col("tok").as("token"), col("est"), col("exact"))
      .orderBy(desc("est"), asc("token")).limit(CmsTopK)
  }

  // ---- HyperLogLog distinct counting -----------------------------------

  /** m = 256 registers (b = 8 bucket bits = the md5's first 2 hex
    * digits); rank ρ comes from the next 32 hash bits. Raw-estimator
    * regime needs n ≳ 2.5 m — per-source 3-gram shingles (~1.2–1.5 k
    * distinct at sf0.01) sit comfortably above it, so the oracled
    * estimate is the honest uncorrected formula. (The small-range
    * linear-counting correction needs libm ln — the cross-engine
    * hazard this repo's oracle contract bans — so it is pinned by
    * SketchesSpec from the oracled `n_registers` instead.)
    */
  private[graft] val HllBuckets = 256

  /** α₂₅₆ · m² · 2³³ — the raw-estimator numerator, pre-multiplied so
    * each engine performs exactly ONE floating operation (this literal
    * divided by the exact integer Z·2³³); Double.toString round-trips,
    * so the interpolated SQL literal is the bit-identical double.
    */
  private[graft] val HllNumer: Double =
    0.7213 / (1 + 1.079 / HllBuckets) * 65536.0 * 8589934592.0

  /** ρ(v): leading-zero count + 1 of the 32-bit hash suffix, via the
    * same bitlen-by-bin() integer trick ta_ppl_bucket pinned (no libm).
    */
  private def rho(v: Column): Column =
    when(v === 0, lit(33)).otherwise(lit(33) - length(bin(v)))

  /** Distinct 3-gram shingles per source: exact count next to the full
    * HLL register state — register count, the exact scaled harmonic
    * sum Z·2³³ (empty registers contribute 2³³, register M contributes
    * 2^(33−M): all integers), and the floor of the raw estimate.
    *
    * Plan: shingling fused in-row (word_shingles), one (source, bucket)
    * aggregate to the ≤ m-row register table, one tiny per-source
    * rollup. At 100 TB only the register aggregate survives (the exact
    * count is the gate's ground truth); its state is m integers per
    * source and registers are max-mergeable — the property that lets a
    * 1000-executor scan emit 256-byte partials instead of shuffling
    * shingles. Mergeability itself is spec-asserted (union of two
    * sources' registers = registers of the union).
    */
  def taHllDistinct(s: SparkSession, dir: String): DataFrame = {
    val sh = docs(s, dir).select(col("source"),
      explode(graft.functions.WordShingles.of(col("text"))).as("sh"))
    val sums = hllSummary(hllRegisters(sh))
    val exact = sh.groupBy("source").agg(countDistinct("sh").as("exact"))
    sums.join(exact, "source")
      .select(col("source"), col("n_registers"), col("s_scaled"), col("est"),
        col("exact"))
      .orderBy("source")
  }

  /** The (source, bucket, m) register table of any (source, sh) frame —
    * the sketch's ENTIRE state, exposed so SketchesSpec can assert
    * max-mergeability (union registers = max of per-source registers).
    */
  private[graft] def hllRegisters(sh: DataFrame): DataFrame =
    sh.withColumn("h", md5(concat(lit("graft-hll|"), col("sh"))))
      .select(col("source"),
        conv(substring(col("h"), 1, 2), 16, 10).cast("int").as("bucket"),
        conv(substring(col("h"), 3, 8), 16, 10).cast("long").as("v"))
      .withColumn("rho", rho(col("v")))
      .groupBy("source", "bucket").agg(max("rho").as("m"))

  /** Registers → (n_registers, exact scaled harmonic sum, raw estimate). */
  private[graft] def hllSummary(regs: DataFrame): DataFrame =
    regs.groupBy("source").agg(
        count(lit(1)).as("n_registers"),
        sum(expr("shiftleft(cast(1 as bigint), 33 - m)")).as("t"))
      .withColumn("s_scaled",
        (lit(HllBuckets.toLong) - col("n_registers")) * lit(8589934592L) +
          col("t"))
      .withColumn("est", floor(lit(HllNumer) / col("s_scaled")).cast("long"))

  // ---- winnowing fingerprints ------------------------------------------

  /** Window width over the gram-hash sequence: every window of
    * `WinnowWindow` consecutive hashes contributes its rightmost
    * minimum, giving the Schleimer guarantee — any shared run of
    * k + w − 1 = 6 tokens produces at least one shared fingerprint.
    */
  private[graft] val WinnowWindow = 4

  /** Per-doc winnowing fingerprint set: 3-gram hashes (the shared
    * word_shingles kernel salted + truncated to 32 bits), then each
    * width-4 window selects its RIGHTMOST minimal hash (the MOSS tie
    * rule); the deduplicated, position-sorted `pos:hash` list is the
    * document's fingerprint.
    *
    * Everything is in-row array work over the gram sequence — shingle,
    * hash, window-argmin, dedup, join — zero explode, zero shuffle
    * except the output sort, so fingerprinting runs at scan speed and
    * the downstream near-dup candidate join (shared fingerprint ⇒
    * candidate pair, the same shape as dd_ngram_jaccard's postings)
    * sees ~2/(w+1) of the gram volume. Docs shorter than one window
    * winnow their full hash list (one window = the whole sequence);
    * word_shingles' <3-token rule (one whole-text gram) carries
    * through unchanged.
    *
    * The rightmost-minimum is located without a fold: with L = |sub|,
    * rightmost index of min(sub) = L − position(reverse(sub), min) + 1
    * — the identical reverse + first-position algebra in both engines.
    */
  def taWinnow(s: SparkSession, dir: String): DataFrame =
    winnowCore(docs(s, dir))

  /** The winnowing selection over any (doc_id, text) frame:
    * (doc_id, hs = gram hashes, nh, sel = selected positions), all
    * in-row — shared by [[winnowCore]] (the fingerprint manifest) and
    * [[ddWinnowPairs]] (the blocking join built on it).
    */
  private[graft] def winnowSelected(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        // fused gram-hash kernel: one byte pass + one md5 per gram —
        // replaces word_shingles → per-gram concat/md5/substring/conv
        // (five allocations and a hex reparse per gram). Bit-identical
        // (WinnowKernelSpec fuzz vs the staged builtin form).
        graft.functions.WinnowHashes.of(col("text")).as("hs"))
      .withColumn("nh", size(col("hs")))
      // in-place rightmost-min window selection — replaces the
      // slice+reverse+array_min+array_position transform (two array
      // copies per window). Bit-identical (WinnowKernelSpec).
      .withColumn("sel",
        graft.functions.WinnowSelect.of(col("hs"), WinnowWindow))

  /** Winnowing over any (doc_id, text) frame, for SketchesSpec's
    * crafted-fixture guarantee checks.
    */
  private[graft] def winnowCore(d: DataFrame): DataFrame = {
    winnowSelected(d).select(col("doc_id"),
      col("nh").as("n_grams"),
      size(col("sel")).as("n_selected"),
      array_join(transform(col("sel"), p =>
        concat(p.cast("string"), lit(":"),
          element_at(col("hs"), p.cast("int")).cast("string"))), ",").as("fp"))
      .orderBy("doc_id")
  }

  // ---- winnowing as a blocking scheme ----------------------------------

  /** Hot-fingerprint guard, same class as dd_ngram_jaccard's
    * PostingCap: a fingerprint shared by more than this many docs is
    * boilerplate (the corpus's ubiquitous grams) and is dropped from
    * the index — one hot gram must never cost k² join rows.
    */
  private[graft] val WinnowPostingCap = 16

  /** Candidate pairs must share at least this many kept fingerprints. */
  private[graft] val WinnowMinShared = 2

  /** Winnowing's actual production role (Schleimer §1: MOSS indexes the
    * SELECTED hashes, not all grams): near-dup candidate generation
    * from the fingerprint index. Per doc the distinct selected hashes
    * (≈ 2/(w+1) of the gram volume — the whole point vs. indexing
    * every shingle as dd_ngram_jaccard's postings do), then the
    * standard capped inverted-index self-join: postings capped at
    * [[WinnowPostingCap]] docs, pairs keyed doc_a < doc_b, kept at
    * ≥ [[WinnowMinShared]] shared fingerprints.
    *
    * 100 TB shape: identical to the proven n-gram postings path
    * (candidate volume O(n·cap), never quadratic; the cap is part of
    * the oracle), with the index ~60 % smaller for w = 4. Verification
    * (exact Jaccard on candidates) composes downstream exactly as in
    * dd_ngram_jaccard.
    */
  def ddWinnowPairs(s: SparkSession, dir: String): DataFrame =
    winnowPairsCore(docs(s, dir))

  /** The capped fingerprint-index pair join over any (doc_id, text)
    * frame, for SketchesSpec's shared-run and hot-cap fixtures.
    */
  private[graft] def winnowPairsCore(d: DataFrame): DataFrame = {
    val fp = winnowSelected(d.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(array_distinct(transform(col("sel"),
        p => element_at(col("hs"), p.cast("int"))))).as("fh"))
    val ok = fp.groupBy("fh").agg(count(lit(1)).as("nd"))
      .where(col("nd") <= WinnowPostingCap)
      .select("fh")
    val kept = fp.join(ok, "fh")
    kept.as("a").join(kept.as("b"),
        col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= WinnowMinShared)
      .orderBy("doc_a", "doc_b")
  }

  // ---- Bloom filter ----------------------------------------------------

  /** Filter geometry: a 256-bit array, 3 hash functions. Production
    * sizing is bits ≈ 1.44 · n · log₂(1/p); the arithmetic below is
    * width-agnostic (widen BloomBits, nothing else changes) and the
    * gate's 256/3 keeps the false-positive path non-degenerate on the
    * ~31-token vocabulary (~36 % bits set ⇒ p ≈ 4.8 %).
    */
  private[graft] val BloomBits = 256L
  private[graft] val BloomHashes = 3

  private[graft] def bloomBit(k: Column, tok: Column): Column =
    conv(substring(md5(concat(lit("graft-bloom-"), k.cast("string"), lit("|"),
      tok)), 1, 2), 16, 10).cast("long") % BloomBits

  /** Per-source Bloom membership filter with its full state AND its
    * error under the gate: build each source's bit set from its
    * distinct tokens, probe it with the ENTIRE corpus vocabulary, and
    * emit bits set, true members, accepted probes, and the
    * false-positive count (accepted − members; no-false-NEGATIVES is
    * structural and spec-asserted).
    *
    * This is the oracle-able twin of the runtime bloom-filter join
    * rewrite RuntimeFilterSpec proves live (`might_contain` on the
    * probe-side scan): same fixed-size, OR-mergeable bit-set state —
    * the reason a 1000-executor build ships 32-byte partials instead
    * of a shuffle — but with every bit position replayed by DuckDB.
    * The probe side here is the corpus vocab (the gate's ground truth
    * needs exact membership); in production it is whatever stream is
    * being filtered, at scan speed against the broadcast bits.
    */
  def taBloom(s: SparkSession, dir: String): DataFrame = {
    val ks = explode(sequence(lit(0), lit(BloomHashes - 1))).as("k")
    val members = docs(s, dir)
      .select(col("source"), explode(toks).as("tok")).distinct()
    val bits = members.select(col("source"), ks, col("tok"))
      .select(col("source"), bloomBit(col("k"), col("tok")).as("bit"))
      .distinct()
    val nBits = bits.groupBy("source").agg(count(lit(1)).as("n_bits_set"))
    val nMembers = members.groupBy("source")
      .agg(count(lit(1)).as("n_members"))
    // probe EVERY source's filter with the whole corpus vocabulary
    val vocab = members.select("tok").distinct()
    val probes = nBits.select("source").crossJoin(broadcast(vocab))
    // membership = ALL of the probe's DISTINCT bits present (two of a
    // token's k hashes may collide on one bit — compare hit count to
    // the token's own distinct-bit count, identically in the oracle)
    val probeBits = probes.select(col("source"), ks, col("tok"))
      .select(col("source"), col("tok"), bloomBit(col("k"), col("tok")).as("bit"))
      .distinct()
    val need = probeBits.groupBy("source", "tok")
      .agg(count(lit(1)).as("need"))
    val hits = probeBits.join(bits, Seq("source", "bit"))
      .groupBy("source", "tok").agg(count(lit(1)).as("hits"))
    val accepted = need.join(hits, Seq("source", "tok"))
      .where(col("hits") === col("need"))
      .groupBy("source").agg(count(lit(1)).as("n_accepted"))
    nBits.join(nMembers, "source").join(accepted, "source")
      .select(col("source"), col("n_bits_set"), col("n_members"),
        col("n_accepted"),
        (col("n_accepted") - col("n_members")).as("n_fp"))
      .orderBy("source")
  }

  // ---- registration ----------------------------------------------------

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_heavy_hitters" -> (taHeavyHitters _),
    "ta_hll_distinct" -> (taHllDistinct _),
    "ta_winnow" -> (taWinnow _),
    "dd_winnow_pairs" -> (ddWinnowPairs _),
    "ta_bloom" -> (taBloom _),
  )

  /** Shared shingle replay (the word_shingles contract: 3-gram join by
    * one space; <3 tokens → one whole-text element), keyed by source.
    */
  private def shingleSrcCte(key: String) =
    s"""WITH w AS (
       |  SELECT doc_id, $key, list_filter(string_split(text, ' '), t -> t <> '') AS w
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, $key,
       |    CASE WHEN len(w) >= 3
       |         THEN list_transform(range(1, len(w) - 1),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |         ELSE [array_to_string(w, ' ')] END AS sh
       |  FROM w
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the sketch REBUILT in SQL from the same weighted vocab counts:
    // per-row buckets from the salted md5, 256-cell sums, min-of-d probe
    "ta_heavy_hitters" -> {
      val bucket = hexIntSql(
        "md5('graft-cms-' || CAST(i AS VARCHAR) || '|' || tok)", 2)
      s"""WITH tk AS (
         |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |  FROM documents),
         |c AS (SELECT tok, count(*) AS exact FROM tk GROUP BY tok),
         |r AS (
         |  SELECT tok, exact, i AS d, $bucket % $CmsWidth AS bucket
         |  FROM c, range(0, $CmsDepth) t(i)),
         |s AS (SELECT d, bucket, sum(exact) AS c FROM r GROUP BY d, bucket),
         |e AS (
         |  SELECT r.tok, r.exact, min(s.c) AS est
         |  FROM r JOIN s USING (d, bucket) GROUP BY r.tok, r.exact)
         |SELECT tok AS token, CAST(est AS BIGINT) AS est,
         |  CAST(exact AS BIGINT) AS exact
         |FROM e ORDER BY est DESC, token LIMIT $CmsTopK""".stripMargin
    },
    // registers replayed bucket-by-bucket (rho via the bin() bitlen
    // trick), the harmonic sum kept scaled-integer, ONE double division
    "ta_hll_distinct" -> {
      val bucket = hexIntSql("h", 2)
      val v = hexIntSql("substr(h, 3, 8)", 8)
      s"""${shingleSrcCte("source")},
         |e AS (SELECT source, unnest(sh) AS sh FROM s),
         |hh AS (SELECT source, sh, md5('graft-hll|' || sh) AS h FROM e),
         |b AS (
         |  SELECT source, $bucket AS bucket, $v AS v FROM hh),
         |r AS (
         |  SELECT source, bucket,
         |    max(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS m
         |  FROM b GROUP BY source, bucket),
         |sums AS (
         |  SELECT source, count(*) AS n_registers,
         |    sum(1::BIGINT << (33 - m)) AS t
         |  FROM r GROUP BY source),
         |sc AS (
         |  SELECT source, n_registers,
         |    CAST(($HllBuckets - n_registers) * 8589934592 + t AS BIGINT) AS s_scaled
         |  FROM sums),
         |ex AS (SELECT source, count(DISTINCT sh) AS exact FROM e GROUP BY source)
         |SELECT sc.source, CAST(n_registers AS BIGINT) AS n_registers, s_scaled,
         |  CAST(floor($HllNumer / s_scaled) AS BIGINT) AS est,
         |  CAST(exact AS BIGINT) AS exact
         |FROM sc JOIN ex USING (source) ORDER BY source""".stripMargin
    },
    // the winnow chain shared with ta_winnow, then the capped
    // inverted-index self-join replayed: distinct (doc, fingerprint),
    // postings HAVING <= cap, pairs keyed doc_a < doc_b, >= min shared
    "dd_winnow_pairs" -> {
      val W = WinnowWindow
      val h8 = hexIntSql("substr(md5('graft-wn|' || g), 1, 8)", 8)
      val sub = s"list_slice(hs, j, least(j + ${W - 1}, len(hs)))"
      s"""${shingleSrcCte("lang")},
         |hh AS (
         |  SELECT doc_id, list_transform(sh, g -> $h8) AS hs FROM s),
         |sl AS (
         |  SELECT doc_id, hs,
         |    list_distinct(list_transform(
         |      range(1, greatest(len(hs) - ${W - 1}, 1) + 1),
         |      j -> least(j + ${W - 1}, len(hs)) + 1
         |           - list_position(list_reverse($sub), list_min($sub)))) AS sel
         |  FROM hh),
         |f0 AS (SELECT doc_id, hs, unnest(sel) AS p FROM sl),
         |fh AS (SELECT DISTINCT doc_id, hs[p] AS fh FROM f0),
         |okf AS (SELECT fh FROM fh GROUP BY fh HAVING count(*) <= $WinnowPostingCap)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM fh a JOIN okf USING (fh) JOIN fh b
         |  ON a.fh = b.fh AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id HAVING count(*) >= $WinnowMinShared
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // bloom bits, members, vocab probes, and the distinct-bit
    // membership test replayed; n_fp = accepted − members
    "ta_bloom" -> {
      val mbit = hexIntSql(
        "md5('graft-bloom-' || CAST(i AS VARCHAR) || '|' || tok)", 2)
      s"""WITH tk0 AS (
         |  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |  FROM documents),
         |tk AS (SELECT DISTINCT source, tok FROM tk0),
         |b0 AS (
         |  SELECT source, tok, $mbit % $BloomBits AS bit
         |  FROM tk, range(0, $BloomHashes) t(i)),
         |bits AS (SELECT DISTINCT source, bit FROM b0),
         |nb AS (SELECT source, count(*) AS n_bits_set FROM bits GROUP BY source),
         |nm AS (SELECT source, count(*) AS n_members FROM tk GROUP BY source),
         |vocab AS (SELECT DISTINCT tok FROM tk0),
         |pb0 AS (
         |  SELECT sc.source, v.tok, $mbit % $BloomBits AS bit
         |  FROM (SELECT DISTINCT source FROM documents) sc, vocab v,
         |    range(0, $BloomHashes) t(i)),
         |pb AS (SELECT DISTINCT source, tok, bit FROM pb0),
         |need AS (SELECT source, tok, count(*) AS need FROM pb GROUP BY source, tok),
         |hit AS (
         |  SELECT pb.source, pb.tok, count(*) AS hits
         |  FROM pb JOIN bits USING (source, bit) GROUP BY pb.source, pb.tok),
         |acc AS (
         |  SELECT n.source, count(*) AS n_accepted
         |  FROM need n JOIN hit h
         |    ON n.source = h.source AND n.tok = h.tok AND h.hits = n.need
         |  GROUP BY n.source)
         |SELECT nb.source, CAST(n_bits_set AS BIGINT) AS n_bits_set,
         |  CAST(n_members AS BIGINT) AS n_members,
         |  CAST(n_accepted AS BIGINT) AS n_accepted,
         |  CAST(n_accepted - n_members AS BIGINT) AS n_fp
         |FROM nb JOIN nm USING (source) JOIN acc USING (source)
         |ORDER BY nb.source""".stripMargin
    },
    // gram hashes in a list column, then the identical window-argmin
    // algebra: e = min(j+w-1, n), pick e + 1 - position(reverse(sub), min(sub))
    "ta_winnow" -> {
      val W = WinnowWindow
      val h8 = hexIntSql("substr(md5('graft-wn|' || g), 1, 8)", 8)
      val sub = s"list_slice(hs, j, least(j + ${W - 1}, len(hs)))"
      s"""${shingleSrcCte("lang")},
         |hh AS (
         |  SELECT doc_id, list_transform(sh, g -> $h8) AS hs FROM s),
         |sl AS (
         |  SELECT doc_id, hs, len(hs) AS nh,
         |    list_sort(list_distinct(list_transform(
         |      range(1, greatest(len(hs) - ${W - 1}, 1) + 1),
         |      j -> least(j + ${W - 1}, len(hs)) + 1
         |           - list_position(list_reverse($sub), list_min($sub))))) AS sel
         |  FROM hh)
         |SELECT doc_id, CAST(nh AS INTEGER) AS n_grams,
         |  CAST(len(sel) AS INTEGER) AS n_selected,
         |  array_to_string(list_transform(sel,
         |    p -> CAST(p AS VARCHAR) || ':' || CAST(hs[p] AS VARCHAR)), ',') AS fp
         |FROM sl ORDER BY doc_id""".stripMargin
    },
  )
}
