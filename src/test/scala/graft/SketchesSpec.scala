package graft

import org.apache.spark.sql.functions._

import graft.queries.Sketches

/** The oracle-able sketches' contracts, each pinned against an
  * INDEPENDENT plain-JVM replay (java MessageDigest, no Spark
  * expressions):
  *  - count–min: the full top-20 frame (buckets, cell sums, min-of-d
  *    estimates, ordering) and the est ≥ exact guarantee;
  *  - HLL: the register state, exact scaled harmonic sum, and floor
  *    estimate per source, plus max-MERGEABILITY of registers (the
  *    property that makes the sketch a one-exchange aggregate at
  *    100 TB) and the linear-counting small-range estimator the
  *    oracle can't carry (libm ln);
  *  - winnowing: bit-exact fingerprints on crafted fixtures (ties,
  *    short docs, <3-token docs) and the Schleimer guarantee — any
  *    shared k+w−1 token run yields a shared fingerprint.
  */
class SketchesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def tokensOf(text: String): Seq[String] =
    text.split(" ", -1).toSeq.filter(_.nonEmpty)

  /** The word_shingles contract: 3-grams joined by one space; <3
    * tokens → one whole-join element.
    */
  private def shinglesOf(text: String): Seq[String] = {
    val w = tokensOf(text)
    if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSeq
    else Seq(w.mkString(" "))
  }

  // ---- count–min ----

  private def cmsBucketJvm(d: Int, tok: String): Int =
    (java.lang.Long.parseLong(md5Hex(s"graft-cms-$d|$tok").take(2), 16) %
      Sketches.CmsWidth).toInt

  test("CMS: the full top-20 frame replays under an independent JVM sketch") {
    val texts = graft.sources.Tables(spark, sfDir).documents
      .select("text").collect().map(_.getString(0)).toSeq
    val exact = texts.flatMap(tokensOf).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val sketch = Array.ofDim[Long](Sketches.CmsDepth, Sketches.CmsWidth.toInt)
    for ((t, c) <- exact; d <- 0 until Sketches.CmsDepth)
      sketch(d)(cmsBucketJvm(d, t)) += c
    def est(t: String): Long =
      (0 until Sketches.CmsDepth).map(d => sketch(d)(cmsBucketJvm(d, t))).min
    val expected = exact.keysIterator.toSeq
      .map(t => (t, est(t), exact(t)))
      .sortBy { case (t, e, _) => (-e, t) }
      .take(Sketches.CmsTopK)
    val got = Sketches.taHeavyHitters(spark, sfDir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === expected)
    // the CMS guarantee, and non-vacuously: collisions must exist at
    // 4×64 cells so est > exact somewhere, or the sketch isn't tested
    got.foreach { case (t, e, x) => assert(e >= x, s"$t: est $e < exact $x") }
    assert(got.exists { case (_, e, x) => e > x },
      "no colliding bucket — sketch under-exercised")
  }

  // ---- HLL ----

  private def rhoJvm(h: String): (Int, Int) = {
    val bucket = Integer.parseInt(h.take(2), 16)
    val v = java.lang.Long.parseLong(h.substring(2, 10), 16)
    val rho = if (v == 0) 33 else 33 - (64 - java.lang.Long.numberOfLeadingZeros(v))
    (bucket, rho)
  }

  private def jvmRegisters(shingles: Seq[String]): Map[Int, Int] =
    shingles.map(sh => rhoJvm(md5Hex(s"graft-hll|$sh")))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap

  test("HLL: register state, scaled sum, and floor estimate replay under JVM md5") {
    val rows = graft.sources.Tables(spark, sfDir).documents
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val bySource = rows.groupBy(_._1).view.mapValues(_.flatMap(t => shinglesOf(t._2)))
    val expected = bySource.toSeq.map { case (src, shs) =>
      val regs = jvmRegisters(shs)
      val t = regs.valuesIterator.map(m => 1L << (33 - m)).sum
      val s = (Sketches.HllBuckets - regs.size) * 8589934592L + t
      val est = math.floor(Sketches.HllNumer / s).toLong
      (src, regs.size.toLong, s, est, shs.distinct.size.toLong)
    }.sortBy(_._1)
    val got = Sketches.taHllDistinct(spark, sfDir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got === expected)
  }

  test("HLL registers are max-mergeable: merged sources ≡ union corpus") {
    import spark.implicits._
    val sh = (1 to 400).map(i => (s"s${i % 3}", s"sh-${i % 157}"))
      .toDF("source", "sh")
    val perSource = Sketches.hllRegisters(sh)
    val merged = perSource.groupBy("bucket").agg(max("m").as("m"))
      .select(col("bucket"), col("m")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    val direct = Sketches.hllRegisters(sh.withColumn("source", lit("all")))
      .select(col("bucket"), col("m")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    assert(merged === direct)
  }

  test("HLL small-range correction (linear counting) lands near exact at n << m") {
    // the correction the oracle can't carry (libm ln): m·ln(m/V) from the
    // ORACLED n_registers column, V = m − n_registers
    val shs = (1 to 60).map(i => s"lc-$i")
    val regs = jvmRegisters(shs)
    val v = (Sketches.HllBuckets - regs.size).toDouble
    val lc = Sketches.HllBuckets * math.log(Sketches.HllBuckets / v)
    assert(math.abs(lc - 60.0) / 60.0 < 0.15,
      s"linear counting $lc vs exact 60")
  }

  // ---- winnowing ----

  private def jvmWinnow(text: String): (Int, Int, String) = {
    val hs = shinglesOf(text).map(g =>
      java.lang.Long.parseLong(md5Hex(s"graft-wn|$g").take(8), 16))
    val n = hs.length
    val w = Sketches.WinnowWindow
    val sel = (1 to math.max(n - w + 1, 1)).map { j =>
      val e = math.min(j + w - 1, n)
      val sub = hs.slice(j - 1, e)
      val m = sub.min
      j + sub.lastIndexOf(m) // 1-based global position of rightmost min
    }.distinct.sorted
    (n, sel.size, sel.map(p => s"$p:${hs(p - 1)}").mkString(","))
  }

  test("winnow fingerprints replay under an independent JVM implementation") {
    import spark.implicits._
    val fixtures = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "a a a a a a a a", // all grams identical: rightmost-tie rule per window
      3L -> "x y z w",         // fewer grams than the window: one whole-window pick
      4L -> "only two",        // <3 tokens: single whole-text gram
      5L -> "one",             // single token
    )
    val got = Sketches.winnowCore(fixtures.toDF("doc_id", "text"))
      .collect().toSeq
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    for ((id, text) <- fixtures)
      assert(got(id) === jvmWinnow(text), s"doc $id ('$text')")
    // the tie fixture must have selected positions sliding right, one per window
    val (n2, nSel2, _) = got(2L)
    assert(n2 === 6 && nSel2 === 3, "tie fixture: windows 1..3 pick pos 4,5,6")
  }

  test("winnow pairs: a shared run pairs; a boilerplate fingerprint is capped out") {
    import spark.implicits._
    // 12 tokens shared → 10 grams → every window of the shared run picks
    // a shared hash: well over MinShared fingerprints in common
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    val paired = Seq(
      20L -> s"aa bb cc $run dd ee",
      21L -> s"ff gg hh $run ii jj",
    )
    val got = Sketches.winnowPairsCore(paired.toDF("doc_id", "text"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Seq((20L, 21L)), "shared-run docs must pair")
    // cap trapdoor: cap+2 docs all sharing the same text — every
    // fingerprint is in cap+2 > cap postings, so NO pairs survive
    val hot = (0 until Sketches.WinnowPostingCap + 2).map(i =>
      (100L + i) -> s"same old boilerplate text repeated $run")
    assert(Sketches.winnowPairsCore(hot.toDF("doc_id", "text")).count() === 0,
      "boilerplate-hot fingerprints must be capped out of the index")
  }

  test("bloom: full frame replays under an independent JVM filter; no false negatives") {
    val rows = graft.sources.Tables(spark, sfDir).documents
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val bySource = rows.groupBy(_._1).view
      .mapValues(_.flatMap(t => tokensOf(t._2)).distinct).toMap
    val vocab = rows.flatMap(t => tokensOf(t._2)).distinct
    def bitsOf(tok: String): Set[Int] =
      (0 until Sketches.BloomHashes).map(k =>
        (java.lang.Long.parseLong(md5Hex(s"graft-bloom-$k|$tok").take(2), 16) %
          Sketches.BloomBits).toInt).toSet
    val expected = bySource.toSeq.map { case (src, members) =>
      val bloom = members.flatMap(bitsOf).toSet
      val accepted = vocab.count(t => bitsOf(t).subsetOf(bloom))
      (src, bloom.size.toLong, members.size.toLong, accepted.toLong,
        accepted.toLong - members.size)
    }.sortBy(_._1)
    val got = Sketches.taBloom(spark, sfDir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got === expected)
    // no false negatives, structurally: every member is accepted
    got.foreach { case (src, _, m, a, fp) =>
      assert(a >= m && fp === a - m, s"$src: accepted $a < members $m")
    }
  }

  test("Schleimer guarantee: a shared k+w−1 token run ⇒ a shared fingerprint") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta" // k+w-1 = 6 tokens
    val df = Seq(
      10L -> s"red green blue $shared cyan magenta yellow",
      11L -> s"north south east west $shared up down",
    ).toDF("doc_id", "text")
    val fps = Sketches.winnowCore(df).collect()
      .map(r => r.getLong(0) ->
        r.getString(3).split(",").map(_.split(":")(1).toLong).toSet).toMap
    assert((fps(10L) & fps(11L)).nonEmpty,
      "no shared fingerprint despite a shared 6-token run")
  }

  test("dd_bloom_gate: no false negatives; the exact join still has work") {
    // the oracled corpus query (the testdata has NO duplicate
    // fingerprints, so only the gate/false-positive arm is exercisable
    // there)
    val corpus = graft.queries.Dedup.ddBloomGate(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3)))
    assert(corpus.nonEmpty)
    corpus.foreach { case (id, bloomHit, isDup) =>
      assert(!isDup || bloomHit, s"doc $id: is_dup without bloom_hit")
    }
    assert(corpus.exists { case (_, h, d) => h && !d },
      "no false positives — the gate fixture is not exercising the re-check")

    // crafted fixture with REAL cross-split duplicates: batch ids
    // (÷4=0) echoing history texts must come back is_dup AND
    // bloom_hit; a batch-only text must not be is_dup
    import spark.implicits._
    val fixture = Seq(
      (1L, "the quick brown fox"), (2L, "over the lazy dog"),
      (3L, "entirely different words"),
      (4L, "THE  quick   brown fox"), // normalizes to doc 1's fingerprint
      (8L, "over the lazy dog"),      // exact echo of doc 2
      (12L, "never seen before text"),
    ).toDF("doc_id", "text")
    val got = graft.queries.Dedup.bloomGateCore(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got.keySet === Set(4L, 8L, 12L))
    assert(got(4L) === ((true, true)), s"normalized echo must gate+dup: $got")
    assert(got(8L) === ((true, true)), s"exact echo must gate+dup: $got")
    assert(!got(12L)._2, s"fresh text must not be is_dup: $got")
  }
}
