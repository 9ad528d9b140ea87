package graft

import graft.queries.Bpe

/** BPE merge-rule training: a closed-form fixture where the whole
  * merge sequence is known by construction (including cross-round
  * chaining — a round-1 merged symbol must feed round-2's winning
  * pair), greedy-left non-overlap on repeated symbols, and the full
  * gate-corpus rule sequence replayed by an INDEPENDENT plain-Scala
  * BPE trainer (no Spark, no SQL — the textbook algorithm over a
  * word-frequency map).
  */
class BpeTrainSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq

  test("closed-form fixture: counts, tie-breaks, and cross-round chaining") {
    import spark.implicits._
    // "abab" x2 + "ab" x1: (a,b) count 2*2+1 = 5 beats (b,a) 2.
    // After merging (a,b): abab = [ab, ab], ab = [ab] -> round 2 must
    // merge the ROUND-1 SYMBOL pair (ab, ab) with count 2.
    val d = Seq("abab abab ab").toDF("text")
    val got = rows(Bpe.bpeTrain(d, 4))
    assert(got === Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "ab", "abab", 2L)))
    // round 3 found no pairs (every word is one symbol) -> training
    // stopped early instead of emitting degenerate rules
  }

  test("greedy left-to-right non-overlap: 'aaaa' merges to two 'aa'") {
    import spark.implicits._
    val got = rows(Bpe.bpeTrain(Seq("aaaa").toDF("text"), 2))
    // round 1: (a,a) appears 3 times overlapping but the RULE count is
    // the raw adjacent-pair count (3); the merge pass is non-overlapping,
    // leaving [aa, aa] -> round 2 merges (aa, aa) once
    assert(got === Seq(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "aa", "aaaa", 1L)))
  }

  /** The textbook trainer: word-frequency map, repeated
    * count-argmax-merge, greedy-left merge pass — entirely
    * independent of the engine's fold/SQL formulation.
    */
  private def referenceBpe(words: Map[String, Long], merges: Int): Seq[(String, String, Long)] = {
    var table: Map[Vector[String], Long] =
      words.groupMapReduce(kv => kv._1.map(_.toString).toVector)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var k = 0
    var done = false
    while (k < merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- table; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        def mergeWord(syms: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }
        table = table.groupMapReduce(kv => mergeWord(kv._1))(_._2)(_ + _)
        k += 1
      }
    }
    out.toSeq
  }

  test("gate corpus: the engine's rule sequence equals an independent trainer's") {
    val sfDir = "/root/testdata/sf0.001"
    val got = rows(Bpe.taBpeTrain(spark, sfDir))
      .map { case (_, l, r, _, c) => (l, r, c) }
    // independent word-frequency base: plain JVM split over the raw text
    import spark.implicits._
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.split(" ", -1).filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = referenceBpe(words, Bpe.BpeMerges)
    assert(got === expect)
    assert(got.size === Bpe.BpeMerges, "gate corpus must sustain all rounds")
    // (cross-round chaining is pinned by the closed-form fixture; this
    // corpus's top-4 merges happen to be four distinct char pairs)
  }

  test("seeded fuzz: 40 random corpora agree with the independent trainer") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    for (_ <- 1 to 40) {
      val alphabet = "ab" + ("cde".take(rnd.nextInt(3)))
      val words = Seq.fill(3 + rnd.nextInt(5)) {
        (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = Seq.fill(8)(words(rnd.nextInt(words.size))).mkString(" ")
      val got = rows(Bpe.bpeTrain(Seq(text).toDF("text"), 3))
        .map { case (_, l, r, _, c) => (l, r, c) }
      val freq = text.split(" ").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(got === referenceBpe(freq, 3), s"corpus: $text")
    }
  }
}
