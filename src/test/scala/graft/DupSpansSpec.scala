package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Pins [[Dedup.ddDupSpans]]'s span arithmetic on a crafted fixture:
  * a duplicated span of length L shared by two documents must produce
  * exactly L − k + 1 duplicated windows in EACH document (the
  * composition property that makes fixed-width windows equivalent to
  * arbitrary-length span detection), within-doc repeats alone must NOT
  * count as duplicated (cross-document means ≥ 2 distinct docs), and
  * sub-k documents are excluded. Plus the plan contract: the hot-gram
  * join is a gram-keyed equi-join, never a pair join.
  */
class DupSpansSpec extends SparkSpec {

  private val K = 8 // = Dedup.DupSpanK, pinned

  test("a shared span of length L yields L-k+1 duplicated windows per doc") {
    import spark.implicits._
    val shared = (0 until 12).map(i => s"s$i") // L=12 -> 5 dup windows
    val fixture = Seq(
      // doc 0: 4 unique tokens + the shared 12-token span
      (0L, ((0 until 4).map(i => s"a$i") ++ shared).mkString(" ")),
      // doc 1: the shared span + 4 different unique tokens
      (1L, (shared ++ (0 until 4).map(i => s"b$i")).mkString(" ")),
      // doc 2: a WITHIN-doc repeated 8-gram, but no cross-doc overlap
      (2L, ((0 until K).map(i => s"r$i") ++ (0 until K).map(i => s"r$i")).mkString(" ")),
      // doc 3: 7 tokens -> excluded
      (3L, (0 until K - 1).map(i => s"x$i").mkString(" ")),
    ).toDF("doc_id", "text")

    assert(Dedup.DupSpanK === K)
    val got = Dedup.dupSpans(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(got.keySet === Set(0L, 1L, 2L), "sub-k doc must be excluded")
    // 16 tokens -> 9 windows each; exactly the 5 windows fully inside
    // the shared span are duplicated (L - k + 1 = 12 - 8 + 1)
    assert(got(0L) === ((9L, 5L)))
    assert(got(1L) === ((9L, 5L)))
    // within-doc repetition is not cross-document duplication
    assert(got(2L) === ((9L, 0L)))
  }

  test("extents: runs of duplicated windows merge to closed-form spans") {
    import spark.implicits._
    val shared = (0 until 12).map(i => s"s$i") // L=12 span
    val shared2 = (0 until K).map(i => s"t$i") // L=8 span -> 1 window
    val fixture = Seq(
      // doc 0: 4 unique + shared12 + 3 unique + shared8  (two islands)
      (0L, ((0 until 4).map(i => s"a$i") ++ shared ++
        (0 until 3).map(i => s"c$i") ++ shared2).mkString(" ")),
      // doc 1: shared12 at position 0
      (1L, (shared ++ (0 until 4).map(i => s"b$i")).mkString(" ")),
      // doc 2: shared8 at position 2
      (2L, ((0 until 2).map(i => s"d$i") ++ shared2 ++
        (0 until 2).map(i => s"e$i")).mkString(" ")),
      // doc 3: no cross-doc overlap -> no extents
      (3L, (0 until 16).map(i => s"z$i").mkString(" ")),
    ).toDF("doc_id", "text")

    val got = Dedup.dupSpanExtents(fixture).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))

    // doc 0: shared12 occupies tokens [4,15] -> 5 windows starting 4..8
    //        shared8 occupies tokens [19,26] -> 1 window at 19
    // doc 1: shared12 at [0,11] -> 5 windows starting 0..4
    // doc 2: shared8 at [2,9] -> 1 window at 2
    assert(got.toSeq === Seq(
      (0L, 4, 15, 12L, 5L),
      (0L, 19, 26, 8L, 1L),
      (1L, 0, 11, 12L, 5L),
      (2L, 2, 9, 8L, 1L)))
    // the merge invariant: span_tokens = L and n_dup_windows = L-k+1
    got.foreach { case (_, s, e, st, nw) =>
      assert(st === (e - s + 1).toLong)
      assert(nw === st - K + 1)
    }
  }

  test("extents of overlapping-but-distinct shared spans stay maximal runs") {
    import spark.implicits._
    // doc A shares tokens [0,9] with B and [5,14] with C: A's duplicated
    // windows are 0..2 (from B) and 5..7 (from C) — window 3,4 cover
    // tokens crossing the seam and match nobody, so A gets TWO extents
    val a = (0 until 15).map(i => s"v$i")
    val fixture = Seq(
      (0L, a.mkString(" ")),
      (1L, (a.take(10) ++ Seq("bb1", "bb2")).mkString(" ")),
      (2L, (Seq("cc1", "cc2") ++ a.slice(5, 15)).mkString(" ")),
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanExtents(fixture).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc 0: windows 0..2 -> extent [0,9]; windows 5..7 -> extent [5,14]
    assert(got.filter(_._1 == 0L).toSeq === Seq((0L, 0, 9), (0L, 5, 14)))
  }

  test("span cut removes exactly the union of covered tokens") {
    import spark.implicits._
    val shared = (0 until 12).map(i => s"s$i")
    val a = (0 until 15).map(i => s"v$i")
    val fixture = Seq(
      // doc 0: 4 unique + shared12 -> cut [4,15], keep a0..a3
      (0L, ((0 until 4).map(i => s"a$i") ++ shared).mkString(" ")),
      // doc 1: the shared span alone -> fully cut, kept stream empty
      (1L, shared.mkString(" ")),
      // doc 2/3/4: overlapping-but-distinct shares (the extents case):
      // doc 2 shares [0,9] with doc 3 and [5,14] with doc 4 -> union
      // of covered tokens is [0,14] even though no window spans the seam
      (2L, a.mkString(" ")),
      (3L, (a.take(10) ++ Seq("bb1", "bb2")).mkString(" ")),
      (4L, (Seq("cc1", "cc2") ++ a.slice(5, 15)).mkString(" ")),
      // doc 5: sub-k -> no windows, passes through whole
      (5L, (0 until K - 1).map(i => s"x$i").mkString(" ")),
    ).toDF("doc_id", "text")

    val got = Dedup.spanCut(fixture).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    assert(got.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L), "every doc survives")
    assert(got(0L) === ((16L, 4L, 12L, md5hex((0 until 4).map(i => s"a$i").mkString(" ")))))
    assert(got(1L) === ((12L, 0L, 12L, md5hex(""))))
    // doc 2: windows 0..2 (vs doc 3) cover [0,9], windows 5..7 (vs
    // doc 4) cover [5,14] -> union [0,14], nothing kept
    assert(got(2L) === ((15L, 0L, 15L, md5hex(""))))
    // doc 3 keeps its 2 unique tokens; doc 4 likewise
    assert(got(3L) === ((12L, 2L, 10L, md5hex("bb1 bb2"))))
    assert(got(4L) === ((12L, 2L, 10L, md5hex("cc1 cc2"))))
    assert(got(5L) === ((7L, 7L, 0L, md5hex((0 until K - 1).map(i => s"x$i").mkString(" ")))))
  }

  test("plan: gram-keyed equi-joins only, no cartesian, no pair join") {
    for (q <- Seq(Dedup.ddDupSpans(spark, "/root/testdata/sf0.001"),
        Dedup.ddDupSpanExtents(spark, "/root/testdata/sf0.001"),
        Dedup.ddSpanCut(spark, "/root/testdata/sf0.001"))) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"no nested loop:\n$p")
      val keyed = "(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[([a-z0-9_]+)#"
        .r.findAllMatchIn(p).map(_.group(1)).toList
      // gh = the hot-gram probe; doc_id = span-cut's 1:1 manifest
      // re-join (one bounded starts-array row per doc — not a pair join)
      assert(keyed.nonEmpty && keyed.forall(k => k == "gh" || k == "doc_id"),
        s"every join must key on the gram hash or doc_id, got $keyed:\n$p")
    }
    spark.catalog.clearCache()
  }
}
