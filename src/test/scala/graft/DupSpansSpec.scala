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

  test("plan: gram-keyed equi-joins only, no cartesian, no pair join") {
    val df = Dedup.ddDupSpans(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no nested loop:\n$p")
    val keyed = "(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[([a-z0-9_]+)#"
      .r.findAllMatchIn(p).map(_.group(1)).toList
    assert(keyed.nonEmpty && keyed.forall(_ == "gh"),
      s"every join must key on the gram hash, got $keyed:\n$p")
    spark.catalog.clearCache()
  }
}
