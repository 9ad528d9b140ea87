package graft

import graft.queries.Dedup

/** Pins [[Dedup.pagerank]]'s integer fixed-point recurrence against an
  * independent plain-Scala replay (same floor divisions, same damping)
  * on closed-form and seeded-random fixtures, plus the structural
  * facts the centrality claim rests on: a star's hub outranks its
  * leaves, a path's middle outranks its ends, and a regular graph
  * (clique) stays exactly uniform. And the plan contract: per-round
  * Pregel messages are node-keyed equi-joins — no cartesian, nothing
  * driver-sided.
  */
class PagerankSpec extends SparkSpec {

  /** The engine's recurrence, re-implemented without Spark: integer
    * floor division throughout, [[Dedup.PrIters]] rounds.
    */
  private def replay(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
      .filter(p => p._1 != p._2).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    val perNode = Dedup.PrScale / n
    val base = (perNode * 15) / 100
    var pr = deg.keys.map(_ -> perNode).toMap
    for (_ <- 1 to Dedup.PrIters) {
      val contrib = pr.map { case (u, p) => u -> p / deg(u) }
      val inSum = edges.groupBy(_._1).view
        .mapValues(_.map(e => contrib(e._2)).sum).toMap
      pr = pr.keys.map(v => v -> (base + (Dedup.PrDamp * inSum(v)) / 100)).toMap
    }
    pr.map { case (v, p) => v -> ((deg(v), p)) }
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Dedup.pagerank(pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("star, path, clique: engine == independent integer replay, bit-exact") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val path = Seq((10L, 11L), (11L, 12L))
    val clique = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    for (fixture <- Seq(star, path, clique.toSeq)) {
      val got = run(fixture)
      val want = replay(fixture)
      assert(got === want, s"engine diverged from replay on $fixture")
    }
  }

  test("centrality ordering: hub > leaf, middle > end, clique uniform") {
    val star = run(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert((1L to 4L).forall(l => star(0L)._2 > star(l)._2),
      s"hub must outrank leaves: $star")
    assert((1L to 4L).map(star(_)._2).distinct.size == 1,
      s"leaves must tie exactly: $star")

    val path = run(Seq((10L, 11L), (11L, 12L)))
    assert(path(11L)._2 > path(10L)._2 && path(11L)._2 > path(12L)._2,
      s"path middle must outrank ends: $path")

    val clique = run(for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j))
    assert(clique.values.map(_._2).toSet.size == 1,
      s"regular graph must stay exactly uniform: $clique")
  }

  test("seeded random graph: engine == replay; self-pairs ignored") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(40)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2) ++ Seq((3L, 3L)) // self-pair must be dropped
    val got = run(pairs)
    val want = replay(pairs)
    assert(got === want, "engine diverged from replay on the random graph")
    // total mass conservation (within floor-division leakage): the sum
    // of pr can only LOSE units to flooring, never gain
    assert(got.values.map(_._2).sum <= Dedup.PrScale)
  }

  test("plan: per-round messages are node-keyed equi-joins, no cartesian") {
    val p = Dedup.ddPagerank(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the only nested-loop joins are the broadcast 1-row n_nodes stats
    // frame (the repo-wide crossJoin(broadcast(agg)) pattern) — always
    // BuildRight Cross, never a data-sided loop
    val bnlj = "BroadcastNestedLoopJoin ([A-Za-z]+), ([A-Za-z]+)".r
      .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toList
    assert(bnlj.forall(_ == ("BuildRight", "Cross")),
      s"every nested loop must be the broadcast stats frame, got $bnlj:\n$p")
    // every keyed join is a node-keyed message join
    val keyed = "(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[([a-z_]+)#"
      .r.findAllMatchIn(p).map(_.group(1)).toList
    assert(keyed.forall(k => k == "doc_id" || k == "a" || k == "b"
        || k == "band_idx" || k == "doc_a" || k == "doc_b"),
      s"joins must key on node/edge/band keys, got $keyed:\n$p")
    spark.catalog.clearCache()
  }
}
