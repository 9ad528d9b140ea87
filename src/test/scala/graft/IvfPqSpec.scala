package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{IvfPq, Pq, Similarity}

/** IVFADC's contract: residual quantization BUYS accuracy — at the
  * identical code budget (M×K codes per vector) the composed index
  * must recall exact-L2 neighbors at least as well as plain PQ over
  * the full corpus, even though IVFADC scans only the probed cells —
  * and the composition must not reintroduce any vector-side shuffle.
  */
class IvfPqSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb = graft.sources.Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding"))

  /** (query_id → top-3 set) from a (query_id, rank, vec_id, …) result. */
  private def topSets(rows: Array[org.apache.spark.sql.Row],
      q: Int = 0, v: Int = 2): Map[Long, Set[Long]] =
    rows.groupBy(_.getLong(q)).view.mapValues(_.map(_.getLong(v)).toSet).toMap

  test("residual PQ recalls >= plain PQ at equal code budget (and >> chance)") {
    // sf0.1 (2 000 vectors), not a 500-vector gate corpus: with only
    // ~31 vectors per cell the 3-of-16 probe restriction dominates
    // every quantizer effect and the comparison is a coin flip over
    // the corpus draw (measured: ivfpq loses 0.233 vs 0.267 on the
    // sf0.001 draw, wins 0.333 vs 0.233 on the sf0.01 draw). At ~125
    // per cell the cells are realistically occupied and the paper's
    // §IV claim is what gets measured. Deterministic training → both
    // recalls are constants.
    val bigDir = "/root/testdata/sf0.1"
    val ivfpq = topSets(IvfPq.simIvfPq(spark, bigDir).collect())
    val pq = topSets(Similarity.defs("sim_pq")(spark, bigDir).collect())

    // exact squared-L2 truth, same fold arithmetic as the engines
    val bigEmb = graft.sources.Tables(spark, bigDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val q = bigEmb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val c = bigEmb.select(col("vec_id"), col("embedding").as("ec"))
    val wt = Window.partitionBy("query_id").orderBy(col("d2"), col("vec_id"))
    val truth = topSets(q.crossJoin(c).where(col("query_id") =!= col("vec_id"))
      .withColumn("d2", Similarity.dotBuiltin(col("eq"), col("eq"))
        - lit(2.0) * Similarity.dotBuiltin(col("eq"), col("ec"))
        + Similarity.dotBuiltin(col("ec"), col("ec")))
      .withColumn("rank", row_number().over(wt))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id").collect())

    def recall(ann: Map[Long, Set[Long]]): Double =
      truth.map { case (qid, t) =>
        ann.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    val rIvf = recall(ivfpq)
    val rPq = recall(pq)
    // The margin is the paper's §IV claim reproduced: residuals have
    // far lower variance than the raw vectors, so the same K^M code
    // space quantizes them tighter — worth more than the 3-of-16-cell
    // probe restriction costs (measured: 0.400 vs 0.333).
    info(f"recall@3 at sf0.1: ivfpq=$rIvf%.3f plain pq=$rPq%.3f (chance ~0.0015)")
    assert(rIvf >= rPq, f"residual PQ must not recall worse: $rIvf%.3f < $rPq%.3f")
    assert(rIvf >= 0.2, f"recall collapsed toward chance: $rIvf%.3f")
  }

  test("probe discipline: every reported candidate lives in a probed cell") {
    val got = IvfPq.simIvfPq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    // re-derive each query's probe list from the persisted centroids
    val cent = spark.read.parquet(IvfPq.CoarseCentroidDir)
    val probes = graft.queries.KmeansIvf
      .probeCells(emb.where(col("vec_id") < 10), cent, IvfPq.Probes)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // and each candidate's own cell assignment
    val cells = graft.queries.KmeansIvf.assignCells(emb, cent)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    got.foreach { case (qid, vid, cell) =>
      assert(probes.contains((qid, cell)),
        s"candidate $vid reported from unprobed cell $cell for query $qid")
      assert(cells(vid) === cell, s"candidate $vid's cell mislabeled")
    }
  }

  test("rerank: exact metric on the shortlist — recall >= ADC-only, d2 exact") {
    // Same sampled training inputs → bit-identical model tables, so
    // the rerank output is exactly the sampled variant's ADC ranking
    // re-ordered by true L2 at depth 10. Recall must not drop (it can
    // only fix ADC misorderings inside the shortlist), and every
    // reported d2 must equal an independent plain-Scala fold.
    val bigDir = "/root/testdata/sf0.1"
    val rerank = IvfPq.simIvfPqRerank(spark, bigDir).collect()
    val adcOnly = topSets(IvfPq.simIvfPqSampled(spark, bigDir).collect())

    val bigEmb = graft.sources.Tables(spark, bigDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val q = bigEmb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val c = bigEmb.select(col("vec_id"), col("embedding").as("ec"))
    val wt = Window.partitionBy("query_id").orderBy(col("d2"), col("vec_id"))
    val truth = topSets(q.crossJoin(c).where(col("query_id") =!= col("vec_id"))
      .withColumn("d2", Similarity.dotBuiltin(col("eq"), col("eq"))
        - lit(2.0) * Similarity.dotBuiltin(col("eq"), col("ec"))
        + Similarity.dotBuiltin(col("ec"), col("ec")))
      .withColumn("rank", row_number().over(wt))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id").collect())
    def recall(ann: Map[Long, Set[Long]]): Double =
      truth.map { case (qid, t) =>
        ann.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    val rR = recall(topSets(rerank))
    val rA = recall(adcOnly)
    info(f"recall@3 at sf0.1: rerank=$rR%.3f adc-only=$rA%.3f")
    assert(rR >= rA, f"exact rerank must not recall worse: $rR%.3f < $rA%.3f")

    // independent exact-metric replay (same left-fold double arithmetic)
    val vecs = bigEmb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def fold(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    rerank.foreach { r =>
      val (qid, vid, d2) = (r.getLong(0), r.getLong(2), r.getDouble(4))
      val (eq, ec) = (vecs(qid), vecs(vid))
      val want = fold(eq, eq) - 2.0 * fold(eq, ec) + fold(ec, ec)
      assert(math.abs(d2 - want) < 1e-6,
        s"query $qid candidate $vid: reported d2=$d2, exact=$want")
    }
    // ranks ordered by the exact metric, not the ADC one
    rerank.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(byRank.sameElements(byRank.sorted),
        s"query $qid: ranks not ordered by exact d2: ${byRank.toList}")
    }
  }

  test("rerank plan: shortlist + raw-vector fetches broadcast, no new shuffle") {
    val p = IvfPq.simIvfPqRerank(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), s"no merge join anywhere:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast cartesian:\n$p")
    val keyLists = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toList
      .map(_.split(",\\s*").toList.dropRight(1)
        .map(_.takeWhile(_ != '#')))
    assert(keyLists.nonEmpty && keyLists.forall(k =>
      k == List("vec_id") || k == List("query_id") || k == List("m") ||
        k == List("query_id", "vec_id", "cell")),
      s"only the rank windows, the tiny codebook pivot, and the " +
        s"probed-candidate ADC aggregate may exchange, got $keyLists:\n$p")
  }

  test("plan: model joins broadcast; the vector stream never shuffles pre-ADC") {
    val p = IvfPq.simIvfPq(spark, sfDir).queryExecution.executedPlan.toString
    // the coarse centroid passes are broadcast loops (KmeansIvf.ranked);
    // codebook + distance-table joins broadcast; nothing sort-merges
    assert(!p.contains("SortMergeJoin"), s"no merge join anywhere:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast cartesian:\n$p")
    // every hash exchange keys on query_id (the rank window), m (the
    // M·K-row codebook pivot — a 256-row model-side exchange, never
    // the vector stream), vec_id (the query-side probe window), or
    // (query_id, vec_id, cell) — the ADC lookup-sum aggregate, whose
    // input the probed-cell broadcast join has ALREADY cut to the
    // query-candidate set (queries × probes × |cell| × M rows, not
    // n·M: the round-12 argmin-kernel rewrite removed the assignment
    // aggregate's n-row exchange this aggregate used to piggyback on).
    // In particular nothing keys (vec_id, m) — the scored-candidate
    // shuffle, the shape that dies at 10⁹
    val keyLists = "Exchange hashpartitioning\\(([^)]+)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toList
      .map(_.split(",\\s*").toList.dropRight(1) // last element = #partitions
        .map(_.takeWhile(_ != '#')))
    assert(keyLists.nonEmpty && keyLists.forall(k =>
      k == List("vec_id") || k == List("query_id") || k == List("m") ||
        k == List("query_id", "vec_id", "cell")),
      s"only the rank windows, the tiny codebook pivot, and the " +
        s"probed-candidate ADC aggregate may exchange, got $keyLists:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"expected the collect_list ADC fold aggregate:\n$p")
    assert(p.contains("centroid_argmin"),
      s"expected the codegen argmin assignment kernel:\n$p")
  }
}
