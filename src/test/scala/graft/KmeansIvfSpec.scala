package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{KmeansIvf, Similarity}

/** The learned quantizer must earn its keep: at an EQUAL probe budget
  * (9 probes — the sign quantizer's own cell + its 8 Hamming-1
  * neighbors), k-means cells (256, matching the sign quantizer's 2⁸)
  * must reach at least the sign quantizer's recall against the same
  * brute-force truth. Training is deterministic (sorted-fold means,
  * id-ordered init), so these numbers are stable across runs.
  */
class KmeansIvfSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val Probes = 9 // = 1 + BucketDims, the sign path's budget
  private val K = 3      // recall@3
  private val NQueries = 20

  private lazy val emb = graft.sources.Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding"))

  private def cosRank(cands: DataFrame): Map[Long, Set[Long]] = {
    // cands: (query_id, vec_id) candidate pairs; rank by exact cosine
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val c = emb.select(col("vec_id"), col("embedding").as("ec"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    cands.join(q, "query_id").join(c, "vec_id")
      .withColumn("cos", Similarity.dotBuiltin(col("eq"), col("ec"))
        / sqrt(Similarity.dotBuiltin(col("eq"), col("eq")))
        / sqrt(Similarity.dotBuiltin(col("ec"), col("ec"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .select("query_id", "vec_id")
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def recall(ann: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) => ann.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      .sum / truth.size

  test("k-means IVF recall >= sign-quantizer recall at equal probe count") {
    val queries = emb.where(col("vec_id") < NQueries)

    // ground truth: exact top-K over all candidate pairs
    val allPairs = queries.select(col("vec_id").as("query_id"))
      .crossJoin(emb.select("vec_id"))
      .where(col("query_id") =!= col("vec_id"))
    val truth = cosRank(allPairs)
    assert(truth.size == NQueries)

    // sign quantizer: own cell + Hamming-1 ring (9 probes of 2^8 cells)
    val signCells = emb.select(col("vec_id"),
      Similarity.signBucket(col("embedding")).as("cell"))
    val signQ = signCells.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"),
        explode(Similarity.probeCells(col("cell"))).as("cell"))
    val signCands = signQ.join(signCells, "cell")
      .where(col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id").distinct()
    val signRecall = recall(cosRank(signCands), truth)

    // k-means: 256 learned cells, nearest 9 probed
    val centroids = KmeansIvf.train(emb, k = 256, iters = 3)
    assert(centroids.count() == 256L)
    val kmCells = KmeansIvf.assignCells(emb, centroids)
      .select(col("vec_id"), col("cell"))
    val kmQ = KmeansIvf.probeCells(queries, centroids, Probes)
      .select(col("vec_id").as("query_id"), col("cell"))
    val kmCands = kmQ.join(kmCells, "cell")
      .where(col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id").distinct()
    val kmRecall = recall(cosRank(kmCands), truth)

    info(f"recall@$K over $NQueries queries, $Probes probes: " +
      f"kmeans=$kmRecall%.3f sign=$signRecall%.3f")
    assert(kmRecall >= signRecall,
      f"k-means IVF ($kmRecall%.3f) must not trail the sign quantizer ($signRecall%.3f)")
  }

  /** The round-5 re-estimation: collect_list per (cid, dim) + sorted
    * double fold — order-independent but O(|cell|) state per group.
    * Kept here (test-only) as the reference for the bit-equality check
    * on its bounded-memory replacement.
    */
  private def reestimateSortedFold(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell").as("cid"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cid", "dim")
      .agg(collect_list(col("v").cast("double")).as("vs"))
      .withColumn("m",
        aggregate(array_sort(col("vs")), lit(0.0), (a, x) => a + x)
          / size(col("vs")))
      .groupBy("cid")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("m")))),
        x => x("m").cast("float")).as("centroid"))

  private def centroidBits(df: DataFrame): Map[Int, Seq[Int]] =
    df.collect().map { r =>
      r.getInt(0) -> r.getSeq[Float](1).map(java.lang.Float.floatToIntBits)
    }.toMap

  test("fixed-point re-estimation is bit-identical to the sorted-fold reference") {
    val centroids = KmeansIvf.train(emb, k = 16, iters = 1)
    val assigned = KmeansIvf.assignCells(emb, centroids)
      .select(col("cell"), col("embedding"))
    val fixed = centroidBits(KmeansIvf.reestimate(assigned))
    val folded = centroidBits(reestimateSortedFold(assigned))
    assert(fixed.keySet == folded.keySet)
    fixed.foreach { case (cid, bits) =>
      assert(bits == folded(cid), s"cell $cid: float bits diverge")
    }
  }

  test("re-estimation handles a hot cell without collect_list over cell members") {
    // Deliberate skew: every vector lands in cell 0 except one straggler.
    val skewed = emb.select(
      when(col("vec_id") === 0L, lit(1)).otherwise(lit(0)).as("cell"),
      col("embedding"))
    val out = KmeansIvf.reestimate(skewed)
    // The only collect_list in the plan is the per-cid dim rebuild
    // (group size = embedding dimension, a constant) — the per-(cid, dim)
    // value aggregation must be a sum, not a buffered list.
    val plan = out.queryExecution.optimizedPlan.toString
    val nCollect = "collect_list".r.findAllIn(plan).size
    assert(nCollect == 1, s"expected 1 collect_list (dim rebuild), got $nCollect:\n$plan")
    assert(plan.contains("sum("), "per-(cid, dim) aggregation must be a sum")
    val bits = centroidBits(out)
    assert(bits.keySet == Set(0, 1))
    // And the hot cell's mean still matches the O(n)-state reference.
    assert(bits == centroidBits(reestimateSortedFold(skewed)))
  }

  test("assignCells puts every vector in exactly one existing cell") {
    val centroids = KmeansIvf.train(emb.limit(64), k = 16, iters = 2)
    val cells = KmeansIvf.assignCells(emb.limit(64), centroids)
    assert(cells.count() == 64L)
    assert(cells.select("vec_id").distinct().count() == 64L)
    val cellIds = centroids.select("cid").collect().map(_.getInt(0)).toSet
    assert(cells.select("cell").distinct().collect()
      .forall(r => cellIds.contains(r.getInt(0))))
  }

  test("probeCells returns the probe budget, nearest first, own cell rank 1") {
    val centroids = KmeansIvf.train(emb.limit(100), k = 16, iters = 2)
    val probes = KmeansIvf.probeCells(emb.limit(10), centroids, 4)
    val byVec = probes.collect().groupBy(_.getLong(0))
    assert(byVec.size == 10 && byVec.values.forall(_.length == 4))
    val own = KmeansIvf.assignCells(emb.limit(10), centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    byVec.foreach { case (v, rows) =>
      val rank1 = rows.find(_.getInt(2) == 1).get.getInt(1)
      assert(rank1 == own(v), s"vec $v: nearest probe must be its own cell")
    }
  }
}
