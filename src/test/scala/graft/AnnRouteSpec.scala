package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.IvfPq

/** The ANN family router ([[IvfPq.calibrateRoute]] → measured recall
  * pair → [[IvfPq.annRouteForRecalls]]): the decision boundary, the
  * calibration's determinism, and the end-to-end property the decades
  * measure at scale — on a wide-dense-cluster corpus (the geometry
  * where round 9/10 measured compressed codes losing 0.17–0.33
  * recall@3 to raw-vector cells) the calibration routes to raw cells,
  * and on a homogeneous corpus it routes to the 32×-cheaper codes.
  * Fixtures run at FULL density — the decisive round-10 finding
  * (BENCH_annroute_r10.jsonl) is that shortlist crowding is a density
  * property no O(sample) proxy statistic can see, which is why the
  * router measures instead of estimating.
  */
class AnnRouteSpec extends SparkSpec {

  private val dim = 64 // = Pq.SubspaceCount * Pq.SubspaceDim

  private def frame(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 4),
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  /** The decade corpora's wide-cluster geometry in miniature (the
    * upscale_diverse `cluster` mode: far-apart centers, per-vector
    * noise at ~half the center norm): 4 dense clusters × 128 members.
    * Every query's top-3 competition happens inside its own cluster
    * among ~128 near-equidistant members — a flat neighborhood that
    * overflows the 10-deep ADC shortlist.
    */
  private lazy val clustered = {
    val rnd = new scala.util.Random(101)
    frame((0 until 4).flatMap { c =>
      (0 until 128).map { j =>
        Row((c * 128 + j).toLong, Array.tabulate(dim)(d =>
          (if (d == c) 10f else 0f) +
            (rnd.nextFloat() - 0.5f) * 1.25f).toSeq)
      }
    })
  }

  /** Homogeneous control: 512 uniform vectors in [-1,1]^64 — used for
    * the determinism check (cheap, self-contained).
    */
  private lazy val isotropic = {
    val rnd = new scala.util.Random(202)
    frame((0 until 512).map { i =>
      Row(i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f).toSeq)
    })
  }

  /** Codes-adequate control: the real gate corpus — the one measured
    * point where IVFADC+rerank is AHEAD of raw cells (0.433 vs 0.400
    * at sf0.1, BENCH_annroute_r10.jsonl), so the calibration must
    * keep the compressed family there. (A synthetic uniform cube is
    * NOT such a control: 64-dim uniform distances concentrate so
    * hard that codes lose there too — measured, not assumed.)
    */
  private lazy val gateCorpus = graft.sources
    .Tables(spark, "/root/testdata/sf0.001").embeddings
    .select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"))

  private def calibrate(df: org.apache.spark.sql.DataFrame) =
    IvfPq.calibrateRoute(df, coarseK = 16, pqK = 16, trainCap = 128,
      probes = 3)

  test("route boundary: codes win ties, raw cells need the margin") {
    assert(IvfPq.annRouteForRecalls(0.5, 0.5) === "ivfadc")
    assert(IvfPq.annRouteForRecalls(0.5 + IvfPq.RouteMargin, 0.5) === "ivfadc")
    assert(IvfPq.annRouteForRecalls(0.5 + IvfPq.RouteMargin + 0.01, 0.5)
      === "kmeans_ivf")
    assert(IvfPq.annRouteForRecalls(0.3, 0.9) === "ivfadc")
  }

  test("calibration is deterministic (coin-chosen queries, coin-seeded training)") {
    val a = calibrate(isotropic)
    val b = calibrate(isotropic)
    assert(a === b, s"two calibrations disagree: $a vs $b")
  }

  test("calibration routes each geometry to its measured winner") {
    val clu = calibrate(clustered)
    val g = calibrate(gateCorpus)
    info(f"clustered: kmeans ${clu.kmeansRecall}%.3f vs ivfadc+rerank " +
      f"${clu.adcRecall}%.3f -> ${clu.route} (inBand=${clu.inBand})")
    info(f"gate corpus: kmeans ${g.kmeansRecall}%.3f vs ivfadc+rerank " +
      f"${g.adcRecall}%.3f -> ${g.route} (inBand=${g.inBand})")
    // the dense flat clusters must show a real compressed-ranking
    // deficit (the decades read 0.17-0.33 at scale) and route to raw
    // cells — and the calibration must REPORT it as a measured winner,
    // not a tie; the codes-adequate control must keep the cheaper family
    assert(clu.kmeansRecall > clu.adcRecall + IvfPq.RouteMargin,
      f"clustered gap collapsed: ${clu.kmeansRecall}%.3f vs ${clu.adcRecall}%.3f")
    assert(clu.route === "kmeans_ivf")
    assert(!clu.inBand, "clustered decision should be outside the tie band")
    assert(g.route === "ivfadc",
      f"gate-corpus control routed away from codes: ${g.kmeansRecall}%.3f vs ${g.adcRecall}%.3f")
  }
}
