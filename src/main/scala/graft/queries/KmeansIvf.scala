package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-means IVF coarse quantizer — the production counterpart of the
  * sign quantizer in [[Similarity]] (which the reference-gate keeps
  * because its cells are exactly oracle-replayable). Same search
  * interface: a cell id per vector and a ranked multi-probe list, so
  * [[Similarity.simIvfBucket]]'s equi-join search shape applies
  * unchanged — candidate generation stays a join on the cell key, cost
  * Σ(probes × |cell|), never n².
  *
  * Trained, not fixed: cells are Voronoi regions of learned centroids,
  * so they adapt to the data distribution over ALL dimensions (the sign
  * quantizer reads only the leading [[Similarity.BucketDims]] signs).
  * KmeansIvfSpec measures the payoff: ≥ recall at equal probe count
  * against the same brute-force truth.
  *
  * At 100 TB: train on a bounded sample (cost per Lloyd iteration =
  * |sample|·k codegen'd dot products + one (cid, dim)-keyed shuffle),
  * then assign the full corpus with one broadcast join — the centroid
  * table is k rows, always broadcastable. No driver-side collect
  * anywhere: centroids live in a DataFrame end to end.
  */
object KmeansIvf {

  private def dot(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.DotProduct(Bridge.expression(x), Bridge.expression(y)))
  }

  /** Squared L2 distance via the codegen dot kernel:
    * ‖v‖² − 2·v·c + ‖c‖² — norms precomputed per side, one dot per pair.
    */
  private def dist2(v: Column, nv2: Column, c: Column, nc2: Column): Column =
    nv2 - lit(2.0) * dot(v, c) + nc2

  /** All (vector, centroid) pairs ranked by distance per vector.
    * The centroid side is k rows — broadcast, so the "cross" join is a
    * map-side loop, no shuffle of the vector side.
    */
  private def ranked(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val v = vectors.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nv2"))
    val c = broadcast(centroids.select(col("cid"), col("centroid"),
      dot(col("centroid"), col("centroid")).as("nc2")))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
    v.crossJoin(c)
      .withColumn("d2",
        dist2(col("embedding"), col("nv2"), col("centroid"), col("nc2")))
      .withColumn("crank", row_number().over(w))
  }

  /** Nearest-centroid cell per vector (ties break to the lowest cid). */
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame =
    ranked(vectors, centroids).where(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))

  /** The `probes` nearest cells per vector — the multi-probe list, rows
    * (vec_id, cell, crank). The k-means analog of the sign quantizer's
    * Hamming-1 ring, with the probe budget explicit.
    */
  def probeCells(vectors: DataFrame, centroids: DataFrame, probes: Int): DataFrame =
    ranked(vectors, centroids).where(col("crank") <= probes)
      .select(col("vec_id"), col("cid").as("cell"), col("crank"))

  /** Lloyd iterations, fully distributed (no driver collect): centroids
    * are a DataFrame broadcast into each assignment join; initialization
    * is the first k vectors by id (deterministic). The re-estimation
    * mean folds each (cid, dim) group's values in SORTED order — a plain
    * avg() would inherit FP addition order from shuffle arrival, making
    * centroids run-dependent at the bit level; the sorted fold makes
    * training deterministic for any partitioning, so specs (and re-runs
    * on retried stages) see identical cells. Empty cells keep their
    * previous centroid (left anti join refill).
    */
  def train(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = vectors.where(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centroid"))
    (1 to iters).foreach { _ =>
      val updated = assignCells(vectors, centroids)
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
      val kept = centroids.join(updated, Seq("cid"), "left_anti")
      centroids = updated.unionByName(kept).localCheckpoint(eager = true)
    }
    centroids
  }
}
