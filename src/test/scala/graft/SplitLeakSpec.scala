package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** The leakage-freedom property dd_split exists for: every near-dup
  * cluster lands in exactly ONE of train/val/test, so no test document
  * has a near-duplicate twin in train. Asserted INDEPENDENTLY of the
  * implementation — via ddCluster's (doc_id, cluster_id) membership,
  * not dd_split's own split_key — so a regression in the cluster
  * keying (e.g. split_key silently reverting to doc_id) fails here
  * rather than passing a tautology.
  */
class SplitLeakSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every near-dup cluster is assigned exactly one split") {
    val split = Dedup.ddSplit(spark, sfDir).select("doc_id", "split")
    // the external witness: cluster membership from ddCluster itself
    val members = Dedup.ddCluster(spark, sfDir).select("doc_id", "cluster_id")
    val perCluster = members.join(split, "doc_id")
      .groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"), count(lit(1)).as("n_docs"))
    assert(perCluster.where(col("n_splits") > 1).count() === 0L,
      "a near-dup cluster straddles two splits")
    // non-vacuous: multi-doc clusters exist on this corpus
    assert(perCluster.where(col("n_docs") > 1).count() > 0L,
      "no multi-doc clusters — leak check is vacuous")
    // every doc assigned exactly once, all three splits populated
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(split.count() === n)
    assert(split.select("split").distinct().count() === 3L)
  }

  test("splitThresholds: default pins the oracle's hex cuts; rule rejects bad ratios") {
    // the oracle SQL hard-codes c000/e000 — the default config must
    // reproduce them exactly
    assert(Dedup.splitThresholds(Dedup.SplitRatios) === Seq("c000", "e000"))
    // monotone, correct count for a finer mixture
    val t = Dedup.splitThresholds(Seq(0.5, 0.2, 0.2, 0.1))
    assert(t === t.sorted && t.size === 3)
    assert(t === Seq("8000", "b333", "e666"))
    intercept[IllegalArgumentException] { Dedup.splitThresholds(Seq(0.9, 0.2)) }
    intercept[IllegalArgumentException] { Dedup.splitThresholds(Seq(1.0)) }
    intercept[IllegalArgumentException] { Dedup.splitThresholds(Seq(0.5, -0.5, 1.0)) }
    // cuts that round OUT of the open (0, 0x10000) interval must fail
    // fast: 1 − 5e-9 rounds to 0x10000 and would otherwise format as the
    // 5-char "10000", lexicographically below '1xxx'..'fxxx' on the
    // 4-char coin — ~94% of the coin space silently misrouted
    intercept[IllegalArgumentException] {
      Dedup.splitThresholds(Seq(1.0 - 5e-9, 5e-9))
    }
    intercept[IllegalArgumentException] {
      Dedup.splitThresholds(Seq(5e-9, 1.0 - 5e-9)) // first cut rounds to 0
    }
  }

  test("a custom ratio vector partitions the corpus with the same leak-freedom") {
    val split = Dedup.ddSplitWith(spark, sfDir,
      Seq(0.5, 0.5), Seq("train", "holdout")).select("doc_id", "split")
    val members = Dedup.ddCluster(spark, sfDir).select("doc_id", "cluster_id")
    val leaky = members.join(split, "doc_id")
      .groupBy("cluster_id").agg(countDistinct("split").as("n"))
      .where(col("n") > 1).count()
    assert(leaky === 0L)
    assert(split.select("split").distinct().count() === 2L)
  }
}
