package graft

import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** The end-to-end cleaning manifest: a closed-form fixture pinning the
  * reason cascade (exact_dup beats near_dup beats low_quality beats
  * ok, including the branch the all-unique gate corpus never fires),
  * plus gate-corpus consistency with the separately-oracled component
  * queries.
  */
class ManifestSpec extends SparkSpec {

  private val good = (1 to 10).map(i => s"w$i").mkString(" ")   // q = 0.6
  private val good8 = (1 to 8).map(i => s"v$i").mkString(" ")   // q = 0.58
  private val junk = Seq.fill(10)("a").mkString(" ")            // q = 0.15

  test("closed-form fixture: the full cascade, all four reasons") {
    import spark.implicits._
    val docs = Seq(
      (0L, good),  // cluster keeper (quality tie with 1 -> min doc_id)
      (1L, good),  // exact copy of 0 AND clustered: exact_dup wins
      (2L, good8), // near-dup member, lower quality -> near_dup
      (3L, junk),  // unclustered, below the floor -> low_quality
      (4L, good + " extra")) // unclustered, fine -> ok
      .toDF("doc_id", "text")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.manifestOf(docs, clusters).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSeq
    assert(got === Seq(
      (0L, "keep", "ok", 0.6),
      (1L, "drop", "exact_dup", 0.6),
      (2L, "drop", "near_dup", 0.58),
      (3L, "drop", "low_quality", 0.15),
      (4L, "keep", "ok", 0.61)))
  }

  test("floor boundary: quality exactly at the floor is kept") {
    import spark.implicits._
    // 0.5*min(1, 5/50) + 0.5*1 = 0.55 == floor -> NOT below, kept
    val docs = Seq((0L, (1 to 5).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val clusters = spark.emptyDataset[(Long, Long)]
      .toDF("doc_id", "cluster_id")
    val got = Dedup.manifestOf(docs, clusters).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((0L, "keep", "ok")))
  }

  test("gate corpus: manifest agrees with the component queries") {
    val sfDir = "/root/testdata/sf0.001"
    val m = Dedup.ddManifest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toList
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(m.size === docs.count(), "one manifest row per document")
    // the near_dup set is exactly cluster membership minus keep-best
    val clusters = Dedup.ddCluster(spark, sfDir)
    val keeps = Dedup.ddKeepBest(spark, sfDir)
      .select("keep_id").collect().map(_.getLong(0)).toSet
    val members = clusters.select("doc_id").collect().map(_.getLong(0)).toSet
    val nearDropped = m.filter(_._3 == "near_dup").map(_._1).toSet
    assert(nearDropped === (members -- keeps))
    // no exact dups exist in the corpus; both other drop reasons fire
    assert(m.count(_._3 == "exact_dup") === 0)
    assert(m.count(_._3 == "low_quality") > 0, "floor must bite at gate")
    assert(m.count(_._2 == "keep") > 0)
    // decision is exactly reason == ok
    assert(m.forall { case (_, d, r) => (d == "keep") == (r == "ok") })
  }
}
