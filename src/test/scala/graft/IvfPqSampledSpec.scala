package graft

import org.apache.spark.sql.functions._
import graft.queries.{IvfPq, KmeansIvf, Similarity}

/** Sampled-training IVFADC: pins that (a) the persisted coarse model
  * is EXACTLY the model trained on the independently-computed
  * deterministic sample — nothing outside the cap leaked into
  * training; (b) search still covers the full corpus under the
  * probe restriction (every candidate's cell is among the query's
  * probed cells, replayed independently in plain JVM arithmetic).
  */
class IvfPqSampledSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sampled IVFADC: model provenance and probe restriction") {
    import spark.implicits._
    val out = IvfPq.simIvfPqSampled(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))

    // (a) model provenance: recompute the 128 smallest sample coins in
    // plain JVM md5, retrain on exactly that subset, require the
    // persisted table bit-equal
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val sampleIds = all.map(_._1)
      .sortBy(id => (md5hex(s"graft-ivfpq-sample|$id"), id))
      .take(IvfPq.SampleCap).toSet
    assert(sampleIds.size === IvfPq.SampleCap)
    val sampleDf = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id").isInCollection(sampleIds))
      .select("vec_id", "embedding")
    val retrained = KmeansIvf
      .train(sampleDf, Similarity.KmeansK, Similarity.KmeansIters,
        seedSmallest = true)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val persisted = spark.read.parquet(IvfPq.SampledCentroidDir)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(persisted === retrained,
      "persisted coarse model must equal training on the sample alone")

    // (b) probe restriction, replayed independently: JVM argmin-3
    // distances to the PERSISTED centroids
    val cent = persisted.map { case (cid, c) => (cid, c.toArray) }
    // the engine's exact arithmetic: ordered double left-fold dots,
    // d2 = |v|^2 - 2 v.c + |c|^2 (bit-stable ranking replay)
    def dot(a: Seq[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def d2(a: Seq[Float], c: Array[Float]): Double = {
      val af = a.toArray
      dot(a, af) - 2.0 * dot(a, c) + dot(c.toSeq, c)
    }
    val byId = all.toMap
    for ((q, ranks) <- out.groupBy(_._1)) {
      val probed = cent.map { case (cid, c) => (d2(byId(q), c), cid) }
        .sortBy(identity).take(Similarity.KmeansProbes).map(_._2).toSet
      for ((_, _, _, cell) <- ranks)
        assert(probed.contains(cell), s"query $q scored unprobed cell $cell")
      assert(ranks.map(_._2).sorted.toSeq === (1 to ranks.length),
        "dense ranks from 1")
      assert(ranks.length === 3, s"query $q should fill top-3")
    }
    assert(out.map(_._1).distinct.sorted.toSeq === (0L until 10L))
  }
}
