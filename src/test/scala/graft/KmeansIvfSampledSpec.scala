package graft

import org.apache.spark.sql.functions._
import graft.queries.{KmeansIvf, Similarity}

/** Sampled-training k-means IVF: pins that the persisted model is
  * EXACTLY the model trained on the independently-computed
  * deterministic sample — nothing outside the cap leaked into
  * training — and that search output keeps the gate's shape (dense
  * top-3 per query over the full query set).
  */
class KmeansIvfSampledSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sampled k-means IVF: model provenance and output shape") {
    import spark.implicits._
    val out = Similarity.simKmeansIvfSampled(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))

    val cap = Similarity.TrainSamplePerCell * Similarity.KmeansK
    val ids = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id").as[Long].collect()
    val sampleIds = ids
      .sortBy(id => (md5hex(s"graft-kmeans-sample|$id"), id))
      .take(cap).toSet
    assert(sampleIds.size === cap)
    val sampleDf = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id").isInCollection(sampleIds))
      .select("vec_id", "embedding")
    val retrained = KmeansIvf
      .train(sampleDf, Similarity.KmeansK, Similarity.KmeansIters,
        seedSmallest = true)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val persisted = spark.read.parquet(Similarity.SampledKmeansCentroidDir)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(persisted === retrained,
      "persisted model must equal training on the sample alone")

    for ((q, ranks) <- out.groupBy(_._1)) {
      assert(ranks.map(_._2).sorted.toSeq === (1 to ranks.length),
        s"query $q: dense ranks from 1")
      assert(ranks.length === 3, s"query $q should fill top-3")
    }
    assert(out.map(_._1).distinct.sorted.toSeq === (0L until 20L))
  }

  test("seedSmallest re-keys seeds densely — vec_id past Int range keeps k centroids") {
    import spark.implicits._
    // ids straddling 2^31: a raw cast("int") would wrap them negative
    // and collide, silently losing centroids. The dense re-key must
    // yield exactly k distinct cids 0..k-1, ordered like the ids.
    val base = (1L << 31) - 2
    val vecs = (0L until 8L)
      .map(i => (base + i * 3, Array.fill(4)((i + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val model = KmeansIvf.train(vecs, k = 4, iters = 1, seedSmallest = true)
      .select("cid").as[Int].collect().sorted.toSeq
    assert(model === Seq(0, 1, 2, 3),
      s"expected dense cids 0..3, got $model")
  }
}
