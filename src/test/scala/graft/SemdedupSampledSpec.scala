package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, KmeansIvf, Similarity}

/** Sampled-training SemDeDup: pins that (a) the persisted centroid
  * table is EXACTLY the model trained on the independently-computed
  * deterministic sample; (b) the dedup decision still covers EVERY
  * vector (one row per corpus vec_id — sampling bounded training, not
  * coverage).
  */
class SemdedupSampledSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sampled SemDeDup: model provenance and full coverage") {
    import spark.implicits._
    val out = Dedup.ddSemdedupSampled(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))

    // (a) model provenance
    val cap = Similarity.TrainSamplePerCell * Dedup.SemdedupK
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
      .train(sampleDf, Dedup.SemdedupK, Dedup.SemdedupIters,
        seedSmallest = true)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val persisted = spark.read.parquet(Dedup.SemdedupSampledCentroidDir)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(persisted === retrained,
      "persisted model must equal training on the sample alone")

    // (b) full coverage: one decision per corpus vector, cells valid
    assert(out.map(_._1).sorted.toSeq === ids.sorted.toSeq,
      "every vector gets exactly one keep/drop decision")
    val cells = persisted.map(_._1).toSet
    for ((id, cell, _) <- out)
      assert(cells.contains(cell), s"vec $id assigned unknown cell $cell")
    // lowest-id vector in any cell is never dropped
    val minByCell = out.groupBy(_._2).map { case (_, rs) => rs.minBy(_._1) }
    for ((id, cell, kept) <- minByCell)
      assert(kept, s"cell $cell minimum id $id must be kept")
  }
}
