package graft

import graft.multimodal.{MediaPipeline, MediaRow}

/** The multimodal plumbing is exercised end-to-end over real parquet:
  * typed Dataset in, partition-local decode, relational features out.
  */
class MediaPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("decodeStub is deterministic and in documented ranges") {
    val p = "hello media".getBytes("UTF-8")
    val a = MediaPipeline.decodeStub(p)
    val b = MediaPipeline.decodeStub(p)
    assert(a == b)
    val (w, h, f, crc) = a
    assert(w >= 32 && w < 129 && h >= 32 && h < 121 && f >= 1 && f <= 16)
    assert(crc >= 0L)
  }

  test("extractFeatures maps every row and keeps ids") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "img", Array[Byte](1, 2, 3)),
      MediaRow(2L, "aud", Array[Byte]()),
      MediaRow(3L, "vid", Array.fill[Byte](1000)(7)))
    val feats = MediaPipeline.extractFeatures(spark, spark.createDataset(rows)).collect()
    assert(feats.map(_.media_id).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(feats.forall(f => f.n_bytes >= 0 && f.frames >= 1))
    val empty = feats.find(_.media_id == 2L).get
    assert(empty.n_bytes == 0 && empty.checksum == 0L)
  }

  test("kindStats runs over parquet-backed corpus") {
    val stats = MediaPipeline.kindStats(spark, sfDir).collect()
    assert(stats.nonEmpty)
    assert(stats.map(_.getLong(1)).sum == 500L) // all docs accounted for
  }

  test("features agree with the mm_meta expression path") {
    import org.apache.spark.sql.functions.col
    val viaDs = MediaPipeline.extractFeatures(spark, MediaPipeline.fromDocuments(spark, sfDir))
      .select(col("media_id"), col("width"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaExpr = graft.queries.Multimodal.mmMeta(spark, sfDir)
      .select(col("doc_id"), col("stub_width"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaDs == viaExpr)
  }
}
