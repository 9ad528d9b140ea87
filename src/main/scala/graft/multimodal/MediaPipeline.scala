package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media payload row: the binary column is the opaque encoded asset
  * (image/audio/video bytes); metadata travels alongside, typed.
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Features produced by the decode step. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    frames: Int,
    checksum: Long)

/** Multimodal-column plumbing: image/audio/video ride through the engine
  * as opaque `binary` columns; decode/feature-extraction runs
  * partition-local via mapPartitions so a real codec can amortize
  * per-partition setup (model load, decoder init) across rows — the
  * Scala analogue of a batched Pandas UDF.
  *
  * The decoder itself is a clearly-marked deterministic STUB (no media
  * codecs exist in this environment); everything around it — schema,
  * typed Dataset plumbing, partition-local batching, downstream
  * relational use of the features — is real and tested. At 100 TB:
  * payloads stay columnar parquet binary, scans prune to the payload +
  * key columns only, and decode parallelism is input-partition
  * parallelism (no shuffle until the feature aggregate).
  */
object MediaPipeline {

  /** STUB decoder — deterministic function of the payload bytes standing
    * in for a real image/audio decode. A production deployment swaps
    * this body for e.g. a JNI codec call; the signature and the
    * pipeline around it do not change.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val n = payload.length
    var crc = 0L
    var i = 0
    while (i < n) { crc = (crc * 31 + (payload(i) & 0xff)) & 0xffffffffL; i += 1 }
    (32 + n % 97, 32 + (n * 7) % 89, 1 + n % 16, crc)
  }

  /** Decode + feature-extract, partition-local. The `mapPartitions`
    * boundary is where a real pipeline initializes its decoder once per
    * partition (not once per row).
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (w, h, f, crc) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, f, crc)
      }
    }
  }

  /** documents.text cast to binary as a stand-in media corpus — gives the
    * pipeline a real parquet-backed input of varying byte lengths.
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        col("source").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** End-to-end: corpus → decode → per-kind feature statistics (the
    * downstream relational shape: features are ordinary columns).
    */
  def kindStats(spark: SparkSession, dir: String): DataFrame = {
    extractFeatures(spark, fromDocuments(spark, dir))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        max("width").as("max_width"),
        min("height").as("min_height"))
      .orderBy("kind")
  }
}
