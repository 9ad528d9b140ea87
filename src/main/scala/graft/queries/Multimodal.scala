package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata alongside. No image/audio codecs exist in
  * this container, so the decode step is a clearly-marked deterministic
  * STUB — the Spark-side contract (schema, batch shape, partition-local
  * decode) is the real deliverable and is exercised end-to-end.
  *
  * The full typed pipeline (binary → mapPartitions decode → feature
  * struct) lives in [[graft.multimodal.MediaPipeline]]; this module
  * exposes the expression-level metadata path so the DuckDB oracle can
  * replay it.
  */
object Multimodal extends QueryModule {

  /** Payload metadata extraction over binary columns. `text` stands in
    * for the media payload (cast to bytes); width/height/frames come
    * from the STUB decoder (deterministic function of the byte length —
    * a real deployment swaps in an image/audio codec at the same
    * schema). Pure per-row expressions: scales linearly, no shuffle.
    */
  def mmMeta(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .select(
        col("doc_id"),
        col("source"),
        octet_length(col("payload")).as("n_bytes"),
        (lit(32) + pmod(octet_length(col("payload")), lit(97))).as("stub_width"),
        (lit(32) + pmod(octet_length(col("payload")) * 7, lit(89))).as("stub_height"),
        (lit(1) + pmod(octet_length(col("payload")), lit(16))).as("stub_frames"))
      .orderBy("doc_id")

  /** Per-source media stats over the stub-decoded features — the shape
    * of a corpus-level media audit (group on a low-cardinality key).
    */
  def mmSourceStats(s: SparkSession, dir: String): DataFrame =
    mmMeta(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        max("stub_width").as("max_width"))
      .orderBy("source")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _),
    "mm_source_stats" -> (mmSourceStats _),
  )

  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, source,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | CAST(32 + octet_length(encode(text)) % 97 AS INTEGER) AS stub_width,
        | CAST(32 + (octet_length(encode(text)) * 7) % 89 AS INTEGER) AS stub_height,
        | CAST(1 + octet_length(encode(text)) % 16 AS INTEGER) AS stub_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_source_stats" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | CAST(max(32 + octet_length(encode(text)) % 97) AS INTEGER) AS max_width
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
  )
}
