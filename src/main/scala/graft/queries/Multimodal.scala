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

  /** REAL-decode path under the oracle: build a valid BMP per document
    * row whose dimensions are a pure function of doc_id
    * (width = 1 + doc_id mod 64, height = 1 + 7·doc_id mod 64), push it
    * through [[graft.multimodal.MediaPipeline.extractFeatures]] — the
    * same typed mapPartitions pipeline production media uses, with the
    * real `javax.imageio` header decode, NOT the stub — and emit the
    * decoded dims + file size. DuckDB replays the BMP size arithmetic
    * (54-byte header + height·⌈3·width/4⌉·4 pixel bytes), so a decode
    * that returned garbage, swapped endianness, or fell through to the
    * stub hash-mismatches. Construction and decode are both per-row
    * expressions over the scan — linear, shuffle-free until the sort.
    */
  def mmDecodeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.{MediaPipeline, MediaRow}
    val media = graft.core.FanOut(Tables(s, dir).documents.select(col("doc_id"))).as[Long]
      .map { id =>
        val w = (id % 64 + 1).toInt
        val h = (id * 7 % 64 + 1).toInt
        MediaRow(id, "bmp", MediaPipeline.encodeBmp(w, h))
      }
    MediaPipeline.extractFeatures(s, media)
      .select(col("media_id").as("doc_id"), col("n_bytes"),
        col("width"), col("height"), col("frames"))
      .orderBy("doc_id")
  }

  /** Frame sampling under the oracle: every 2nd frame of each asset
    * through [[graft.multimodal.MediaPipeline.sampleFrames]] — the
    * typed one-row-per-frame fan-out a video pipeline feeds to
    * per-frame feature extraction. DuckDB replays the stub codec's
    * frame count and byte-slice arithmetic exactly.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.MediaPipeline
    MediaPipeline.sampleFrames(s, MediaPipeline.fromDocuments(s, dir), everyN = 2)
      .toDF()
      .select(col("media_id").as("doc_id"), col("frame_idx"),
        octet_length(col("frame")).as("n_frame_bytes"))
      .orderBy("doc_id", "frame_idx")
  }

  /** REAL multi-frame decode under the oracle: an animated GIF per row
    * (1–4 solid frames, dims and frame count pure doc_id arithmetic)
    * through the same [[graft.multimodal.MediaPipeline.extractFeatures]]
    * pipeline — exercising `getNumImages > 1`, the one real-decoder path
    * mm_decode_real's single-frame BMPs cannot reach. The GIF's LZW
    * byte size is not replayable arithmetic, so the oracle gates the
    * DECODED dims + frame count only: a decode that fell to the stub,
    * miscounted frames, or misread the logical screen hash-mismatches.
    */
  def mmGifFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.{MediaPipeline, MediaRow}
    val media = graft.core.FanOut(Tables(s, dir).documents.select(col("doc_id"))).as[Long]
      .map { id =>
        val w = (id % 16 + 1).toInt
        val h = (id * 3 % 16 + 1).toInt
        val f = (id % 4 + 1).toInt
        MediaRow(id, "gif", MediaPipeline.encodeGif(w, h, f))
      }
    MediaPipeline.extractFeatures(s, media)
      .select(col("media_id").as("doc_id"),
        col("width"), col("height"), col("frames"))
      .orderBy("doc_id")
  }

  /** REAL resize under the oracle: encode a BMP per row (mm_decode_real
    * dims), rescale it for real (`ImageIO.read` → raster blit → BMP
    * re-encode — O(pixels), the thumbnailing stage), then RE-DECODE the
    * output and emit its dims + byte size. A resize that produced wrong
    * geometry, a corrupt file, or fell through would hash-mismatch:
    * DuckDB replays the target-dim formulas and the BMP size arithmetic
    * the re-encoded output must obey.
    */
  def mmResizeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    graft.core.FanOut(Tables(s, dir).documents.select(col("doc_id"))).as[Long]
      .map { id =>
        val src = MediaPipeline.encodeBmp((id % 64 + 1).toInt, (id * 7 % 64 + 1).toInt)
        val w2 = (id * 3 % 32 + 1).toInt
        val h2 = (id * 5 % 32 + 1).toInt
        val out = MediaPipeline.resizeImage(src, w2, h2)
          .getOrElse(sys.error(s"resize failed for doc $id"))
        val (dw, dh, _, _) = MediaPipeline.decodeImage(out)
          .getOrElse(sys.error(s"re-decode failed for doc $id"))
        (id, dw, dh, out.length)
      }
      .toDF("doc_id", "width", "height", "n_bytes")
      .orderBy("doc_id")
  }

  /** REAL audio decode under the oracle: synthesize a canonical PCM WAV
    * per document row — sample rate, channels, frame count, and square-
    * wave amplitude all pure doc_id arithmetic — and push it through
    * [[graft.multimodal.MediaPipeline.extractAudioFeatures]], the typed
    * mapPartitions pipeline with the REAL `javax.sound.sampled` decode
    * (JDK-built-in; uncompressed PCM needs no codec). The oracle replays
    * the spec arithmetic against what the decoder READS: header fields
    * (rate/channels/frames via `AudioSystem`), the peak amplitude over
    * the decoded 16-bit samples (proves the data chunk was actually
    * read, not just the header), the floor-division duration, and the
    * 44 + frames·channels·2 file size. Per-row expressions over the
    * scan — linear, shuffle-free until the sort.
    */
  def mmAudioReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.{MediaPipeline, MediaRow}
    val rates = Array(8000, 11025, 16000, 22050, 44100)
    val media = graft.core.FanOut(Tables(s, dir).documents.select(col("doc_id"))).as[Long]
      .map { id =>
        val rate = rates((id % 5).toInt)
        val ch = (id % 2 + 1).toInt
        val frames = (id % 400 + 50).toInt
        val amp = (id % 30000 + 1).toInt
        MediaRow(id, "wav", MediaPipeline.encodeWav(rate, ch, frames, amp))
      }
    MediaPipeline.extractAudioFeatures(s, media)
      .select(col("media_id").as("doc_id"),
        col("sample_rate"), col("channels"), col("n_frames"), col("peak"),
        expr("n_frames * 1000L div sample_rate").as("duration_ms"),
        col("n_bytes"))
      .orderBy("doc_id")
  }

  /** Where [[mmBinarySource]] stages its files — per-run unique,
    * interpolated into the oracle SQL, read back by DuckDB after this
    * JVM exits (same persistence contract as the ANN model dirs).
    */
  private[graft] lazy val BinarySourceDir = java.nio.file.Files
    .createTempDirectory("graft_mm_binfiles_").toString

  /** The `binaryFile` SOURCE under the oracle — the ingestion format a
    * media pipeline actually starts from (a directory of raw image
    * files, not a pre-built parquet column): stage one deterministic
    * BMP per document (the [[mmDecodeReal]] dims, written from the
    * EXECUTORS via foreachPartition — no driver-side loop; in a
    * cluster the same code writes to DFS), then read the directory
    * back with `spark.read.format("binaryFile")` and emit each file's
    * name, source-reported length, and content digest. DuckDB replays
    * via `read_blob` over the same directory — a file the source
    * missed, a truncated read, or a length/stat mismatch hash-fails.
    * The digest is md5 OVER THE HEX ENCODING (both engines render
    * uppercase hex; DuckDB's md5 does not accept blobs directly).
    * Capped at 200 files so the fixture stays a directory listing, not
    * a corpus — the source's scaling (one task per file group,
    * binaryFile's maxPartitionBytes packing) is Spark-native.
    */
  def mmBinarySource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    // The executors write through java.nio straight into a driver-created
    // temp dir, which is only a shared filesystem in local mode; on a real
    // cluster this fixture would need a DFS stage path (Hadoop FS API).
    // Fail loudly rather than let a multi-node run read a partial listing.
    require(s.sparkContext.isLocal,
      "mm_binary_source stages files via the driver-local filesystem; " +
        "on a cluster, route the stage path through a shared DFS instead")
    val stage = BinarySourceDir
    Tables(s, dir).documents.select(col("doc_id"))
      .where(col("doc_id") < 200).as[Long]
      .foreachPartition { (it: Iterator[Long]) =>
        it.foreach { id =>
          val bytes = MediaPipeline.encodeBmp((id % 64 + 1).toInt,
            (id * 7 % 64 + 1).toInt)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(stage, f"doc_$id%05d.bmp"), bytes)
        }
      }
    s.read.format("binaryFile").load(s"$stage/*.bmp")
      .select(element_at(split(col("path"), "/"), -1).as("fname"),
        col("length"), md5(hex(col("content"))).as("content_md5"))
      .orderBy("fname")
  }

  /** PIXEL-DATA decode under the oracle: patterned BMPs
    * ([[graft.multimodal.MediaPipeline.encodeBmpPattern]] — every
    * channel value a fixed mod-251 linear form of its coordinates)
    * pushed through the REAL full-raster `ImageIO.read`, emitting
    * whole-image sum/min/max over channel values. mm_decode_real pins
    * that HEADERS decode; this pins that the pixel DATA arrives
    * intact — a channel swap cannot hide (sum is channel-invariant but
    * min/max over the per-coordinate forms are not collision-free
    * across a swap at these dims… the real guard is the SUM: any
    * dropped/garbled byte shifts it), and a decoder that returned a
    * blank raster hash-fails. DuckDB replays the closed form over the
    * coordinate grid (orientation-invariant statistics, so BMP's
    * bottom-up row order is immaterial). Dims capped at 16×16 so the
    * per-row decode stays cheap; per-row expressions + mapPartitions,
    * no shuffle until the sort.
    */
  def mmPixelStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    graft.core.FanOut(Tables(s, dir).documents.select(col("doc_id"))).as[Long]
      .map { id =>
        val w = (id % 16 + 1).toInt
        val h = (id * 3 % 16 + 1).toInt
        val (dw, dh, sum, mn, mx) =
          MediaPipeline.pixelStats(MediaPipeline.encodeBmpPattern(w, h))
            .getOrElse(sys.error(s"pixel decode failed for doc $id"))
        (id, dw, dh, sum, mn, mx)
      }
      .toDF("doc_id", "width", "height", "px_sum", "px_min", "px_max")
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_pixel_stats" -> (mmPixelStats _),
    "mm_binary_source" -> (mmBinarySource _),
    "mm_meta" -> (mmMeta _),
    "mm_source_stats" -> (mmSourceStats _),
    "mm_decode_real" -> (mmDecodeReal _),
    "mm_gif_frames" -> (mmGifFrames _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_resize_real" -> (mmResizeReal _),
    "mm_audio_real" -> (mmAudioReal _),
  )

  val oracles: Map[String, String] = Map(
    // the closed pattern replayed over the coordinate grid; statistics
    // are orientation-invariant so row order is immaterial
    "mm_pixel_stats" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 16 + 1 AS INTEGER) AS w,
        |    CAST(doc_id * 3 % 16 + 1 AS INTEGER) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    (x * 7 + y * 13) % 251 AS r,
        |    (x * 11 + y * 3) % 251 AS g,
        |    (x * 5 + y * 17) % 251 AS b
        |  FROM d, LATERAL unnest(range(0, w)) u(x), LATERAL unnest(range(0, h)) v(y))
        |SELECT doc_id, max(w) AS width, max(h) AS height,
        |  CAST(sum(r + g + b) AS BIGINT) AS px_sum,
        |  CAST(min(least(r, least(g, b))) AS INTEGER) AS px_min,
        |  CAST(max(greatest(r, greatest(g, b))) AS INTEGER) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // read_blob over the directory the engine staged; digest over the
    // (uppercase) hex rendering in both engines
    "mm_binary_source" ->
      s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
         | CAST(size AS BIGINT) AS length,
         | md5(hex(content)) AS content_md5
         |FROM read_blob('$BinarySourceDir/*.bmp')
         |ORDER BY fname""".stripMargin,
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
    // Replays the stub codec's frame count (1 + n mod 16) and the
    // near-equal byte-slice arithmetic (frame i = bytes
    // [i*n/frames, (i+1)*n/frames), floor division)
    "mm_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |    1 + octet_length(encode(text)) % 16 AS frames
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, n, frames, unnest(range(0, frames, 2)) AS frame_idx
        |  FROM d
        |)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST((frame_idx + 1) * n // frames - frame_idx * n // frames AS INTEGER) AS n_frame_bytes
        |FROM idx ORDER BY doc_id, frame_idx""".stripMargin,
    // Replays the resize targets (w = 1 + 3·doc_id mod 32,
    // h = 1 + 5·doc_id mod 32) and the BMP geometry the re-encoded
    // output must obey (54-byte header + padded 24-bit rows)
    "mm_resize_real" ->
      """SELECT doc_id,
        | CAST(doc_id * 3 % 32 + 1 AS INTEGER) AS width,
        | CAST(doc_id * 5 % 32 + 1 AS INTEGER) AS height,
        | CAST(54 + (doc_id * 5 % 32 + 1) * (((doc_id * 3 % 32 + 1) * 3 + 3) // 4 * 4) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Replays the GIF spec arithmetic (dims + frame count from doc_id)
    // against what the real ImageIO GIF reader DECODES — byte size is
    // deliberately absent (LZW-coded, not replayable arithmetic)
    "mm_gif_frames" ->
      """SELECT doc_id,
        | CAST(doc_id % 16 + 1 AS INTEGER) AS width,
        | CAST(doc_id * 3 % 16 + 1 AS INTEGER) AS height,
        | CAST(doc_id % 4 + 1 AS INTEGER) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Replays the BMP geometry the Spark side ENCODES, against the dims
    // the real ImageIO reader DECODES — the two agree only if the decode
    // is faithful. rowBytes = ((w*3 + 3) // 4) * 4; file = 54 + h*rowBytes.
    "mm_decode_real" ->
      """SELECT doc_id,
        | CAST(54 + (doc_id * 7 % 64 + 1) * (((doc_id % 64 + 1) * 3 + 3) // 4 * 4) AS INTEGER) AS n_bytes,
        | CAST(doc_id % 64 + 1 AS INTEGER) AS width,
        | CAST(doc_id * 7 % 64 + 1 AS INTEGER) AS height,
        | CAST(1 AS INTEGER) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Replays the WAV spec arithmetic (rate/channels/frames/amplitude
    // from doc_id) against what the REAL javax.sound.sampled decoder
    // READS: header fields, frame count, the peak over decoded 16-bit
    // samples (square wave → peak == amplitude, proving the data chunk
    // was read), floor-division duration, and the canonical 44-byte-
    // header file size.
    "mm_audio_real" ->
      """WITH spec AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 11025 WHEN 2 THEN 16000
        |      WHEN 3 THEN 22050 ELSE 44100 END AS rate,
        |    doc_id % 2 + 1 AS ch,
        |    doc_id % 400 + 50 AS frames,
        |    doc_id % 30000 + 1 AS amp
        |  FROM documents
        |)
        |SELECT doc_id,
        | CAST(rate AS INTEGER) AS sample_rate,
        | CAST(ch AS INTEGER) AS channels,
        | CAST(frames AS BIGINT) AS n_frames,
        | CAST(amp AS INTEGER) AS peak,
        | CAST(frames * 1000 // rate AS BIGINT) AS duration_ms,
        | CAST(44 + frames * ch * 2 AS INTEGER) AS n_bytes
        |FROM spec ORDER BY doc_id""".stripMargin,
  )
}
