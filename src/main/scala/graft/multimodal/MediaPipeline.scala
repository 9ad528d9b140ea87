package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media payload row: the binary column is the opaque encoded asset
  * (image/audio/video bytes); metadata travels alongside, typed.
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** One sampled frame of a media asset ([[MediaPipeline.sampleFrames]]). */
case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

/** Features produced by the decode step. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    frames: Int,
    checksum: Long)

/** Features produced by the REAL audio decode ([[MediaPipeline.decodeAudio]]). */
case class AudioFeatures(
    media_id: Long,
    sample_rate: Int,
    channels: Int,
    n_frames: Long,
    peak: Int,
    n_bytes: Int)

/** Multimodal-column plumbing: image/audio/video ride through the engine
  * as opaque `binary` columns; decode/feature-extraction runs
  * partition-local via mapPartitions so a real codec can amortize
  * per-partition setup (model load, decoder init) across rows — the
  * Scala analogue of a batched Pandas UDF.
  *
  * The decoder tries a REAL image decode first (`javax.imageio` — JDK
  * built-in readers: PNG, BMP, GIF, JPEG, WBMP, TIFF) and reads the true
  * width/height/frame-count from the header without materializing pixel
  * rasters; uncompressed PCM audio decodes for REAL too
  * (`javax.sound.sampled`, [[decodeAudio]] — WAV needs no codec);
  * payloads no JDK reader recognizes (compressed audio/video — no codecs
  * in this environment) fall back to a clearly-marked deterministic STUB.
  * Everything around the decode — schema, typed Dataset plumbing,
  * partition-local batching, downstream relational use of the features —
  * is identical on both paths. At 100 TB: payloads stay columnar parquet
  * binary, scans prune to the payload + key columns only, and decode
  * parallelism is input-partition parallelism (no shuffle until the
  * feature aggregate).
  */
object MediaPipeline {

  /** Payload checksum, shared by both decode paths (stands in for a
    * content fingerprint the dedup stage would key on).
    */
  def payloadChecksum(payload: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < payload.length) { crc = (crc * 31 + (payload(i) & 0xff)) & 0xffffffffL; i += 1 }
    crc
  }

  /** Strict magic-number sniff: only hand payloads to ImageIO when the
    * prefix is an unambiguous image signature. ImageIO's own sniffers
    * are looser — its BMP reader accepts anything starting with the two
    * ASCII bytes 'BM', perfectly plausible at the start of real document
    * text — and a garbage header that happened to parse would yield
    * real-decoder dims where the pipeline (and the oracle) expect the
    * stub. For BMP the two printable magic bytes are corroborated with
    * the DIB header: a known header-size constant whose upper three
    * bytes are NUL (text payloads contain no NULs) and planes == 1.
    */
  def looksLikeImage(p: Array[Byte]): Boolean = {
    if (p.length < 8) return false
    def u(i: Int) = p(i) & 0xff
    val png = u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
      u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a && u(7) == 0x0a
    val jpeg = u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff
    val gif = u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8' &&
      (u(4) == '7' || u(4) == '9') && u(5) == 'a'
    val tiff = (u(0) == 'I' && u(1) == 'I' && u(2) == 0x2a && u(3) == 0) ||
      (u(0) == 'M' && u(1) == 'M' && u(2) == 0 && u(3) == 0x2a)
    val bmp = p.length >= 54 && u(0) == 'B' && u(1) == 'M' && {
      val dib = u(14) | (u(15) << 8) | (u(16) << 16) | (u(17) << 24)
      val planes = u(26) | (u(27) << 8)
      (dib == 40 || dib == 52 || dib == 56 || dib == 108 || dib == 124) && planes == 1
    }
    png || jpeg || gif || tiff || bmp
  }

  /** Real image decode via `javax.imageio`: header-only — asks the
    * matched reader for dimensions and frame count, never decodes pixel
    * data, so cost is O(header) not O(pixels). Returns None when the
    * payload carries no unambiguous image magic ([[looksLikeImage]]) or
    * no JDK reader recognizes it (then the stub takes over).
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (!looksLikeImage(payload)) return None
    try {
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the latter defaults to a FileCacheImageInputStream that creates
      // and deletes a temp file on local disk per payload — hidden
      // per-row I/O in a path documented as O(header). The payload is
      // already fully in memory.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        // Skip the WBMP reader: the format has no magic number and its
        // canDecodeInput heuristic claims arbitrary binary starting with
        // 0x00 bytes (common in real audio/video containers), returning
        // garbage dimensions instead of falling through to the stub.
        var picked: javax.imageio.ImageReader = null
        while (picked == null && readers.hasNext) {
          val c = readers.next()
          if (c.getFormatName.equalsIgnoreCase("wbmp")) c.dispose()
          else picked = c
        }
        if (picked == null) None
        else {
          val r = picked
          try {
            r.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val frames =
              try { val n = r.getNumImages(true); if (n > 0) n else 1 }
              catch { case _: Exception => 1 }
            Some((w, h, frames, payloadChecksum(payload)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Minimal valid 24-bit uncompressed BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER + zeroed pixel rows, rows padded to 4 bytes).
    * Exists so the REAL `javax.imageio` decode path can be exercised —
    * and oracle-checked — on payloads whose dimensions are a pure
    * function of table data: the file size is 54 + height·rowBytes with
    * rowBytes = ⌈3·width/4⌉·4, arithmetic DuckDB replays exactly.
    */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowBytes = (width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * height
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24) // planes, bits-per-pixel
      .putInt(0).putInt(dataSize) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi; palette unused
    b.array() // pixel rows stay zeroed — header-only decode ignores them
  }

  /** [[encodeBmp]] with DETERMINISTIC PATTERNED pixels — (r, g, b) at
    * file position (x, y) are fixed mod-251 linear forms of the
    * coordinates — so pixel-DATA reads (not just header fields) can go
    * under the oracle: any whole-image statistic that is
    * orientation-invariant (sum, min, max over channel values) has a
    * closed replay over the coordinate grid, BMP bottom-up row order
    * notwithstanding.
    */
  def encodeBmpPattern(width: Int, height: Int): Array[Byte] = {
    val header = encodeBmp(width, height)
    val rowBytes = (width * 3 + 3) / 4 * 4
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val off = 54 + y * rowBytes + x * 3
        header(off) = ((x * 5 + y * 17) % 251).toByte // blue
        header(off + 1) = ((x * 11 + y * 3) % 251).toByte // green
        header(off + 2) = ((x * 7 + y * 13) % 251).toByte // red
        x += 1
      }
      y += 1
    }
    header
  }

  /** FULL-decode pixel statistics: `ImageIO.read` (whole raster, not
    * the header probe), then sum/min/max over every channel value.
    * Orientation-invariant, so the BMP's bottom-up storage cannot
    * affect the result.
    */
  def pixelStats(bytes: Array[Byte]): Option[(Int, Int, Long, Int, Int)] =
    try {
      // MemoryCacheImageInputStream, same reason as [[decodeImage]] /
      // [[resizeImage]]: the bare ImageIO.read(InputStream) form spools
      // every payload through a DISK-backed FileCacheImageInputStream
      // (ImageIO.getUseCache defaults true) — a temp-file
      // create/write/delete cycle per row whose tmpdir metadata + random
      // temp-name generation serialize under concurrency (this query
      // measured 6× SLOWER at 32 cores than at 8). The payload is
      // already in memory; decode it there.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read(ImageInputStream) closes the stream on success but
      // not on a null return — swallow the double-close (see resizeImage)
      val img =
        try javax.imageio.ImageIO.read(iis)
        finally { try iis.close() catch { case _: java.io.IOException => () } }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // one bulk getRGB per row instead of one call per pixel: the
        // same default-sRGB conversion path, identical values, without
        // w·h ColorModel dispatches
        val row = new Array[Int](w)
        var sum = 0L
        var mn = 255
        var mx = 0
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
            sum += r + g + b
            mn = math.min(mn, math.min(r, math.min(g, b)))
            mx = math.max(mx, math.max(r, math.max(g, b)))
            x += 1
          }
          y += 1
        }
        Some((w, h, sum, mn, mx))
      }
    } catch { case _: Exception => None }

  /** Minimal animated GIF via the JDK's sequence writer — the
    * multi-frame analog of [[encodeBmp]]. Frame pixels are solid fills
    * (deterministic), but GIF's LZW coding makes the byte size
    * non-replayable arithmetic, so oracles built on it assert the
    * DECODED width/height/frame-count (pure functions of table data),
    * not the payload size. Exists so the real `getNumImages` multi-frame
    * path of [[decodeImage]] is exercised — and gated — on real data.
    */
  def encodeGif(width: Int, height: Int, frames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0,
      s"bad gif spec ${width}x$height x$frames")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var i = 0
      while (i < frames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try {
          g.setColor(new java.awt.Color(i * 40 % 256, 80, 160))
          g.fillRect(0, 0, width, height)
        } finally g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        i += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Minimal canonical PCM WAV (44-byte RIFF/fmt/data header + 16-bit
    * little-endian samples) — the audio analog of [[encodeBmp]]. Sample
    * data is a full-scale square wave alternating +amplitude/−amplitude
    * per frame (all channels identical), so the decoded PEAK amplitude is
    * a pure function of the encode parameters: an oracle asserting it
    * proves the decoder read the PCM payload, not just the header.
    * File size is 44 + nFrames·channels·2 — arithmetic DuckDB replays.
    */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int, amplitude: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames > 0,
      s"bad wav spec rate=$sampleRate ch=$channels frames=$nFrames")
    require(amplitude >= 0 && amplitude <= Short.MaxValue, s"bad amplitude $amplitude")
    val blockAlign = channels * 2
    val dataSize = nFrames * blockAlign
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort).putShort(16) // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames) {
      val v = (if (i % 2 == 0) amplitude else -amplitude).toShort
      var c = 0
      while (c < channels) { b.putShort(v); c += 1 }
      i += 1
    }
    b.array()
  }

  /** Strict WAV sniff (same rationale as [[looksLikeImage]]): RIFF tag +
    * WAVE form type — 8 magic bytes a text payload will not carry.
    */
  def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 44 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** REAL audio decode via the JDK's `javax.sound.sampled` (no external
    * codecs needed for uncompressed PCM): parses the WAV header through
    * `AudioSystem.getAudioInputStream`, reads the full PCM stream, and
    * returns (sampleRate, channels, frameCount, peakAmplitude). The peak
    * is computed over the DECODED 16-bit samples, so a decoder that
    * skipped the data chunk, misread endianness, or miscounted channels
    * produces a different value. None when the payload carries no WAV
    * magic or the JDK cannot parse it (callers fall back to the stub) —
    * this replaces the stub path for uncompressed audio; compressed
    * codecs (MP3/AAC) remain stubbed, absent from the JDK.
    */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long, Int)] = {
    if (!looksLikeWav(payload)) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val frames = ais.getFrameLength
        val buf = new Array[Byte](8192)
        var peak = 0
        var carry = -1 // low byte of a sample split across read() calls
        var n = ais.read(buf)
        while (n > 0) {
          var i = 0
          if (carry >= 0 && n >= 1) {
            val s = ((buf(0) << 8) | carry).toShort
            val a = math.abs(s.toInt); if (a > peak) peak = a
            carry = -1; i = 1
          }
          while (i + 1 < n) {
            // PCM_SIGNED 16-bit little-endian: low byte first
            val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
            val a = math.abs(s.toInt); if (a > peak) peak = a
            i += 2
          }
          if (i < n) carry = buf(i) & 0xff
          n = ais.read(buf)
        }
        Some((fmt.getSampleRate.toInt, fmt.getChannels, frames, peak))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Decode + feature-extract for audio assets, partition-local — the
    * audio counterpart of [[extractFeatures]]: same typed mapPartitions
    * shape, real `javax.sound.sampled` decode. Rows that are not
    * decodable WAV are dropped (a production pipeline would route them
    * to a quarantine sink at the same schema).
    */
  def extractAudioFeatures(
      spark: SparkSession, media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudio(r.payload).map { case (rate, ch, frames, peak) =>
          AudioFeatures(r.media_id, rate, ch, frames, peak, r.payload.length)
        }
      }
    }
  }

  /** STUB decoder — deterministic function of the payload bytes standing
    * in for the codecs this environment lacks (audio/video). A production
    * deployment swaps this body for e.g. a JNI codec call; the signature
    * and the pipeline around it do not change.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val n = payload.length
    (32 + n % 97, 32 + (n * 7) % 89, 1 + n % 16, payloadChecksum(payload))
  }

  /** Full decode: real image readers first, stub fallback. */
  def decode(payload: Array[Byte]): (Int, Int, Int, Long) =
    decodeImage(payload).getOrElse(decodeStub(payload))

  /** Decode + feature-extract, partition-local. The `mapPartitions`
    * boundary is where a real pipeline initializes its decoder once per
    * partition (not once per row) — `ImageIO` readers are looked up per
    * payload via the registry, which is JVM-static (loaded once).
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (w, h, f, crc) = decode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, f, crc)
      }
    }
  }

  /** REAL image resize with the JDK only: rasterize via `ImageIO.read`,
    * scale with a Graphics2D blit, re-encode as 24-bit BMP. None when
    * the payload is not a decodable image (callers fall back to a stub
    * or drop the row). Unlike [[decodeImage]] this IS O(pixels) — it is
    * the per-row compute stage a thumbnailing pipeline runs after
    * decode, not a metadata probe.
    */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (w <= 0 || h <= 0 || payload.length < 8) return None
    try {
      // Memory-cached image streams on BOTH sides, same reason as
      // [[decodeImage]]: bare ImageIO.read(InputStream)/write(…,
      // OutputStream) spool through a DISK-backed cache file per call
      // (ImageIO.getUseCache defaults true) — 2 temp-file
      // create/write/delete cycles per row, which turns this per-row
      // compute stage IO-bound on hosts with slow tmp metadata (it
      // measured 10× slower for 12 KB images). The payloads are already
      // in memory; cache them there.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // ImageIO.read(ImageInputStream) closes the stream itself on a
      // successful decode (but NOT on a null return), and a second
      // close throws — so the cleanup close must swallow that case
      val src =
        try javax.imageio.ImageIO.read(iis)
        finally { try iis.close() catch { case _: java.io.IOException => () } }
      if (src == null) None
      else {
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        val ok =
          try {
            val writer = javax.imageio.ImageIO
              .getImageWritersByFormatName("bmp").next()
            writer.setOutput(ios)
            try { writer.write(dst); true } finally writer.dispose()
          } finally ios.close()
        if (ok) Some(bos.toByteArray) else None
      }
    } catch { case _: Exception => None }
  }

  /** Sample every `everyN`th frame of each asset into its own row —
    * the fan-out stage a video pipeline runs before per-frame feature
    * extraction. The Spark-side contract is real: one input row becomes
    * ⌈frames/everyN⌉ typed rows, partition-local, no shuffle until the
    * consumer keys on something. The frame SPLIT is the stub codec and
    * deliberately calls [[decodeStub]] directly — frames-as-byte-slices
    * is a stub-codec concept, and routing through the real-image sniff
    * here would let a payload that happens to parse as an image diverge
    * from the oracle's stub arithmetic (frame i's payload is the i-th of
    * `frames` near-equal byte slices — deterministic, oracle-replayable);
    * a production deployment swaps the slice for a real demuxer emitting
    * encoded frames at the same schema.
    */
  def sampleFrames(
      spark: SparkSession, media: Dataset[MediaRow], everyN: Int): Dataset[FrameRow] = {
    import spark.implicits._
    require(everyN > 0, s"everyN must be positive, got $everyN")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        val frames = decodeStub(r.payload)._3
        (0 until frames by everyN).iterator.map { i =>
          val from = (i.toLong * n / frames).toInt
          val until = ((i + 1).toLong * n / frames).toInt
          FrameRow(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }

  /** documents.text cast to binary as a stand-in media corpus — gives the
    * pipeline a real parquet-backed input of varying byte lengths.
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // FanOut before the typed stages: decode/resize/frame-sample are the
    // CPU-heavy per-row phases, and a single-file table would otherwise
    // run them all on one core (no-op at production split counts)
    graft.core.FanOut(spark.read.parquet(s"$dir/documents.parquet"))
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
