package graft

import graft.multimodal.{MediaPipeline, MediaRow}

/** The multimodal plumbing is exercised end-to-end over real parquet:
  * typed Dataset in, partition-local decode, relational features out.
  */
class MediaPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def encodeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  test("decodeImage reads real width/height from PNG, BMP, GIF headers") {
    Seq("png", "bmp", "gif").foreach { fmt =>
      val bytes = encodeImage(fmt, 37, 21)
      val decoded = MediaPipeline.decodeImage(bytes)
      assert(decoded.isDefined, s"$fmt not recognized")
      val (w, h, frames, crc) = decoded.get
      assert(w === 37, fmt)
      assert(h === 21, fmt)
      assert(frames === 1, fmt)
      assert(crc === MediaPipeline.payloadChecksum(bytes))
    }
  }

  test("encodeBmp round-trips through the REAL ImageIO decode, not the stub") {
    // asymmetric dims catch endianness/field-order mistakes; width 3 and
    // 5 exercise the 4-byte row padding; 1x1 is the minimal file
    Seq((3, 5), (5, 3), (1, 1), (64, 17)).foreach { case (w, h) =>
      val bytes = MediaPipeline.encodeBmp(w, h)
      val rowBytes = (w * 3 + 3) / 4 * 4
      assert(bytes.length === 54 + h * rowBytes, s"${w}x$h file size")
      val decoded = MediaPipeline.decodeImage(bytes)
      assert(decoded.isDefined, s"${w}x$h not recognized as an image")
      val (dw, dh, frames, _) = decoded.get
      assert(dw === w && dh === h && frames === 1, s"${w}x$h decoded as ${dw}x$dh")
      // and it must NOT equal what the stub would have said (stub dims
      // start at 32 and depend only on byte length) for the small cases
      if (w < 32) assert(MediaPipeline.decodeStub(bytes)._1 !== w)
    }
  }

  test("decodeImage rejects non-image payloads; decode falls back to the stub") {
    val txt = "not an image, just prose long enough to sniff".getBytes("UTF-8")
    assert(MediaPipeline.decodeImage(txt).isEmpty)
    assert(MediaPipeline.decode(txt) === MediaPipeline.decodeStub(txt))
  }

  test("ambiguous magic prefixes in text payloads never reach the real decoder") {
    // ImageIO's BMP sniffer accepts any payload starting with ASCII 'BM'
    // and GIF text prefixes are equally plausible prose; the strict magic
    // gate must route all of these to the stub, matching the oracles.
    val trapdoors = Seq(
      "BMW sales rose sharply this quarter across all dealer regions ok",
      "BM" + "( " * 40, // 'BM' + bytes that could parse as a size
      "GIF animations were popular on the early web, as many recall...",
      "IIx some tab-separated export beginning with two capital letters",
      "MM 2024 ledger: the year opened with strong momentum in accounts")
    trapdoors.foreach { s =>
      val p = s.getBytes("ISO-8859-1")
      assert(!MediaPipeline.looksLikeImage(p), s.take(12))
      assert(MediaPipeline.decodeImage(p).isEmpty, s.take(12))
      assert(MediaPipeline.decode(p) === MediaPipeline.decodeStub(p), s.take(12))
    }
    // while the real signatures still pass the gate
    assert(MediaPipeline.looksLikeImage(MediaPipeline.encodeBmp(9, 4)))
    assert(MediaPipeline.looksLikeImage(encodeImage("png", 5, 5)))
    assert(MediaPipeline.looksLikeImage(encodeImage("gif", 5, 5)))
  }

  test("sampleFrames uses the stub codec even for payloads that ARE real images") {
    import spark.implicits._
    val bmp = MediaPipeline.encodeBmp(16, 16) // real image: 54 + 16*48 = 822 bytes
    val media = spark.createDataset(Seq(MediaRow(9L, "img", bmp)))
    val frames = MediaPipeline.sampleFrames(spark, media, everyN = 1).collect()
    // stub arithmetic (1 + n % 16), NOT the real decoder's frames=1
    assert(frames.length === 1 + bmp.length % 16)
  }

  test("animated GIF: decodeImage counts real frames via getNumImages") {
    Seq(1, 2, 3, 7).foreach { n =>
      val gif = MediaPipeline.encodeGif(12, 9, n)
      assert(MediaPipeline.looksLikeImage(gif), s"gif x$n must pass the magic gate")
      val decoded = MediaPipeline.decodeImage(gif)
      assert(decoded.isDefined, s"gif x$n not recognized")
      val (w, h, frames, _) = decoded.get
      assert(w === 12 && h === 9, s"gif x$n decoded ${w}x$h")
      assert(frames === n, s"gif should report $n frames, got $frames")
    }
  }

  test("extractFeatures carries real decoded dims through the Dataset pipeline") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "img", encodeImage("png", 64, 48)),
      MediaRow(2L, "img", encodeImage("bmp", 120, 80)),
      MediaRow(3L, "txt", "plain text payload".getBytes("UTF-8")))
    val feats = MediaPipeline.extractFeatures(spark, spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width === 64 && feats(1L).height === 48)
    assert(feats(2L).width === 120 && feats(2L).height === 80)
    val stub = MediaPipeline.decodeStub("plain text payload".getBytes("UTF-8"))
    assert(feats(3L).width === stub._1 && feats(3L).height === stub._2)
  }

  test("sampleFrames: everyN=1 reassembles the payload; everyN=2 takes even indices") {
    import spark.implicits._
    val payload = ("x" * 100).getBytes("UTF-8") // stub frames = 1 + 100%16 = 5
    val media = spark.createDataset(Seq(MediaRow(7L, "vid", payload)))
    val all = MediaPipeline.sampleFrames(spark, media, everyN = 1)
      .collect().sortBy(_.frame_idx)
    assert(all.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3, 4))
    assert(all.flatMap(_.frame).toSeq === payload.toSeq) // slices tile the payload
    val sampled = MediaPipeline.sampleFrames(spark, media, everyN = 2)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(sampled.map(_.frame.length).sum === 60) // 3 of 5 20-byte slices
  }

  test("resizeImage really rescales: output decodes at target dims, exact BMP size") {
    Seq(("png", 37, 21, 10, 7), ("bmp", 64, 17, 3, 5)).foreach {
      case (fmt, w, h, w2, h2) =>
        val resized = MediaPipeline.resizeImage(encodeImage(fmt, w, h), w2, h2)
        assert(resized.isDefined, s"$fmt resize failed")
        val (dw, dh, frames, _) = MediaPipeline.decodeImage(resized.get).get
        assert(dw === w2 && dh === h2 && frames === 1, s"$fmt ${dw}x$dh")
        // JDK BMP writer emits the plain 54-byte-header 24-bit layout
        assert(resized.get.length === 54 + h2 * ((w2 * 3 + 3) / 4 * 4), fmt)
    }
    assert(MediaPipeline.resizeImage("not an image".getBytes, 4, 4).isEmpty)
  }

  test("encodeWav round-trips through the REAL javax.sound.sampled decode") {
    // rates spanning the spec table; mono + stereo; 1 frame is minimal;
    // amplitude 0 (silence) and Short.MaxValue are the peak extremes
    val cases = Seq(
      (8000, 1, 1, 0), (11025, 2, 3, 1), (16000, 1, 441, 12345),
      (22050, 2, 50, 30000), (44100, 1, 449, 32767))
    cases.foreach { case (rate, ch, frames, amp) =>
      val wav = MediaPipeline.encodeWav(rate, ch, frames, amp)
      assert(wav.length === 44 + frames * ch * 2, s"$rate/$ch/$frames file size")
      assert(MediaPipeline.looksLikeWav(wav))
      val decoded = MediaPipeline.decodeAudio(wav)
      assert(decoded.isDefined, s"$rate/$ch/$frames not recognized")
      val (dRate, dCh, dFrames, dPeak) = decoded.get
      assert(dRate === rate && dCh === ch && dFrames === frames.toLong,
        s"decoded $dRate/$dCh/$dFrames for $rate/$ch/$frames")
      assert(dPeak === amp, s"peak $dPeak != amplitude $amp — data chunk misread")
    }
  }

  test("decodeAudio rejects non-WAV payloads, including RIFF-prefixed prose") {
    assert(MediaPipeline.decodeAudio("plain text".getBytes("UTF-8")).isEmpty)
    // 'RIFF' alone without the WAVE form type must not pass the sniff
    val riffText = ("RIFF raffle results for the annual office RIFF-off" + " x" * 20)
      .getBytes("ISO-8859-1")
    assert(!MediaPipeline.looksLikeWav(riffText))
    assert(MediaPipeline.decodeAudio(riffText).isEmpty)
    // a real image is not audio either
    assert(MediaPipeline.decodeAudio(MediaPipeline.encodeBmp(9, 4)).isEmpty)
  }

  test("extractAudioFeatures decodes WAV rows and drops non-audio rows") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "wav", MediaPipeline.encodeWav(16000, 2, 100, 7000)),
      MediaRow(2L, "txt", "not audio at all, just forty-odd bytes of prose".getBytes("UTF-8")),
      MediaRow(3L, "wav", MediaPipeline.encodeWav(44100, 1, 250, 1)))
    val feats = MediaPipeline.extractAudioFeatures(spark, spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet === Set(1L, 3L)) // the text row is dropped
    assert(feats(1L).sample_rate === 16000 && feats(1L).channels === 2 &&
      feats(1L).n_frames === 100L && feats(1L).peak === 7000)
    assert(feats(3L).sample_rate === 44100 && feats(3L).channels === 1 &&
      feats(3L).n_frames === 250L && feats(3L).peak === 1)
    assert(feats(1L).n_bytes === 44 + 100 * 2 * 2)
  }

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

  test("pixelStats: full-raster decode equals the closed-form pattern") {
    for ((w, h) <- Seq((1, 1), (3, 5), (16, 16), (13, 7))) {
      val got = MediaPipeline.pixelStats(MediaPipeline.encodeBmpPattern(w, h))
        .getOrElse(fail(s"decode failed for ${w}x$h"))
      val cells = for (x <- 0 until w; y <- 0 until h)
        yield ((x * 7 + y * 13) % 251, (x * 11 + y * 3) % 251, (x * 5 + y * 17) % 251)
      val want = (w, h,
        cells.map { case (r, g, b) => (r + g + b).toLong }.sum,
        cells.map { case (r, g, b) => r.min(g).min(b) }.min,
        cells.map { case (r, g, b) => r.max(g).max(b) }.max)
      assert(got === want, s"${w}x$h: $got != $want")
    }
    // garbage bytes must not decode
    assert(MediaPipeline.pixelStats(Array.fill[Byte](64)(7)).isEmpty)
  }

  test("mm_binary_source: binaryFile reads back every staged file, bytes intact") {
    import org.apache.spark.sql.functions.col
    val rows = graft.queries.Multimodal.mmBinarySource(spark, sfDir).collect()
    assert(rows.length == 200, s"one file per doc_id < 200, got ${rows.length}")
    // every length obeys the BMP geometry of its doc id, and the digest
    // matches an in-JVM recomputation from the same generator
    rows.foreach { r =>
      val (fname, len, md5hex) = (r.getString(0), r.getLong(1), r.getString(2))
      val id = fname.stripPrefix("doc_").stripSuffix(".bmp").toLong
      val bytes = graft.multimodal.MediaPipeline.encodeBmp(
        (id % 64 + 1).toInt, (id * 7 % 64 + 1).toInt)
      assert(len == bytes.length.toLong, s"$fname: source length $len != ${bytes.length}")
      val hex = bytes.map("%02X".format(_)).mkString
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5hex == want, s"$fname: content digest drifted")
    }
  }
}
