package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.core.WordCount

/** Resolves the SURVEY §1 parity warning ("any parity oracle must treat
  * input as bytes/Latin-1, not decoded UTF-8"): `spark.read.text` stores
  * each line's RAW FILE BYTES in a `UTF8String` without decoding, so the
  * whole count pipeline — byte-split tokenize, the byte-walking
  * [[WordCount.normalize]], raw-byte groupBy equality, `octet_length` as
  * C `strlen`, and the raw-byte text sink — is byte-exact with the C
  * engine (`mpi_mapreduce.c:133-161`, signed `char*`) even on input that
  * is NOT valid UTF-8. No Latin-1 read mode is needed.
  *
  * U+FFFD replacement exists only at the JVM-materialization boundary
  * (collect/show/encode) — display, not engine semantics. Both facts are
  * pinned here; `hex(col)` observes raw bytes without re-encoding.
  */
class EncodingFidelitySpec extends SparkSpec {

  /** Latin-1 bytes, INVALID as UTF-8: "caf\xE9 caf\xE9\nna\xEFve\n". */
  private def latin1Fixture(): Path = {
    val bytes = Array[Byte](
      'c', 'a', 'f', 0xE9.toByte, ' ', 'c', 'a', 'f', 0xE9.toByte, '\n',
      'n', 'a', 0xEF.toByte, 'v', 'e', '\n')
    val dir = graft.core.TempDirs.path("graft-latin1")
    Files.write(dir.resolve("input.txt"), bytes)
    dir
  }

  test("invalid bytes survive ingest verbatim (raw UTF8String, no decode)") {
    val dir = latin1Fixture()
    val lines = WordCount.ingest(spark, Seq(dir.toString))
      .select(hex(col("value")).as("h"), octet_length(col("value")).as("olen"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    // 0xE9 / 0xEF in place — NOT the 3-byte U+FFFD sequence EFBFBD
    assert(lines.toSet === Set(("636166E920636166E9", 9), ("6E61EF7665", 5)))
  }

  test("the count pipeline is byte-exact with the C on invalid UTF-8") {
    val dir = latin1Fixture()
    val counts = WordCount.run(spark, Seq(dir.toString))
      .select(hex(col("word")).as("h"), col("count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // C: trailing 0xE9 is non-alpha (signed char < 0) → end-stripped →
    // both tokens become "caf"; interior 0xEF is kept verbatim.
    assert(counts === Map("636166" -> 2L, "6E61EF7665" -> 1L))
  }

  test("octet_length is C strlen: 40 raw bytes >= 0x80 pass the 70-byte cap") {
    // 40×0xE9 = 40 C bytes (kept); a decode-then-reencode pipeline would
    // see 40 × U+FFFD = 120 UTF-8 bytes and wrongly drop the token.
    val word = Array.fill(40)(0xE9.toByte)
    val dir = graft.core.TempDirs.path("graft-bytecap")
    Files.write(dir.resolve("input.txt"), word :+ '\n'.toByte)
    val counts = WordCount.run(spark, Seq(dir.toString))
      .select(hex(col("word")).as("h"), col("count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("E9" * 40 -> 1L))
  }

  test("the text sink writes the raw bytes back out unchanged") {
    val dir = latin1Fixture()
    val out = graft.core.TempDirs.path("graft-latin1-out").resolve("sink")
    WordCount.sink(WordCount.run(spark, Seq(dir.toString)), out.toString)
    val written = Files.list(out).iterator().asInstanceOf[java.util.Iterator[Path]]
    val bytes = scala.jdk.CollectionConverters.IteratorHasAsScala(written).asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllBytes(p)).toSeq
    // the 0xEF byte of na\xEFve reaches the output file verbatim
    assert(bytes.containsSlice(Seq[Byte]('n', 'a', 0xEF.toByte, 'v', 'e')))
    assert(!bytes.containsSlice(Seq[Byte](0xEF.toByte, 0xBF.toByte, 0xBD.toByte)),
      "sink must not re-encode to U+FFFD")
  }

  test("U+FFFD appears only at the JVM boundary (collect), pinned as display-only") {
    val dir = latin1Fixture()
    val jvmKeys = WordCount.run(spark, Seq(dir.toString))
      .collect().map(_.getString(0)).toSet
    // collect() materializes through new String(bytes, UTF_8) → U+FFFD
    assert(jvmKeys === Set("caf", "na�ve"))
  }
}
