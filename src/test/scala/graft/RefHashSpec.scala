package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.RefHash

/** The column forms of the reference hash (hashFunc,
  * mpi_mapreduce.c:108-117) agree with the JVM reference implementation:
  * [[graft.functions.RefHashWord]] byte-exactly for ANY input (the C
  * loop walks UTF-8 bytes), the built-ins form for ASCII.
  */
class RefHashSpec extends SparkSpec {

  test("known values stay in [0, 255]") {
    Seq("the", "and", "a", "...", "don't", "1871", "éclair", "日本語").foreach { w =>
      val h = RefHash.refHashExact(w)
      assert(h >= 0 && h <= 255, s"word=$w h=$h")
    }
  }

  test("refHashExact folds per UTF-8 byte, with sign extension irrelevant mod 256") {
    // Hand-computed with the C loop over the UTF-8 bytes. 'é' = 0xC3 0xA9:
    // two fold steps, NOT one ord() step — pins the byte-vs-codepoint rule.
    def cLoop(bytes: Seq[Int]): Int = {
      var h = 0
      // signed vs unsigned byte makes no difference mod 256: bits >= 8
      // never flow down through (h<<4)^h, and the result is & 255.
      bytes.foreach { b => h = ((h << 4) ^ h) ^ b }
      h & 255
    }
    assert(RefHash.refHashExact("é") === cLoop(Seq(0xC3, 0xA9)))
    assert(RefHash.refHashExact("é") === cLoop(Seq(0xC3 - 256, 0xA9 - 256) // signed chars
    ))
    assert(RefHash.refHashExact("日") === cLoop(Seq(0xE6, 0x97, 0xA5)))
    assert(RefHash.refHashExact("aéb") === cLoop(Seq('a'.toInt, 0xC3, 0xA9, 'b'.toInt)))
  }

  test("column ref_hash == refHashExact on sampled ASCII words") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.nonEmptyListOf(Gen.asciiPrintableChar).map(_.mkString.take(30)))
    val prop = Prop.forAllNoShrink(gen) { words =>
      val df = spark.createDataset(words).toDF("word")
        .select(col("word"), RefHash.ref_hash(col("word")).as("h"))
      df.collect().forall(r => r.getInt(1) == RefHash.refHashExact(r.getString(0)))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3), prop)
    assert(res.passed, res.status.toString)
  }

  test("codegen ref_hash_bytes == refHashExact on arbitrary Unicode words") {
    import spark.implicits._
    val unicodeChar = Gen.frequency(
      5 -> Gen.asciiPrintableChar,
      2 -> Gen.choose(0x80.toChar, 0x2FF.toChar),   // Latin-1 / extended: 2-byte UTF-8
      1 -> Gen.choose(0x3040.toChar, 0x30FF.toChar) // kana: 3-byte UTF-8
    )
    val gen = Gen.listOfN(300, Gen.nonEmptyListOf(unicodeChar).map(_.mkString.take(30)))
    val prop = Prop.forAllNoShrink(gen) { words =>
      val df = spark.createDataset(words).toDF("word")
        .select(col("word"), RefHash.ref_hash_bytes(col("word")).as("h"))
      df.collect().forall(r => r.getInt(1) == RefHash.refHashExact(r.getString(0)))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3), prop)
    assert(res.passed, res.status.toString)
  }

  test("byte and character folds agree on ASCII, diverge on multi-byte UTF-8") {
    import spark.implicits._
    val df = spark.createDataset(Seq("the", "1871", "...", "éclair")).toDF("word")
      .select(
        col("word"),
        RefHash.ref_hash(col("word")).as("h_char"),
        RefHash.ref_hash_bytes(col("word")).as("h_byte"))
    val byWord = df.collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    Seq("the", "1871", "...").foreach { w =>
      assert(byWord(w)._1 === byWord(w)._2, s"ASCII word $w should agree")
    }
    // 'é' is 2 bytes: the byte fold takes one more step than the char
    // fold — assert the divergence itself, not just the byte fold's
    // value, so a regression that collapsed ref_hash_bytes back to a
    // char fold is caught.
    assert(byWord("éclair")._2 === RefHash.refHashExact("éclair"))
    assert(byWord("éclair")._1 !== byWord("éclair")._2,
      "char and byte folds must diverge on multi-byte UTF-8")
  }
}
