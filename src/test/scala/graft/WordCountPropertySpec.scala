package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.WordCount

/** Property tests from FIXTURES.md §3 driven by ScalaCheck over the JVM
  * reference function (fast path; the column expression is pinned to it
  * by NormalizeSpec + the golden corpus tests).
  */
class WordCountPropertySpec extends SparkSpec {

  private def checkProp(p: Prop, min: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  private val tokenGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar,
      2 -> Gen.oneOf('.', ',', '\'', '-', '(', ')', '1', '9', '\r', '\t', '*'),
      1 -> Gen.oneOf('﻿', 'é', '’'))).map(_.mkString)

  test("normalizeWordExact is idempotent") {
    checkProp(Prop.forAll(tokenGen) { t =>
      val once = WordCount.normalizeWordExact(t)
      WordCount.normalizeWordExact(once) == once
    })
  }

  test("normalize output is a substring of the lowercased input") {
    checkProp(Prop.forAll(tokenGen) { t =>
      val lowered = t.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      lowered.contains(WordCount.normalizeWordExact(t))
    })
  }

  test("if output non-empty and input has alpha, ends are alpha") {
    checkProp(Prop.forAll(tokenGen) { t =>
      val out = WordCount.normalizeWordExact(t)
      val hasAlpha = t.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
      !hasAlpha || out.isEmpty ||
        (out.head >= 'a' && out.head <= 'z' && out.last >= 'a' && out.last <= 'z')
    })
  }

  test("sum of counts == number of surviving tokens") {
    import spark.implicits._
    val linesGen = Gen.listOfN(30, Gen.listOfN(8, tokenGen).map(_.mkString(" ")))
    // noShrink: a failing case would otherwise shrink through thousands
    // of Spark jobs. The survival filter is in BYTES (octet_length in
    // WordCount.count), so the expected side measures UTF-8 bytes too.
    checkProp(Prop.forAllNoShrink(linesGen) { lines =>
      val expected = lines.flatMap(_.split(" ", -1))
        .map(WordCount.normalizeWordExact)
        .count { w =>
          val nBytes = w.getBytes("UTF-8").length
          nBytes > 0 && nBytes <= WordCount.WordLength
        }
      val df = spark.createDataset(lines).toDF("value")
      WordCount.count(df).agg(org.apache.spark.sql.functions.sum("count"))
        .collect()(0).get(0) == (if (expected == 0) null else expected.toLong)
    }, min = 10)
  }
}
