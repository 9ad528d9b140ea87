package graft

import org.apache.spark.sql.functions.col
import graft.core.WordCount

/** Normalize/tokenize edge cases from FIXTURES.md §3 (reference
  * semantics: `normalizeWord`, mpi_mapreduce.c:133-161; `getWord`,
  * :119-131), checked against BOTH the JVM reference function and the
  * Catalyst column expression.
  */
class NormalizeSpec extends SparkSpec {

  private val cases: Seq[(String, String)] = Seq(
    "The" -> "the",
    "(word)." -> "word",
    "don't" -> "don't",
    "12abc34" -> "abc",
    "..." -> "...",
    "1871" -> "1871",
    "word\r" -> "word",          // CRLF artifact: \r is non-alpha, stripped
    "﻿Project" -> "project", // BOM char non-alpha, stripped
    "a\tb" -> "a\tb",            // tab is NOT a delimiter and is interior
    "HELLO!!!" -> "hello",
    "--x--" -> "x",
    "" -> "",
  )

  test("normalizeWordExact matches the reference semantics table") {
    cases.foreach { case (in, want) =>
      assert(WordCount.normalizeWordExact(in) == want, s"input=<$in>")
    }
  }

  test("column normalize agrees with normalizeWordExact on the edge cases") {
    import spark.implicits._
    val df = cases.map(_._1).toDF("tok")
      .select(col("tok"), WordCount.normalize(col("tok")).as("norm"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"column normalize input=<$in>")
    }
  }

  test("normalize is idempotent on the edge cases") {
    cases.foreach { case (in, _) =>
      val once = WordCount.normalizeWordExact(in)
      assert(WordCount.normalizeWordExact(once) == once, s"input=<$in>")
    }
  }

  test("tokenize splits on single space only; empty tokens from runs") {
    import spark.implicits._
    val toks = WordCount.tokenize(Seq("a  b\tc d").toDF("value"))
      .collect().map(_.getString(0)).toSeq
    assert(toks == Seq("a", "", "b\tc", "d"))
  }

  test("count drops empty and >70-char tokens, keeps punctuation keys") {
    import spark.implicits._
    val long = "x" * 71
    val df = Seq(s"... $long a  a").toDF("value")
    val got = WordCount.count(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("..." -> 1L, "a" -> 2L))
  }
}
