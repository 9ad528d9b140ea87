package graft

import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** The hashed-linear classifier's contract: the md5 stand-in weights
  * are exactly a 256-row weights table (so a TRAINED table slots into
  * the same plan), margins replay under an independent java-MD5
  * recomputation, and inference itself is join-free in-row work.
  */
class ClassifySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def javaWeight(tok: String): Long = {
    val bucket = md5Hex(s"graft-feat-1|$tok").take(2)
    java.lang.Long.parseLong(md5Hex(s"graft-w-1|$bucket").take(2), 16) - 128L
  }

  test("a weights table reproducing the md5 weights replays ta_classify exactly") {
    val md5Weights = spark.range(256)
      .select(format_string("%02x", col("id")).as("bucket"))
      .withColumn("weight",
        conv(substring(md5(concat(lit("graft-w-1|"), col("bucket"))), 1, 2), 16, 10)
          .cast("long") - 128)
    val d = graft.sources.Tables(spark, sfDir).documents
    val viaTable = TextAnalysis.taClassifyCore(d, md5Weights).collect().toSeq
    val inRow = TextAnalysis.taClassify(spark, sfDir).collect().toSeq
    assert(viaTable === inRow)
    // non-vacuous: the corpus must exercise both classes
    assert(inRow.map(_.getString(3)).toSet === Set("keep", "drop"))
  }

  test("margins match an independent java-MD5 replay on a crafted fixture") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha"), // repeated token counts twice
      (3L, "   "),         // whitespace-only → zero tokens, margin 0
      (4L, "δémo unicode"))
    val out = TextAnalysis.classifyInRow(fixture.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    val expected = fixture.map { case (id, text) =>
      val toks = text.split(" ", -1).filter(_.nonEmpty).toSeq
      val margin = toks.map(javaWeight).sum
      id -> ((toks.size, margin, if (margin > 0) "keep" else "drop"))
    }.toMap
    assert(out === expected)
    assert(out(3L) === ((0, 0L, "drop")), "no tokens → zero margin")
    assert(out(2L)._2 === 2 * javaWeight("alpha"), "tf weighting: dup token counts twice")
  }

  test("in-row inference never joins or shuffles before the output sort") {
    val p = TextAnalysis.taClassify(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"inference must not join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"inference is per-row work — only the output sort may exchange:\n$p")
  }
}
