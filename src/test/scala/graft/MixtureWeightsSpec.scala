package graft

import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** The weights-table mixture variant must be the md5 stand-in's exact
  * generalization: feeding it a rates table that REPRODUCES the md5
  * values yields ta_mixture's rows bit-for-bit, explicit rates obey
  * the budget arithmetic computed independently (java MD5 in the
  * test), and the weights side joins as a broadcast — the whole point
  * of a #sources-row table at 100 TB.
  */
class MixtureWeightsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex4(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(4)

  test("a rates table reproducing the md5 values replays ta_mixture exactly") {
    import spark.implicits._
    val d = graft.sources.Tables(spark, sfDir).documents
    val md5Rates = d.select(col("source")).distinct()
      .withColumn("rate",
        substring(md5(concat(lit("graft-mixrate-1|"), col("source"))), 1, 4))
    val viaTable = TextAnalysis.taMixtureCore(d, md5Rates).collect().toSeq
    val inline = TextAnalysis.taMixture(spark, sfDir).collect().toSeq
    assert(viaTable === inline)
  }

  test("explicit rates: kept docs and token budget match an independent MD5 replay") {
    import spark.implicits._
    val docsDf = Seq(
      // (source, doc_id, text) — token counts 3, 2, 1, 4
      ("web", 1L, "a b c"), ("web", 2L, "d e"),
      ("books", 3L, "f"), ("books", 4L, "g h i j"),
      ("orphan", 5L, "k l") // not in the weights table → dropped
    ).toDF("source", "doc_id", "text")
    val rates = Seq("web" -> "8000", "books" -> "ffff").toDF("source", "rate")
    val out = TextAnalysis.taMixtureCore(docsDf, rates)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // independent replay: coin = md5("graft-mix-1|" + doc_id).take(4)
    val fixture = Seq(
      ("web", 1L, 3L, "8000"), ("web", 2L, 2L, "8000"),
      ("books", 3L, 1L, "ffff"), ("books", 4L, 4L, "ffff"),
      ("orphan", 5L, 2L, "0000"))
    val expected = fixture.groupBy(_._1).map { case (src, rows) =>
      val kept = rows.filter(r => md5Hex4(s"graft-mix-1|${r._2}") < r._4)
      src -> ((rows.head._4, rows.size.toLong,
        kept.size.toLong, kept.map(_._3).sum))
    }
    assert(out === expected)
    // and the fixture is non-vacuous: something kept, something dropped
    assert(out.values.map(_._3).sum > 0L)
    assert(out("orphan")._3 === 0L, "unknown source must sample at rate 0")
  }

  test("the weights join is a broadcast hash probe, not a shuffle join") {
    val plan = TextAnalysis.taMixtureWeighted(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
