package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.Dedup

/** The end-to-end curation pipeline ([[Dedup.pipelineCore]] /
  * `dd_pipeline_manifest`): first-drop-wins attribution, the
  * partner-survivorship rule of the near-dup stage, and the
  * survivor-scoped domain cap — on a crafted corpus where EVERY stage
  * fires (the real gate corpus has no byte-identical duplicates, so
  * the `exact` arm is non-vacuous only here).
  */
class PipelineSpec extends SparkSpec {

  /** A text passing all five gopher rules: 49 tokens (2 stopwords +
    * 46 four-letter fillers + a doc tag), mean word length ≈ 3.96,
    * all distinct, [a-z0-9] only.
    */
  private def passText(tag: String): String =
    (Seq("the", "and") ++ (1 to 46).map(i => f"wd$i%02d") :+ tag)
      .mkString(" ")

  private val failText = "tiny text" // 2 tokens — fails the length rule

  private def docsDf = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    val rows = Seq(
      Row(10L, "s1", "en", passText("wd10")),   // holdout (id % 10 == 0)
      Row(11L, "s1", "en", passText("keep")),   // survivor; exact keeper
      Row(21L, "s1", "en", passText("keep")),   // byte-identical to 11 → exact
      Row(31L, "s1", "en", passText("wd31")),   // near-dup of 11
      Row(41L, "s1", "en", passText("wd41")),   // paired only to exact-DROPPED 21
      Row(51L, "s1", "en", passText("wd51")),   // lex ratio above tau
      Row(61L, "s1", "en", passText("wd61")),   // lex ratio below tau → survives
      Row(71L, "s1", "en", passText("wd71")),   // sem-flagged
      Row(81L, "s1", "en", failText),           // gopher
      Row(91L, "s1", "en", passText("wd91")))   // survivor
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def frame(schema: String, rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType.fromDDL(schema))

  test("every stage fires and first-drop-wins attribution holds") {
    val pairs = frame("doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE", Seq(
      Row(11L, 31L, 0.8),   // partner survives exact → 31 drops
      Row(21L, 41L, 0.9)))  // partner WAS the exact dup → 41 survives
    val lex = frame("doc_id BIGINT, contam_ratio DOUBLE", Seq(
      Row(51L, 0.5), Row(61L, 0.1)))
    val sem = frame("doc_id BIGINT", Seq(Row(71L)))
    val got = Dedup.pipelineCore(docsDf, pairs, lex, sem, quota = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3)))
      .toMap
    assert(got(10L) === ("holdout", false))
    assert(got(21L) === ("exact", false),
      "byte-identical non-keeper must drop at the exact stage")
    assert(got(31L) === ("near_dup", false))
    assert(got(41L)._1 !== "near_dup",
      "a pair whose partner was exact-dropped must NOT near-drop")
    assert(got(51L) === ("contam_lex", false))
    assert(got(61L)._1 !== "contam_lex",
      "lex ratio below tau must not drop")
    assert(got(71L) === ("contam_sem", false))
    assert(got(81L) === ("gopher", false))
    // survivors 11, 41, 61, 91 compete for quota 1 in one domain:
    // exactly one kept, the rest attributed to the cap
    val surv = Seq(11L, 41L, 61L, 91L).map(got)
    assert(surv.count(_ == ("kept", true)) === 1, surv.toString)
    assert(surv.count(_ == ("domain_cap", false)) === 3, surv.toString)
    assert(got.size === 10, "one manifest row per input doc")
  }

  test("the domain-cap winner is the smallest taDomainCap coin (rerun-stable)") {
    val pairs = frame("doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE", Seq.empty)
    val lex = frame("doc_id BIGINT, contam_ratio DOUBLE", Seq.empty)
    val sem = frame("doc_id BIGINT", Seq.empty)
    def run() = Dedup.pipelineCore(docsDf, pairs, lex, sem, quota = 2)
      .where(org.apache.spark.sql.functions.col("kept"))
      .collect().map(_.getLong(0)).toSet
    val a = run()
    // independent replay of the coin order over the known survivor set
    val md = java.security.MessageDigest.getInstance("MD5")
    def coin(id: Long): String = md.digest(
      s"graft-domcap-1|$id".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    // 21 still drops at the exact stage (byte-identical to 11) and 81
    // at gopher, even with every explicit stage input empty
    val survivors = Seq(11L, 31L, 41L, 51L, 61L, 71L, 91L)
    val want = survivors.sortBy(id => (coin(id), id)).take(2).toSet
    assert(a === want, s"cap winners $a != coin order $want")
    assert(run() === a, "rerun must pick identical winners")
  }
}
