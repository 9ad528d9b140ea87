package graft

import org.apache.spark.sql.functions._

import graft.functions.SimhashSig

/** [[graft.functions.SimhashSig]] must be bit-identical to the
  * compositional form it replaced (explode → md5 → 16 conditional ±1
  * sums → sign bits) — that form is what the DuckDB oracle replays.
  */
class SimhashSigSpec extends SparkSpec {

  /** The compositional form, kept here as the cross-check oracle. */
  private def compositional(tok: org.apache.spark.sql.DataFrame) = {
    val highNibble = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val h = tok.withColumn("h", md5(col("tok")))
    val sums = h.groupBy("doc_id").agg(
      sum(when(substring(col("h"), 1, 1).isin(highNibble: _*), 1).otherwise(-1)).as("s0"),
      (1 until 16).map(i =>
        sum(when(substring(col("h"), i + 1, 1).isin(highNibble: _*), 1).otherwise(-1)).as(s"s$i")): _*)
    val simhash = (0 until 16)
      .map(i => when(col(s"s$i") >= 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
    sums.select(col("doc_id"), simhash.cast("int").as("simhash16"))
  }

  test("fused simhash equals the compositional explode/groupBy build on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(col("doc_id"),
      filter(graft.functions.ByteSplit.split(col("text")), t => t =!= "").as("w"))
    val fused = toks.select(col("doc_id"), SimhashSig.sig(col("w")).as("simhash16"))
      .where(col("simhash16").isNotNull)
    val oracle = compositional(
      toks.select(col("doc_id"), explode(col("w")).as("tok")))
    val diff = fused.as("f").join(oracle.as("o"), "doc_id")
      .where(col("f.simhash16") =!= col("o.simhash16"))
    assert(diff.count() === 0)
    assert(fused.count() === oracle.count())
  }

  test("unicode tokens and the empty-array null contract") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("héllo", "日本語", "plain")),
      (2L, Seq.empty[String]),
    ).toDF("doc_id", "w")
    val got = df.select(col("doc_id"), SimhashSig.sig(col("w")).as("sh"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else Int.box(r.getInt(1)))).toMap
    assert(got(2L) === null)
    // replay doc 1 with commons-codec
    val sums = new Array[Int](16)
    Seq("héllo", "日本語", "plain").foreach { t =>
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(t.getBytes("UTF-8"))
      (0 until 16).foreach { i =>
        sums(i) += (if (hex.charAt(i) >= '8') 1 else -1)
      }
    }
    val expect = (0 until 16).map(i => if (sums(i) >= 0) 1 << i else 0).sum
    assert(got(1L) === expect)
  }
}
