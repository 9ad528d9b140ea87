package graft

import org.apache.spark.sql.functions._

import graft.functions.MinhashSig

/** [[graft.functions.MinhashSig]] must be bit-identical to the
  * compositional build it replaced (explode → md5(family-prefix ‖
  * shingle) → min per family) — that form is what the DuckDB oracle
  * still replays.
  */
class MinhashSigSpec extends SparkSpec {

  /** The compositional form, kept here as the cross-check oracle. */
  private def compositional(docs: org.apache.spark.sql.DataFrame, numHashes: Int) = {
    val fams = (numHashes + 3) / 4
    docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id") +:
        (0 until fams).map(m => md5(concat(lit(s"$m|"), col("s"))).as(s"h$m")): _*)
      .groupBy("doc_id")
      .agg(
        min(substring(col("h0"), 1, 8)).as("mh0"),
        (1 until numHashes).map { k =>
          min(substring(col(s"h${k / 4}"), (k % 4) * 8 + 1, 8)).as(s"mh$k")
        }: _*)
      .select(col("doc_id"),
        concat((0 until numHashes).map(k => col(s"mh$k")): _*).as("sig"))
  }

  test("fused signature equals the compositional explode/groupBy build on real docs") {
    val staged = graft.queries.Dedup.shingleDocs(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .select(col("doc_id"), col("sh"))
    Seq(8, 48).foreach { nh => // 48 exercises multi-digit family prefixes ("10|", "11|")
      val fused = staged.select(col("doc_id"), MinhashSig.sig(col("sh"), nh).as("sig"))
      val oracle = compositional(staged, nh)
      val diff = fused.as("f").join(oracle.as("o"), "doc_id")
        .where(col("f.sig") =!= col("o.sig") || col("f.sig").isNull || col("o.sig").isNull)
      assert(diff.count() === 0, s"numHashes=$nh")
      assert(fused.count() === oracle.count(), s"numHashes=$nh row counts")
    }
  }

  test("seeded fuzz: 200 random shingle arrays agree with the compositional build") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val words = Seq("the", "é", "日本", "zz", "a b", "", "xyz")
    val cases = (1 to 200).map { i =>
      (i.toLong, (0 to rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length))))
    }
    val df = cases.toDF("doc_id", "sh")
    val fused = df.select(col("doc_id"), MinhashSig.sig(col("sh"), 8).as("sig"))
    val oracle = compositional(df, 8)
    val joined = fused.as("f").join(oracle.as("o"), "doc_id")
      .where(col("f.sig") =!= col("o.sig"))
    assert(joined.count() === 0)
  }

  test("agrees with a commons-codec replay on unicode and duplicate shingles") {
    import spark.implicits._
    val shingles = Seq("the quick fox", "éclair au café", "日本 語 テスト", "the quick fox")
    val df = Seq((1L, shingles)).toDF("doc_id", "sh")
    val got = df.select(MinhashSig.sig(col("sh"), 8)).collect()(0).getString(0)
    val expected = (0 until 8).map { k =>
      shingles.distinct.map { s =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          (s"${k / 4}|" + s).getBytes("UTF-8")).substring((k % 4) * 8, (k % 4) * 8 + 8)
      }.min
    }.mkString
    assert(got === expected)
  }

  test("null on empty array; null elements skipped; single shingle passes through") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("only one")),
    ).toDF("doc_id", "sh")
    val rows = df.select(col("doc_id"), MinhashSig.sig(col("sh"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) === null)
    val one = (0 until 8).map { k =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        (s"${k / 4}|only one").getBytes("UTF-8")).substring((k % 4) * 8, (k % 4) * 8 + 8)
    }.mkString
    assert(rows(2L) === one)
  }
}
