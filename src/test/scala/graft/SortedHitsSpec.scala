package graft

import org.apache.spark.sql.functions._

import graft.functions.SortedHits

/** [[graft.functions.SortedHits]] (binary-search membership count over
  * a sort_array-ordered broadcast set) must equal
  * `size(array_intersect(probe, set))` on a distinct probe side — the
  * form it replaces in the streaming pipeline's lexical screen.
  */
class SortedHitsSpec extends SparkSpec {

  test("seeded fuzz: 400 random probe/set pairs equal size(array_intersect)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    // small vocab forces real overlaps; multi-byte + empty strings keep
    // the binary ordering honest
    val vocab = Vector("", "a", "ab", "abc", "b", "ba", "é", "日本", "z9",
      "q w", "Q", "0", "zz", "éx", "longer shingle text")
    val cases = (1 to 400).map { _ =>
      val probe = (1 to rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .distinct
      val set = (1 to rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .distinct
      (probe, set)
    }
    val df = cases.toDF("probe", "set")
      .withColumn("sorted", sort_array(col("set")))
      .select(
        SortedHits.of(col("probe"), col("sorted")).as("fast"),
        size(array_intersect(col("probe"), col("sorted"))).as("ref"))
    assert(df.where(col("fast") =!= col("ref")).count() === 0)
    // non-vacuity: some case actually hit
    assert(df.where(col("fast") > 0).count() > 0)
  }

  test("edges: empty probe, empty set, null inputs") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("a"), Seq("a"))).toDF("probe", "set")
      .select(SortedHits.of(col("probe"), sort_array(col("set"))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(df === Seq(0, 0, 1))
    val nulls = spark.sql(
      "SELECT CAST(NULL AS ARRAY<STRING>) AS probe, array('a') AS s")
      .select(SortedHits.of(col("probe"), col("s")).as("n"))
      .collect()
    assert(nulls.head.isNullAt(0), "null probe array must yield null")
  }

  test("the real screen: SortedHits equals array_intersect on the gate corpus") {
    // the exact composition st_pipeline runs: distinct doc shingles
    // probed against the sorted distinct eval-shingle set
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalSh = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      .select(explode(array_distinct(
        graft.functions.WordShingles.of(col("text")))).as("sng"))
      .distinct()
      .agg(sort_array(collect_list(col("sng"))).as("eval_sh"))
    val probed = docs
      .crossJoin(broadcast(evalSh))
      .select(
        array_distinct(graft.functions.WordShingles.of(col("text"))).as("shd"),
        col("eval_sh"))
      .select(
        SortedHits.of(col("shd"), col("eval_sh")).as("fast"),
        size(array_intersect(col("shd"), col("eval_sh"))).as("ref"))
    assert(probed.where(col("fast") =!= col("ref")).count() === 0)
    assert(probed.where(col("fast") > 0).count() > 0)
  }
}
