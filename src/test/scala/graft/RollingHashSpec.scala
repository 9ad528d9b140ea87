package graft

import org.apache.spark.sql.functions._

import graft.functions.RollingHash

/** [[graft.functions.RollingHash]] must equal the lambda form it
  * replaced (`aggregate(split(text,''), 0L, (h,c) -> pmod(h*31 +
  * ascii(c), 1e9+7))`) — that form is what the DuckDB oracle replays.
  */
class RollingHashSpec extends SparkSpec {

  private def lambdaForm(c: org.apache.spark.sql.Column) =
    aggregate(
      filter(split(c, ""), x => x =!= ""),
      lit(0L),
      (h, x) => pmod(h * 31L + ascii(x), lit(1000000007L)))

  test("fused equals the lambda form on real docs (full text and head-32)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      col("doc_id"),
      RollingHash.hash(col("text")).as("f_full"),
      lambdaForm(col("text")).as("l_full"),
      RollingHash.hash(substring(col("text"), 1, 32)).as("f_head"),
      lambdaForm(substring(col("text"), 1, 32)).as("l_head"))
    assert(both.where(col("f_full") =!= col("l_full") ||
      col("f_head") =!= col("l_head")).count() === 0)
  }

  test("unicode edge cases: multi-byte, supplementary plane, combining marks, empty") {
    import spark.implicits._
    val cases = Seq("", "a", "éclair", "日本語テスト", "éclair",
      "math 𝕏 bold", "mixed 𝕏 and é and z")
    val df = cases.toDF("s")
    val diff = df.select(RollingHash.hash(col("s")).as("f"), lambdaForm(col("s")).as("l"))
      .where(col("f") =!= col("l"))
    assert(diff.count() === 0)
    // empty string folds to the initial accumulator
    assert(df.where(col("s") === "").select(RollingHash.hash(col("s")))
      .collect()(0).getLong(0) === 0L)
  }
}
