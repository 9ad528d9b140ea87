package graft

import org.apache.spark.sql.functions._

import graft.functions.WordShingles

/** [[graft.functions.WordShingles]] must be bit-identical to the staged
  * byte_split → filter → zip_with form it replaced — that form is what
  * the DuckDB shingle CTE replays.
  */
class ShinglesSpec extends SparkSpec {

  /** The staged form, kept here as the cross-check oracle. */
  private def staged(c: org.apache.spark.sql.Column) = {
    val w = filter(graft.functions.ByteSplit.split(c), t => t =!= "")
    val n = size(w)
    val ab = zip_with(w, slice(w, lit(2), n - 1), (a, b) => concat(a, lit(" "), b))
    val abc = zip_with(ab, slice(w, lit(3), n - 2), (x, cc) => concat(x, lit(" "), cc))
    when(n >= 3, slice(abc, lit(1), n - 2))
      .otherwise(array(concat_ws(" ", w)))
  }

  test("fused shingles equal the staged zip_with form on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        WordShingles.of(col("text")).as("f"), staged(col("text")).as("s"))
      .where(not(col("f") === col("s")))
    assert(diff.count() === 0)
  }

  test("edge cases: empty, spaces-only, 1-2 tokens, multi-space runs, unicode") {
    import spark.implicits._
    val cases = Seq("", "   ", "one", "one two", "a  b   c", " lead", "trail ",
      "a b c d", "é 日本 ü x", "tab\tkept in token")
    val df = cases.toDF("text")
    val rows = df.select(col("text"),
        WordShingles.of(col("text")).as("f"), staged(col("text")).as("s"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"input='${r.getString(0)}'")
    }
    // spot-pin the documented contract directly
    val m = rows.map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(m("") === Seq(""))
    assert(m("   ") === Seq(""))
    assert(m("one two") === Seq("one two"))
    assert(m("a  b   c") === Seq("a b c"))
    assert(m("a b c d") === Seq("a b c", "b c d"))
  }
}
