package graft

import org.apache.spark.sql.functions._

import graft.functions.CanonFp

/** [[graft.functions.CanonFp]] must be bit-identical to the staged
  * builtin form `md5(regexp_replace(trim(lower(text)), "\\s+", " "))`
  * it replaced — the exact-dedup fingerprint seven oracled queries key
  * on and their DuckDB oracles replay.
  */
class CanonFpSpec extends SparkSpec {

  private def staged(text: org.apache.spark.sql.Column) =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  test("fused fingerprint equals the staged form on real sf0.001 docs") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = d.select(CanonFp.of(col("text")).as("k"),
      staged(col("text")).as("s"))
    assert(both.count() > 0)
    assert(both.where(col("k") =!= col("s")).count() === 0)
  }

  test("crafted + fuzz texts: tabs/newlines/unicode/space runs agree") {
    import spark.implicits._
    val crafted = Seq("", " ", "\t", "\t hello \t", "A  B\tC\nD", "  x  ",
      "É Ñ 日本Go", "MiXeD CaSe\r\nnext", "\f\f", "a\rb",
      "ends with tab\t", "\nstarts with nl", "ÀÈÌ  ÒÙ")
    val rnd = new scala.util.Random(20260819L)
    val pieces = Seq("the", "É", "日本", "ZZ", "a", "\t", "\n", " ", "  ", "\r\n")
    val fuzz = (1 to 300).map(_ =>
      (0 to rnd.nextInt(12)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString)
    val df = (crafted ++ fuzz).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val both = df.select(CanonFp.of(col("text")).as("k"), staged(col("text")).as("s"))
    assert(both.where(col("k") =!= col("s")).count() === 0)
  }

  test("null text yields null; codec replay of a canonical case") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("  Hello\t\tWorld\n")))
      .toDF("id", "text")
      .select(col("id"), CanonFp.of(col("text")).as("fp"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) == null)
    // lower → "  hello\t\tworld\n"; trim strips the 0x20s only;
    // \s+ runs collapse → "hello world " (trailing \n became a space)
    val expected = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      "hello world ".getBytes("UTF-8"))
    assert(rows(2L) === expected)
  }
}
