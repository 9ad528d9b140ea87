package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.ByteSplit

/** [[graft.functions.ByteSplit]] must be bit-identical to the built-in
  * `split(value, " ", -1)` on valid UTF-8 (its cross-check), while
  * preserving raw bytes where the built-in's regex path decodes —
  * that divergence is pinned in EncodingFidelitySpec.
  */
class ByteSplitSpec extends SparkSpec {

  private def both(s: String): (Seq[String], Seq[String]) = {
    import spark.implicits._
    val df = Seq(s).toDF("value")
    val bs = Bridge.column(ByteSplit(Bridge.expression(col("value"))))
    val row = df.select(bs.as("b"), split(col("value"), " ", -1).as("r"))
      .collect()(0)
    (row.getSeq[String](0), row.getSeq[String](1))
  }

  test("agrees with the built-in on edge cases") {
    for (s <- Seq("", " ", "  ", "a", "a b", " a  b ", "a\tb", "a\r b",
        "é ünïcodé x", "多 字节 词",
        "tab\there end ")) {
      val (b, r) = both(s)
      assert(b === r, s"mismatch on ${s.map(_.toInt)}")
    }
  }

  test("agrees with String.split on random strings (impl-level fuzz)") {
    // impl-level so the fuzz doesn't drive one Spark job per sample; the
    // Spark-path agreement is covered by the edge-case test above
    val gen = Gen.listOf(Gen.oneOf(Gen.asciiPrintableStr, Gen.identifier))
      .map(_.mkString(" "))
    val prop = Prop.forAll(gen) { s =>
      val arr = graft.functions.ByteSplitImpl.split(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      got == s.split(" ", -1).toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("interpreted eval and codegen agree") {
    import org.apache.spark.unsafe.types.UTF8String
    val e = ByteSplit(org.apache.spark.sql.catalyst.expressions.Literal("a  b c"))
    val arr = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    assert(got === Seq("a", "", "b", "c"))
    assert(UTF8String.fromString("a").numBytes === 1) // sanity: imports used
  }
}
