package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.RefHash

/** The column form of the reference hash (hashFunc,
  * mpi_mapreduce.c:108-117) agrees with the JVM reference
  * implementation for ASCII words.
  */
class RefHashSpec extends SparkSpec {

  test("known values stay in [0, 255]") {
    Seq("the", "and", "a", "...", "don't", "1871").foreach { w =>
      val h = RefHash.refHashExact(w)
      assert(h >= 0 && h <= 255, s"word=$w h=$h")
    }
  }

  test("column ref_hash == refHashExact on sampled ASCII words") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.nonEmptyListOf(Gen.asciiPrintableChar).map(_.mkString.take(30)))
    val prop = Prop.forAllNoShrink(gen) { words =>
      val df = spark.createDataset(words).toDF("word")
        .select(col("word"), RefHash.ref_hash(col("word")).as("h"))
      df.collect().forall(r => r.getInt(1) == RefHash.refHashExact(r.getString(0)))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3), prop)
    assert(res.passed, res.status.toString)
  }
}
