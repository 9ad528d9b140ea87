package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge
import graft.functions.DotProduct
import graft.queries.Similarity

/** The native dot product is bit-equal to the builtin fold formulation
  * on real embeddings, and handles nulls/mismatches like zip_with.
  */
class DotProductSpec extends SparkSpec {

  private def native(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    Bridge.column(DotProduct(Bridge.expression(x), Bridge.expression(y)))

  test("bit-equal to the builtin fold on all sf0.001 embedding pairs (sampled)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val both = a.crossJoin(b).select(
      native(col("ea"), col("eb")).as("nat"),
      Similarity.dotBuiltin(col("ea"), col("eb")).as("ref"))
    val rows = both.collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "must be BIT-equal")
    }
  }

  test("empty arrays give 0.0; null array gives null") {
    import spark.implicits._
    val df = Seq((Array.empty[Float], Array.empty[Float]))
      .toDF("x", "y")
      .select(native(col("x"), col("y")).as("d"))
    assert(df.collect()(0).getDouble(0) == 0.0)
    val withNull = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("x", "y")
      .select(native(col("x"), col("y")).as("d"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("mismatched lengths give null (zip_with-pad parity)") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f), Array(1f)))
      .toDF("x", "y")
      .select(native(col("x"), col("y")).as("nat"),
        Similarity.dotBuiltin(col("x"), col("y")).as("ref"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  private def nativeD(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    Bridge.column(graft.functions.DotProductDouble(
      Bridge.expression(x), Bridge.expression(y)))

  test("double variant is bit-equal to the builtin fold on dequantized vectors") {
    // the sim_int8_topk shape: dq = round(x/scale)·scale doubles
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 20)
      .withColumn("scale",
        org.apache.spark.sql.functions.array_max(
          org.apache.spark.sql.functions.transform(col("embedding"),
            x => org.apache.spark.sql.functions.abs(x.cast("double")))) / 127.0)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => org.apache.spark.sql.functions.round(x.cast("double") / col("scale"))
            * col("scale")).as("dq"))
    val a = e.select(col("vec_id").as("ia"), col("dq").as("da"))
    val b = e.select(col("vec_id").as("ib"), col("dq").as("db"))
    val rows = a.crossJoin(b).select(
      nativeD(col("da"), col("db")).as("nat"),
      Similarity.dotBuiltin(col("da"), col("db")).as("ref")).collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "must be BIT-equal")
    }
  }

  test("double variant: mismatched lengths and null arrays give null") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0)))
      .toDF("x", "y")
      .select(nativeD(col("x"), col("y")).as("nat"),
        Similarity.dotBuiltin(col("x"), col("y")).as("ref"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    val withNull = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("x", "y")
      .select(nativeD(col("x"), col("y")).as("d"))
    assert(withNull.collect()(0).isNullAt(0))
  }
}
