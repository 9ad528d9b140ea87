package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.Similarity

/** Int8 symmetric quantization (sim_int8_topk): the error bound the
  * scheme guarantees and the retrieval quality it preserves.
  */
class Int8QuantSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("quantization error is bounded by scale/2 per dimension") {
    val worst = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        (array_max(transform(col("embedding"), x => abs(x.cast("double"))))
          / lit(127.0)).as("scale"))
      .where(col("scale") > 0)
      .select(col("scale"),
        array_max(transform(col("embedding"), x =>
          abs(round(x.cast("double") / col("scale")) * col("scale")
            - x.cast("double")))).as("err"))
      // round-to-nearest ⇒ |dq − x| ≤ scale/2 (tiny FP slack)
      .where(col("err") > col("scale") / 2 * 1.0000001)
      .count()
    assert(worst === 0L)
  }

  test("dequantized-cosine top-3 recalls the exact top-3 well") {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      Similarity.dotBuiltin(x, y)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"), col("norm").as("nq"))
    val c = e.select(col("vec_id"), col("embedding").as("ec"), col("norm").as("nc"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val exact = q.join(c, col("query_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("eq"), col("ec")) / (col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.simInt8Topk(spark, sfDir)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, f"int8 recall@3 = $recall%.2f — quantization broke retrieval")
  }
}
