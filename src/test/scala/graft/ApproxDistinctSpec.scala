package graft

import org.apache.spark.sql.functions._

/** The 100 TB path for distinct counts: approx_count_distinct (HLL++).
  * A sketch can't be replayed by a different engine, so this is tested
  * in-suite against the exact count instead of the DuckDB oracle:
  * default rsd=0.05 must hold on real data.
  */
class ApproxDistinctSpec extends SparkSpec {

  test("HLL at rsd=0.01 within 3 sigma of exact on orders.o_custkey") {
    // rsd is a STANDARD DEVIATION, not a bound (default 0.05 was observed
    // 1.3 sigma off on this data) — pin rsd and allow 3 sigma.
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val row = orders.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.01).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.03,
      s"exact=$exact approx=$approx")
  }

  test("approx_percentile (KLL-style sketch) within accuracy bound of exact quantiles") {
    // accuracy parameter 10000 bounds rank error at n/10000; check the
    // median and p95 of o_totalprice against exact percentile_approx's
    // exact cousin via sort
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val n = orders.count()
    val row = orders.agg(
      expr("approx_percentile(o_totalprice, array(0.5, 0.95), 10000)").as("approx"),
      expr("percentile(o_totalprice, array(0.5, 0.95))").as("exact")).collect()(0)
    val approx = row.getSeq[Double](0)
    val exact = row.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e <= 0.02, s"approx=$a exact=$e n=$n")
    }
  }

  test("grouped HLL matches exact within 10% per group") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val rows = orders.groupBy("o_orderpriority").agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey")).as("approx")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }
}
