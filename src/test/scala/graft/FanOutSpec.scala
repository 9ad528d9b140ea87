package graft

import org.apache.spark.sql.functions._

import graft.core.FanOut

/** FanOut's contract: spread a degenerate-parallelism scan across the
  * session's cores, disappear when the input is already parallel, never
  * change values.
  */
class FanOutSpec extends SparkSpec {

  test("repartitions a single-partition input up to default parallelism") {
    import spark.implicits._
    val one = (1 to 1000).toDF("x").coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val fanned = FanOut(one)
    assert(fanned.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(fanned.agg(sum("x")).collect()(0).getLong(0) === 500500L)
  }

  test("no-op when input parallelism already meets the core count") {
    import spark.implicits._
    val wide = (1 to 1000).toDF("x")
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val fanned = FanOut(wide)
    // unchanged partitioning — no extra exchange inserted
    assert(fanned.rdd.getNumPartitions === wide.rdd.getNumPartitions)
    assert(fanned.queryExecution.executedPlan.toString ===
      wide.queryExecution.executedPlan.toString)
  }

  test("documents scan at sf0.001 fans out and keeps row count") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val n = docs.count()
    assert(FanOut(docs).count() === n)
  }
}
