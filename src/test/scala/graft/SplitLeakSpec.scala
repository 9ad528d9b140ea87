package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** The leakage-freedom property dd_split exists for: every near-dup
  * cluster lands in exactly ONE of train/val/test, so no test document
  * has a near-duplicate twin in train.
  */
class SplitLeakSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every near-dup cluster is assigned exactly one split") {
    val split = Dedup.ddSplit(spark, sfDir)
    val leaky = split
      .groupBy("split_key")
      .agg(countDistinct("split").as("n_splits"), count(lit(1)).as("n_docs"))
      .where(col("n_splits") > 1)
      .count()
    assert(leaky === 0L)
    // and clustered keys really do group multiple docs (the property is
    // non-vacuous on this corpus)
    val multi = split.groupBy("split_key").count().where(col("count") > 1).count()
    assert(multi > 0L, "no multi-doc clusters — leak check is vacuous")
    // every doc assigned exactly once, all three splits populated
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(split.count() === n)
    assert(split.select("split").distinct().count() === 3L)
  }
}
