package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffle fact tables ONCE at write time
  * so every subsequent equi-join/aggregation on the bucket key runs
  * exchange-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * on every query and never shuffling it: two tables bucketed into the
  * same number of buckets on the join key are co-partitioned, so
  * SortMergeJoin reads matching buckets directly (zero Exchange in the
  * plan). The write costs one shuffle — amortized over every downstream
  * query.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted table in the session catalog. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. The returned
    * plan contains no Exchange for either side (verified in
    * BucketingSpec); enable `spark.sql.sources.bucketing.enabled`
    * (default true) and keep `spark.sql.shuffle.partitions` ≥ buckets.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
