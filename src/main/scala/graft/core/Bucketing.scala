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

  /** Persist `df` as a bucketed, sorted table in the session catalog.
    * `path` makes it an EXTERNAL table at that location — callers
    * running under a session whose warehouse dir points somewhere
    * undesirable (e.g. the repo checkout) pass an explicit temp path.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

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

  /** [[bucketedJoin]] for sides whose bucket columns are named
    * differently (o_orderkey ⋈ l_orderkey): co-partitioning only needs
    * equal bucket counts over the joined columns, not equal names. The
    * merge hint pins the sort-merge path — bucketing pays off as an
    * exchange-free SMJ over co-partitioned sorted buckets, and at
    * production scale neither side of a fact-fact join broadcasts; at
    * test scale a small side would otherwise be broadcast and hide the
    * layout this utility exists to exploit.
    */
  def bucketedEquiJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
