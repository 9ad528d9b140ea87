package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for shuffle-heavy plans at scale.
  *
  * Spark's AQE skew-join handles moderate skew automatically (it splits
  * oversized partitions at runtime), and partial aggregation absorbs
  * skewed GROUP BY keys. Salting is the remaining tool for the
  * pathological case: an equi-join where a handful of keys dominate and
  * one side is too large to broadcast. We salt DETERMINISTICALLY
  * (hash of the probe row, not rand()) so retried tasks produce
  * identical output — a requirement for Spark's task-retry model on a
  * real cluster.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key` with an n-way salt.
    *
    * The (large, skewed) left side gets a per-row salt in [0, n); the
    * (smaller, but not broadcastable) right side is replicated n times.
    * The shuffle key becomes (key, salt), spreading each hot key over n
    * reduce partitions. Result equals the plain inner join, row for
    * row; cost is n× the right side's shuffle volume — choose the
    * smaller input as `right` and n ≈ (hottest-key rows / average
    * partition capacity).
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      numSalts: Int): DataFrame = {
    require(numSalts > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(numSalts)).cast("int"))
    val salts = explode(sequence(lit(0), lit(numSalts - 1)))
    val saltedRight = right.withColumn("__salt", salts)
    saltedLeft
      .join(saltedRight,
        saltedLeft(key) === saltedRight(key) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop(saltedRight(key)).drop(saltedLeft("__salt")).drop(saltedRight("__salt"))
  }

  /** Two-phase count for heavily-skewed group keys where even the
    * partial-aggregate hash map would blow memory on the hot key's map
    * side: count per (key, salt) first, then sum per key. For algebraic
    * aggregates Spark's partial aggregation usually makes this
    * unnecessary; it exists for the documented worst case and as the
    * pattern for non-algebraic per-key state.
    */
  def saltedCount(df: DataFrame, key: String, numSalts: Int): DataFrame = {
    require(numSalts > 0)
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(numSalts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("count"))
  }

  /** Rough skew report for a key: top-k key frequencies vs the mean —
    * the decision input for numSalts.
    */
  def skewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val freq = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val stats = freq.agg(avg("n").as("mean_n"))
    freq.crossJoin(broadcast(stats))
      .withColumn("skew_ratio", round(col("n") / col("mean_n"), 2))
      .orderBy(col("n").desc)
      .limit(topK)
  }
}
