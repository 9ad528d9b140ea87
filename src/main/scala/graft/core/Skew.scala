package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for shuffle-heavy plans at scale.
  *
  * Spark's AQE skew-join handles moderate skew automatically (it splits
  * oversized partitions at runtime), and partial aggregation absorbs
  * skewed GROUP BY keys. Salting is the remaining tool for the
  * pathological case: an equi-join where a handful of keys dominate and
  * one side is too large to broadcast.
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
    *
    * The salt is a partition-local counter
    * (`monotonically_increasing_id` = partitionId·2³³ + row index, taken
    * mod n), NOT a hash of the row: a row hash sends IDENTICAL rows to
    * the same salt, so the worst skew case — millions of duplicate rows
    * on one hot key — would not spread at all. The counter round-robins
    * every run of rows, duplicates included, across all n salts. The
    * partition id is mixed in before the mod: the per-partition base
    * 2³³ is ≡ 0 mod any power-of-two n, so without it every partition's
    * round-robin would start at salt 0 and inputs with many small
    * partitions would systematically overload the low salts.
    * Retry-safety: the salt value a left row gets cannot change which
    * right row it matches — the right side carries ALL n salts for every
    * key, so each left row joins exactly once whatever its salt — hence
    * the OUTPUT is deterministic under task retry even if a recomputed
    * partition enumerates rows in a different order; only the (already
    * heuristic) load balance could shift.
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      numSalts: Int): DataFrame = {
    require(numSalts > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id() + spark_partition_id(),
        lit(numSalts.toLong)).cast("int"))
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
    // Partition-local counter, not a row hash — same rationale as
    // saltedInnerJoin: duplicate rows of the hot key must still spread,
    // with the partition id mixed in to decorrelate the starting phase.
    df.withColumn("__salt",
        pmod(monotonically_increasing_id() + spark_partition_id(),
          lit(numSalts.toLong)).cast("int"))
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
