package graft.core

import org.apache.spark.sql.DataFrame

/** Conditional fan-out for CPU-heavy per-row pipelines sitting on a
  * low-parallelism scan.
  *
  * Spark's input parallelism comes from file splits; a small single-file
  * table scans as ONE task, and whole-stage codegen fuses everything up
  * to the first exchange into that task — so an expensive expression
  * pipeline (shingling, per-token hashing) downstream of a tiny scan
  * runs on one core while the rest idle. The classic fix is a
  * round-robin repartition between the cheap scan and the expensive
  * compute: shuffle a few hundred KB of input to light up every core.
  *
  * The repartition is applied ONLY when the scan's split count is below
  * the session's default parallelism. At 100 TB that condition is never
  * true (splits ≫ cores) and the operator disappears — it cannot
  * degrade the large-scale plan it exists to protect locally. Values
  * are partition-independent downstream (aggregations and joins key on
  * columns), so results are identical either way; Spark sorts within
  * partitions before round-robin assignment
  * (`spark.sql.execution.sortBeforeRepartition`, default true) so the
  * assignment is deterministic under task retries.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val splits = df.rdd.getNumPartitions // file listing only, no job
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (splits < cores) df.repartition(cores) else df
  }
}
