package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, RepartitionOperation}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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

  /** Parallelism estimate read off the OPTIMIZED LOGICAL plan — no
    * physical planning and no RDD lineage is forced just to decide
    * whether to fan out (`df.rdd` would build both per construction).
    * The topmost explicit repartition/coalesce pins the answer;
    * otherwise leaves contribute their file counts (a lower bound on
    * splits — files only split further, which only disables the
    * fan-out sooner), LocalRelation counts as 1, and unknown leaf
    * types count as fully parallel so the operator errs toward no-op.
    */
  private def splitEstimate(df: DataFrame): Int = {
    val plan = df.queryExecution.optimizedPlan
    val cores = df.sparkSession.sparkContext.defaultParallelism
    plan.collectFirst { case r: RepartitionOperation => r.numPartitions }
      .getOrElse {
        plan.collectLeaves().map {
          case lr: LogicalRelation =>
            lr.relation match {
              case fs: HadoopFsRelation => fs.location.inputFiles.length max 1
              case _                    => cores
            }
          case _: LocalRelation => 1
          case _                => cores
        }.sum
      }
  }

  def apply(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (splitEstimate(df) < cores) df.repartition(cores) else df
  }
}
