package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one-line physical-plan audit of every (non-streaming)
  * declared query — Exchange count, join strategies, and the known
  * plan smells (SortAggregate, Expand, CartesianProduct, interpreted
  * ObjectHashAggregate) — so "every operator examined" is a grep, not
  * an assertion. Streaming queries are skipped by default: their
  * returned frame is the post-fixture read-back, whose plan says
  * nothing about the stream (StreamProbe decomposes those).
  * `runMain graft.PlanAudit [sfDir] [namePrefix]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val prefix = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("st_"))
      .filter(n => prefix.forall(n.startsWith))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        def c(s: String) = s"\\b$s".r.findAllIn(p).length
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin", "CartesianProduct")
          .map(j => j -> c(j)).filter(_._2 > 0)
          .map { case (j, n) => s"$j:$n" }.mkString(",")
        // `\bExchange` counts only shuffle exchanges (no word boundary
        // inside BroadcastExchange/ReusedExchange); ReusedExchange is
        // counted separately so a big number here reads as plan-tree
        // REUSE, not extra shuffles.
        println(s"$name exchanges=${c("Exchange")} reusedEx=${c("ReusedExchange")} " +
          s"bcastEx=${c("BroadcastExchange")} joins=[$joins] " +
          s"sortAgg=${c("SortAggregate")} objAgg=${c("ObjectHashAggregate")} " +
          s"expand=${c("Expand")} window=${c("Window")}")
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        println(s"$name AUDIT-ERROR ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(120))
      }
    }
    spark.stop()
  }
}
