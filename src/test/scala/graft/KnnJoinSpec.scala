package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Properties of the ANN k-NN self-join that its replay oracle cannot
  * check: output well-formedness (dense ranks per vector), measured
  * recall against exact brute force (the oracle replays the SAME cell
  * restriction, so it is blind to cross-cell misses), and the
  * rank-truncation plan shape.
  */
class KnnJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 3

  private lazy val out =
    SparkEntry.queries("sim_knn_join")(spark, sfDir).collect()

  test("ranks are dense from 1, at most K per vector, neighbors never self") {
    val byVec = out.groupBy(_.getLong(0))
    byVec.foreach { case (v, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"vec $v ranks $ranks")
      assert(ranks.length <= K)
      assert(rows.forall(_.getLong(2) != v), s"vec $v lists itself")
    }
    // nearly every corpus vector lands in a multi-member cell at the
    // gate operating point (16 cells / 500 vectors)
    assert(byVec.size > 400, s"only ${byVec.size} vectors got neighbors")
  }

  test("recall@3 vs exact brute force clears the same-cell floor") {
    val emb = graft.sources.Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val c = emb.select(col("vec_id"), col("embedding").as("ec"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val truth = q.join(c, col("query_id") =!= col("vec_id"))
      .withColumn("cos", Similarity.dotBuiltin(col("eq"), col("ec"))
        / sqrt(Similarity.dotBuiltin(col("eq"), col("eq")))
        / sqrt(Similarity.dotBuiltin(col("ec"), col("ec"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .select("query_id", "vec_id")
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ann = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val hits = truth.map { case (v, t) =>
      (ann.getOrElse(v, Set.empty) & t).size
    }.sum
    val rec = hits.toDouble / truth.values.map(_.size).sum
    info(f"knn-join recall@$K vs brute force over ${truth.size} vectors: $rec%.3f")
    // measured 0.507 at the gate point (3-probe left side, 16 cells;
    // same-cell-only was 0.233) — the floor catches a blown
    // assignment, a dropped probe list, or a join regression
    assert(rec >= 0.40, f"recall@$K collapsed: $rec%.3f")
  }

  test("plan: per-vector top-K truncates inside the window (WindowGroupLimit)") {
    val p = SparkEntry.queries("sim_knn_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank filter must push into the window as a group limit:\n$p")
  }
}
