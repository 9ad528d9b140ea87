package graft

import org.apache.spark.sql.functions._
import graft.queries.KmeansIvf

/** The aggregate-argmin assignment must be BIT-equal to the
  * window-rank form it replaced (which is also the form every DuckDB
  * oracle replays): same d2 doubles, same lowest-cid tie-break. Pinned
  * on the gate corpus against trained centroids AND on a crafted
  * exact-tie fixture where duplicate centroids force the cid
  * tie-break to decide.
  */
class KmeansAssignSpec extends SparkSpec {

  private def cells(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq

  test("gate corpus: aggregate argmin == window rank-1, embeddings intact") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cent = KmeansIvf.train(e, 16, 2)
    val agg = KmeansIvf.assignCells(e, cent)
    val win = KmeansIvf.rankedAssign(e, cent)
    assert(cells(agg) === cells(win))
    // the carried embedding column survives the aggregate unchanged
    val n = agg.alias("a")
      .join(e.alias("b"), col("a.vec_id") === col("b.vec_id"))
      .where(col("a.embedding") === col("b.embedding")).count()
    assert(n === e.count())
  }

  test("exact ties: duplicate centroids break to the lowest cid in both forms") {
    import spark.implicits._
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)), (2L, Seq(0.6f, 0.6f)))
      .toDF("vec_id", "embedding")
    // cid 1 and 3 are the SAME centroid — every vector nearest to it
    // ties exactly and must land in cid 1
    val cent = Seq(
      (0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)), (3, Seq(0.0f, 1.0f)))
      .toDF("cid", "centroid")
    val agg = cells(KmeansIvf.assignCells(e, cent))
    val win = cells(KmeansIvf.rankedAssign(e, cent))
    assert(agg === win)
    assert(agg.find(_._1 == 1L).get._2 === 1, "tie must break to lowest cid")
  }
}
