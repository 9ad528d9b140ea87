package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.functions.CentroidArgmin
import graft.queries.Pq

/** The native PQ argmin kernel is bit-equal to the built-ins-only
  * fold formulation it replaced ([[Pq.argminBuiltin]]) — on the real
  * codebook geometry (every sf0.001 subvector against a pivoted
  * candidate array), on crafted ties, and on the degenerate inputs
  * (empty candidate list, length-mismatched centroid).
  */
class CentroidArgminSpec extends SparkSpec {

  private def native(sv: Column, cands: Column) =
    Bridge.column(CentroidArgmin(Bridge.expression(sv), Bridge.expression(cands)))

  private def candsOf(pairs: Seq[(Int, Array[Float])]): Column =
    array(pairs.map { case (cid, cen) =>
      struct(
        lit(cid).as("cid"),
        array(cen.map(lit(_)): _*).cast("array<float>").as("centroid"),
        lit(cen.map(x => x.toDouble * x.toDouble).sum).as("nc2"))
    }: _*)

  test("equals the fold formulation on every sf0.001 subvector") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val subs = Pq.subvectors(e)
    // a real candidate list: the first 16 vectors' m-th subvectors,
    // pivoted exactly like encode's broadcast side
    val seed = subs.where(col("vec_id") < 16)
      .select(col("m"), struct(col("vec_id").cast("int").as("cid"),
        col("sv").as("centroid"),
        queries.Similarity.dotBuiltin(col("sv"), col("sv")).as("nc2")).as("cand"))
      .groupBy("m").agg(array_sort(collect_list(col("cand"))).as("cands"))
    val both = subs.join(broadcast(seed), Seq("m"))
      .select(native(col("sv"), col("cands")).as("nat"),
        Pq.argminBuiltin(col("sv"), col("cands")).as("ref"))
    val rows = both.collect()
    assert(rows.length.toLong == e.count() * Pq.SubspaceCount)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), "must be bit-equal"))
  }

  test("ties keep the lowest cid; empty candidate list gives -1") {
    val sv = array(lit(1f), lit(0f)).cast("array<float>")
    // two candidates at identical distance: strict < keeps the first
    // (= lowest cid on the sorted list), matching the oracle's
    // row_number ORDER BY d2, cid
    val tied = candsOf(Seq(3 -> Array(0f, 1f), 7 -> Array(0f, -1f)))
    val df = spark.range(1).select(
      native(sv, tied).as("nat"),
      Pq.argminBuiltin(sv, tied).as("ref"),
      native(sv, array().cast(
        "array<struct<cid:int,centroid:array<float>,nc2:double>>")).as("empty"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 3)
    assert(r.getInt(2) == -1)
  }

  test("length-mismatched centroid is skipped, like the poisoned-dot fold") {
    val sv = array(lit(1f), lit(2f)).cast("array<float>")
    val cands = candsOf(Seq(0 -> Array(9f, 9f, 9f), 5 -> Array(1f, 2f)))
    val df = spark.range(1).select(
      native(sv, cands).as("nat"),
      Pq.argminBuiltin(sv, cands).as("ref"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 5 && r.getInt(1) == 5)
  }

  test("null sv gives null") {
    val cands = candsOf(Seq(0 -> Array(1f)))
    val df = spark.range(1).select(
      native(lit(null).cast("array<float>"), cands).as("nat"))
    assert(df.collect()(0).isNullAt(0))
  }
}
