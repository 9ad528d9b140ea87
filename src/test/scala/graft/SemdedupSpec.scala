package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, Similarity}

/** dd_semdedup — SemDeDup-style centroid-cell-blocked embedding dedup.
  * Two pins: a crafted fixture where the expected keep/drop set is known
  * by construction (identical vectors collapse to the lowest id,
  * orthogonal vectors all survive), and the keep/drop WITNESS property
  * on the gate corpus — every dropped vector has a lower-id same-cell
  * neighbor at the cosine threshold, every kept vector has none —
  * recomputed compositionally (builtin fold cosine), not via the
  * query's own pair join.
  */
class SemdedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("identical vectors collapse to the lowest id; orthogonal vectors all survive") {
    import spark.implicits._
    val e1 = Array(1f, 0f, 0f, 0f)
    val fixture = Seq(
      0L -> e1, 1L -> e1, 2L -> e1,
      3L -> Array(0f, 1f, 0f, 0f),
      4L -> Array(0f, 0f, 1f, 0f),
      5L -> Array(0f, 0f, 0f, 1f),
    ).toDF("vec_id", "embedding")
    val out = Dedup.semdedup(fixture, core.TempDirs.create("graft_semdedup_spec"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L))
    // the three copies share a cell; only the first survives
    val cellOf = out.map(r => r._1 -> r._2).toMap
    assert(cellOf(0L) === cellOf(1L) && cellOf(1L) === cellOf(2L))
    assert(out.filter(_._3).map(_._1).toSet === Set(0L, 3L, 4L, 5L))
  }

  test("a non-gate cell count keeps the keep/drop contract (rule path)") {
    import spark.implicits._
    // k = 4 ≠ the oracled 16 — the kmeansCellsForN-resolved path a
    // production run takes. Same construction as the k=16 fixture:
    // identical copies MUST collapse to the lowest id regardless of
    // how the cell space is carved, and mutually-orthogonal vectors
    // never drop each other (cosine 0 < threshold in ANY shared cell).
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val fixture = Seq(
      0L -> e1, 1L -> e1, 2L -> e1,
      3L -> e2, 4L -> e2,
      5L -> Array(0f, 0f, 1f, 0f),
      6L -> Array(0f, 0f, 0f, 1f),
    ).toDF("vec_id", "embedding")
    val out = Dedup.semdedup(fixture,
        core.TempDirs.create("graft_semdedup_spec_k4"), k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val cellOf = out.map(r => r._1 -> r._2).toMap
    assert(cellOf(0L) === cellOf(1L) && cellOf(1L) === cellOf(2L))
    assert(cellOf(3L) === cellOf(4L))
    assert(out.map(_._2).distinct.length <= 4, "at most k cells may appear")
    assert(out.filter(_._3).map(_._1).toSet === Set(0L, 3L, 5L, 6L))
  }

  test("gate corpus: dropped ⇔ a lower-id same-cell neighbor at the threshold") {
    val out = Dedup.ddSemdedup(spark, sfDir).persist()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val withVec = out.join(e, "vec_id")
    val a = withVec.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = withVec.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    // independent recomputation: builtin-fold cosine, not the query's join
    val cos = Similarity.dotBuiltin(col("ea"), col("eb")) /
      (sqrt(Similarity.dotBuiltin(col("ea"), col("ea"))) *
        sqrt(Similarity.dotBuiltin(col("eb"), col("eb"))))
    val witnessed = a.join(b, Seq("cell"))
      .where(col("vec_a") < col("vec_b"))
      .where(round(cos, 6) >= Dedup.SemdedupThreshold)
      .select(col("vec_b").as("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val dropped = out.where(!col("kept")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(dropped === witnessed)
    // non-vacuous both ways on this corpus
    assert(dropped.nonEmpty, "no drops — witness check is vacuous")
    assert(out.where(col("kept")).count() > 0L)
    out.unpersist()
  }
}
