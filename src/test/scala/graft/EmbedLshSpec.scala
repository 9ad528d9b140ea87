package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Scale-shape guarantees for the embedding near-dup / ANN paths:
  * LSH candidates come from equi-joins (never all-pairs), LSH output is
  * a sound subset of the exact answer with useful recall, and the IVF
  * quantizer actually spreads vectors over many cells.
  */
class EmbedLshSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("dd_embed_lsh: pairs are a sound subset of exact global pairs with useful recall") {
    // exact global all-pairs is affordable at 500 test vectors — it is
    // the oracle the LSH path approximates
    val e = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(Similarity.dotBuiltin(col("embedding"), col("embedding"))).as("norm"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("norm").as("nb"))
    val exact = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        round(Similarity.dotBuiltin(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .where(col("cosine") >= 0.35)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dd_embed_lsh")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low (${lsh.size}/${exact.size})")
  }

  test("fused one-pass signature is bit-identical to the 192-dot compositional form") {
    import graft.queries.Dedup
    val rows = embeddings
      .select(Dedup.fusedSig.as("fused"), Dedup.sigViaDots.as("dots"))
      .where(col("fused") =!= col("dots"))
      .count()
    assert(rows === 0L, s"$rows vectors sign differently under the fused kernel")
    // and the signature is the full-width banding input
    val len = embeddings.select(length(Dedup.fusedSig)).collect()(0).getInt(0)
    assert(len === 192)
  }

  test("lshRowsForN grows with log2(n) — collision budget stays linear") {
    import graft.queries.Dedup.lshRowsForN
    assert(lshRowsForN(500) == 9)
    assert(lshRowsForN(1000000) == 20)
    assert(lshRowsForN(1000000000L) == 30)
    // the operating-point invariant: n² / 2^r ≤ n
    Seq(1000L, 1000000L, 1000000000L).foreach { n =>
      assert(BigDecimal(n) * n / BigDecimal(2).pow(lshRowsForN(n)) <= BigDecimal(n))
    }
  }

  test("rule-resolved banding: sound pairs, fewer chance candidates, same join shape") {
    import graft.queries.Dedup
    // exact truth at 500 vectors (same derivation as the recall test)
    val e = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(Similarity.dotBuiltin(col("embedding"), col("embedding"))).as("norm"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("norm").as("nb"))
    val exact = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        round(Similarity.dotBuiltin(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .where(col("cosine") >= 0.35)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = embeddings.count()
    val r = Dedup.lshRowsForN(n) // 9 at the 500-vector gate corpus
    val ruled = Dedup.embedLshPairs(embeddings, r, Dedup.LshBands)
    // output contract: sound subset of the exact pairs, non-empty
    val pairs = ruled.collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(pairs.nonEmpty, "rule-resolved banding found no pairs at gate scale")
    assert(pairs.subsetOf(exact), s"non-pairs: ${pairs -- exact}")
    // plan contract: same equi-join shape as the gate config
    val p = ruled.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    spark.catalog.clearCache()
  }

  test("dd_embed_lsh: candidates from an equi-join — no cartesian/nested-loop anywhere") {
    val p = SparkEntry.queries("dd_embed_lsh")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ShuffledHashJoin"), s"band join should shuffle on its key:\n$p")
  }

  test("sim_ivf_bucket: quantizer spreads vectors across many cells") {
    val cells = embeddings
      .groupBy(Similarity.signBucket(col("embedding")).as("cell")).count()
    val nCells = cells.count()
    val maxCell = cells.agg(max("count")).head.getLong(0)
    val n = embeddings.count()
    assert(nCells >= 64, s"expected >=64 occupied cells (256 possible), got $nCells")
    assert(maxCell * 10 < n, s"hottest cell holds $maxCell of $n vectors — quantizer too coarse")
  }

  test("sim_ivf_bucket: probes are the query cell plus its Hamming-1 neighbors") {
    val row = embeddings.limit(1)
      .select(Similarity.signBucket(col("embedding")).as("cell"))
      .select(col("cell"), Similarity.probeCells(col("cell")).as("probes"))
      .head
    val cell = row.getString(0)
    val probes = row.getSeq[String](1)
    assert(probes.size == Similarity.BucketDims + 1)
    assert(probes.distinct.size == probes.size, s"duplicate probes: $probes")
    assert(probes.head == cell)
    probes.tail.foreach { pr =>
      val hamming = pr.zip(cell).count { case (x, y) => x != y }
      assert(hamming == 1, s"probe $pr is Hamming-$hamming from $cell")
    }
  }
}
