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

  test("candidate cap: skew trigger fires only on the hot cell, exact elsewhere") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    // 15 tiny well-separated clusters (4 members each, axis-aligned)
    // with one member at ids 0..14 so the deterministic id-ordered
    // Lloyd init seeds every cluster, plus ONE hot cluster of 300 —
    // far past the 4x-mean trigger (mean 22.5, trigger 90)
    val dim = 16
    def axis(i: Int): Array[Float] =
      Array.tabulate(dim)(d => if (d == i) 10f else 0f)
    val hotBase = Array.tabulate(dim)(d => if (d == 15) -10f else 0f)
    val tinySeed = (0 until 15).map(c => Row(c.toLong, jitter(axis(c)).toSeq))
    val hotSeed = Seq(Row(15L, jitter(hotBase).toSeq))
    val tinyRest = (0 until 15).flatMap(c => (1 until 4).map(j =>
      Row(100L + c * 10 + j, jitter(axis(c)).toSeq)))
    val hotRest = (0 until 299).map(j => Row(1000L + j, jitter(hotBase).toSeq))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val vecs = spark.createDataFrame(spark.sparkContext.parallelize(
      tinySeed ++ hotSeed ++ tinyRest ++ hotRest, 4), schema)
    val cap = 16
    def run(cellCap: Option[Int]) = Similarity.knnJoinCore(vecs,
      graft.core.TempDirs.create("knncap") + "/m", k = 16, iters = 2,
      probes = 1, trainCap = None, cellCap = cellCap).collect()
    val capped = run(Some(cap))
    val exact = run(None)
    // every vector still gets output (the cap restricts candidates,
    // never queries)
    assert(capped.map(_.getLong(0)).distinct.length === 360,
      s"queries lost: ${capped.map(_.getLong(0)).distinct.length}")
    // hot-cluster ids = 15 +: 1000..1298; the candidate sample is the
    // cap smallest (md5(graft-knn-cand|id), id) — replicated here
    val hotIds = (Seq(15L) ++ (0 until 299).map(j => 1000L + j))
    def coin(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"graft-knn-cand|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val sample = hotIds.sortBy(id => (coin(id), id)).take(cap).toSet
    val hotSet = hotIds.toSet
    val hotNbrs = capped.filter(r => hotSet(r.getLong(0))).map(_.getLong(2))
    assert(hotNbrs.nonEmpty && hotNbrs.forall(sample),
      s"hot-cell neighbors must come from the ${cap}-coin sample")
    // tiny clusters sit below the trigger: their rows are EXACTLY the
    // uncapped run's (semantics preserved where no skew exists)
    def rowsOf(rs: Array[Row], ids: Set[Long]) = rs
      .filter(r => ids(r.getLong(0)))
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val tinyIds = (0 until 15).flatMap(c =>
      Seq(c.toLong) ++ (1 until 4).map(j => 100L + c * 10 + j)).toSet
    assert(rowsOf(capped, tinyIds) === rowsOf(exact, tinyIds),
      "small cells must keep exact top-k under the cap")
  }

  test("plan: per-vector top-K truncates inside the window (WindowGroupLimit)") {
    val p = SparkEntry.queries("sim_knn_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank filter must push into the window as a group limit:\n$p")
  }

  test("gated capped join: trigger fires non-vacuously and hot-cell " +
      "neighbors come from the coin sample") {
    val cap = 256 // KnnCandCap — the production constant the gate pins
    val out = SparkEntry.queries("sim_knn_join_capped")(spark, sfDir).collect()
    // every vector — corpus AND clones — still gets ranked output
    assert(out.map(_.getLong(0)).distinct.length === 1000,
      s"queries lost: ${out.map(_.getLong(0)).distinct.length}")
    // re-derive assignment over the model the query persisted: the
    // engineered head cell must actually clear the 4x-mean trigger at
    // gate scale (an inactive cap would hash-match vacuously)
    val base = graft.sources.Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    val seed = base.where(col("vec_id") === 0)
      .select(col("embedding").as("__c"))
    val vecs = base.unionByName(base
      .select((col("vec_id") + Similarity.KnnCloneIdOffset).as("vec_id"))
      .crossJoin(seed).select(col("vec_id"), col("__c").as("embedding")))
    val cent = spark.read.parquet(Similarity.KnnCappedCentroidDir)
    val counts = graft.queries.KmeansIvf.assignCells(vecs, cent)
      .groupBy("cell").agg(count(lit(1)).as("cc")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mean = counts.values.sum.toDouble / counts.size
    val (hotCell, hotCc) = counts.maxBy(_._2)
    assert(hotCc > math.max(cap.toDouble, 4 * mean),
      s"trigger vacuous: max cell $hotCc vs mean $mean (cap $cap)")
    // independent JVM replay of the md5 coin: hot-cell members ranked
    // by (md5(graft-knn-cand|id), id), sample = cap smallest; every
    // reported neighbor living in the hot cell must be in the sample
    def coin(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"graft-knn-cand|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val members = graft.queries.KmeansIvf.assignCells(vecs, cent)
      .where(col("cell") === hotCell).select("vec_id").collect()
      .map(_.getLong(0))
    val sample = members.sortBy(id => (coin(id), id)).take(cap).toSet
    val memberSet = members.toSet
    val hotNbrs = out.map(_.getLong(2)).filter(memberSet)
    assert(hotNbrs.nonEmpty && hotNbrs.forall(sample),
      "a hot-cell neighbor escaped the coin sample")
    // and the sample is a strict subset: the cap genuinely blocked
    assert(memberSet.size > sample.size,
      s"cap inactive: ${memberSet.size} members <= cap $cap")
  }
}
