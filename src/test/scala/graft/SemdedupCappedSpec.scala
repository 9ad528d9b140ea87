package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, Similarity}

/** dd_semdedup_capped — the per-cell population bound (core collapse +
  * md5-blocked remainder). Three contracts:
  *
  *   1. SOUNDNESS on the gate corpus: every capped drop is a drop the
  *      UNCAPPED path (same sampled model — identical training coins ⇒
  *      bit-identical centroids) also makes: dropped(capped) ⊆
  *      dropped(uncapped), i.e. kept(capped) ⊇ kept(uncapped).
  *   2. The SKEWED-CELL bound: an engineered cell with a population far
  *      over the cap splits into md5 blocks whose sizes are ≈
  *      population/16^chars, and the tight core still collapses to its
  *      single lowest-id member (full recall on the cluster that CAUSED
  *      the skew).
  *   3. Block arithmetic: the md5-prefix block of every non-core row
  *      matches an independent JVM md5 replay, and core rows never
  *      enter the pair join (their subcell is the reserved 'core').
  */
class SemdedupCappedSpec extends SparkSpec {

  // sf0.01 (n = 500, mean cell ≈ 31 at k = 16), NOT the usual sf0.001:
  // the subset contract is only non-vacuous where some cell actually
  // exceeds the cap
  private val sfDir = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("gate corpus: capped drops are a subset of uncapped drops (same model)") {
    val capped = Dedup.ddSemdedupCapped(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    val uncapped = Dedup.ddSemdedupSampled(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(capped.keySet === uncapped.keySet, "full coverage on both paths")
    // same trainCap + same deterministic coins ⇒ the two models are the
    // same bits, so every capped drop must carry an uncapped witness
    val falseDrops = capped.filter { case (id, kept) => !kept && uncapped(id) }
    assert(falseDrops.isEmpty,
      s"capped dropped vectors the uncapped path kept: ${falseDrops.keys.toSeq.sorted}")
  }

  test("engineered skewed cell: blocks bounded, tight core collapses to one") {
    import spark.implicits._
    val dims = 8
    // one tight cluster of 300 near-identical vectors (cosine ≈ 1 —
    // all inside the 0.822 core) + 60 spread vectors orthogonal-ish to
    // it; k = 2 cells, so the cluster cell is ~300 members vs cap 32
    val cluster = (0 until 300).map { i =>
      val v = Array.fill(dims)(0f); v(0) = 1f; v(1) = 0.001f * (i % 7)
      (i.toLong, v)
    }
    val spread = (0 until 60).map { i =>
      val v = Array.fill(dims)(0f); v(1 + i % (dims - 1)) = 1f; v(0) = -0.2f
      ((300 + i).toLong, v)
    }
    val fixture = (cluster ++ spread).toDF("vec_id", "embedding")
    val cap = Dedup.SemdedupCellCap
    val out = Dedup.semdedup(fixture,
        core.TempDirs.create("graft_semdedup_capped_spec"),
        k = 2, cellCap = Some(cap))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getBoolean(3)))

    // the tight cluster: every member is within CoreTau of its own
    // centroid (the centroid of a near-identical set), so all 300 are
    // core — and exactly one (the lowest id) survives
    val clusterRows = out.filter(_._1 < 300)
    val coreRows = clusterRows.filter(_._3 == "core")
    assert(coreRows.length >= 295,
      s"the tight cluster should be (almost) all core, got ${coreRows.length}")
    // per cell (k-means may carve the cluster into both cells): the
    // core collapses to exactly its lowest-id member
    for ((cell, rows) <- coreRows.groupBy(_._2)) {
      assert(rows.count(_._4) === 1, s"cell $cell: exactly one core survivor")
      assert(rows.filter(_._4).head._1 === rows.map(_._1).min,
        s"cell $cell: the survivor is the lowest-id core member")
    }

    // block bound: non-core members of oversized cells carry an
    // md5-prefix subcell whose width matches the cell-count ladder,
    // and no single (cell, subcell) block exceeds a loose multiple of
    // the cap (md5 is uniform; 8x leaves room for small-sample noise)
    val nonCore = out.filter(r => r._3 != "core")
    val cellSizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    for ((id, cell, sub, _) <- nonCore if cellSizes(cell) > cap) {
      val cc = cellSizes(cell)
      val chars = (1 to Dedup.SemdedupMaxBlockChars)
        .find(c => cc <= cap.toLong * (1L << (4 * c)))
        .getOrElse(Dedup.SemdedupMaxBlockChars)
      assert(sub === md5hex(s"graft-semdedup-block|$id").take(chars),
        s"vec $id in cell $cell: block prefix mismatch")
    }
    val blockSizes = nonCore.groupBy(r => (r._2, r._3)).view.mapValues(_.length)
    assert(blockSizes.values.forall(_ <= 8 * cap),
      s"a block blew the bound: ${blockSizes.maxBy(_._2)}")
  }

  test("unsplit cells keep the exact uncapped semantics") {
    import spark.implicits._
    // every cell under the cap: the capped path must match the plain
    // semdedup keep/drop decision exactly (subcell '' for everyone)
    val e1 = Array(1f, 0f, 0f, 0f)
    val fixture = Seq(
      0L -> e1, 1L -> e1, 2L -> e1,
      3L -> Array(0f, 1f, 0f, 0f),
      4L -> Array(0f, 0f, 1f, 0f),
      5L -> Array(0f, 0f, 0f, 1f),
    ).toDF("vec_id", "embedding")
    val capped = Dedup.semdedup(fixture,
        core.TempDirs.create("graft_semdedup_capped_small"),
        cellCap = Some(Dedup.SemdedupCellCap))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getBoolean(3)))
    assert(capped.forall(_._2 == ""), "no cell is oversized — no blocks")
    assert(capped.filter(_._3).map(_._1).toSet === Set(0L, 3L, 4L, 5L))
  }
}
