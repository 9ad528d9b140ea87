package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** The hot-shingle posting cap bounds candidate generation at O(n·cap):
  * one boilerplate shingle shared by every document must NOT produce n²
  * join rows, and must not create candidate pairs by itself — while
  * documents sharing genuine content still pair.
  */
class HotShingleCapSpec extends SparkSpec {

  /** n docs: every one carries the same boilerplate sentence (→ shared
    * hot shingles), plus unique filler; docs 0 and 1 additionally share
    * a genuine near-dup body.
    */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    val boiler = "all rights reserved by the licensing corporation"
    val dupBody = "quick brown foxes jump over lazy dogs daily"
    (0 until n).map { i =>
      val unique = s"unique$i filler$i content$i token$i"
      val body = if (i <= 1) s"$dupBody extra$i" else unique
      (i.toLong, "en", s"$boiler $body")
    }.toDF("doc_id", "lang", "text")
  }

  test("capped postings drop the everywhere-shingle: index stays O(n·cap)") {
    val n = 60
    val cap = 10
    val staged = Dedup.shingleDocs(corpus(n))
    val kept = Dedup.cappedPostings(staged, cap)
    // no surviving shingle spans more than `cap` docs …
    val maxPosting = kept.groupBy("lang", "shingle").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPosting <= cap, s"a posting of length $maxPosting survived cap=$cap")
    // … so the boilerplate shingles (present in all 60 docs) are gone
    val boilerRows = kept.where(col("shingle") === "all rights reserved").count()
    assert(boilerRows === 0L)
    // and the self-join volume is bounded by Σ|posting|² ≤ |kept|·cap,
    // not n² per shared shingle
    val joinRows = kept.as("x").join(kept.as("y"),
        col("x.lang") === col("y.lang") && col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id")).count()
    val keptRows = kept.count()
    assert(joinRows <= keptRows * cap,
      s"join rows $joinRows exceed O(|kept|·cap) = ${keptRows * cap}")
  }

  test("boilerplate alone creates no pairs; genuine near-dups still pair") {
    val n = 60
    val got = Dedup.ngramJaccard(Dedup.shingleDocs(corpus(n)), 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 2..59 share ONLY boilerplate — no pair among them may appear
    assert(got === Set((0L, 1L)),
      s"expected only the genuine near-dup pair (0,1), got $got")
  }

  test("cap above every posting length reproduces the uncapped result") {
    val n = 20
    val staged = Dedup.shingleDocs(corpus(n))
    // cap = n: no posting can exceed the doc count, so nothing drops …
    val capped = Dedup.cappedPostings(staged, n)
    val uncapped = staged.select(col("lang"), col("doc_id"),
      explode(array_distinct(col("sh"))).as("shingle"))
    assert(capped.count() === uncapped.count())
    // … and the pair set matches a brute-force jaccard over the arrays
    val arrays = staged.select(col("doc_id"), array_distinct(col("sh")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expected = (for {
      a <- arrays.keys; b <- arrays.keys if a < b
      inter = (arrays(a) & arrays(b)).size
      union = (arrays(a) | arrays(b)).size
      if inter * 5 >= union
    } yield (a, b)).toSet
    val got = Dedup.ngramJaccard(staged, n)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("containment sees the near-subset pair Jaccard structurally misses") {
    import spark.implicits._
    // doc 0: a long page; doc 1: a short snippet wholly inside it.
    // J = |snippet|/|page| is tiny (below ngramJaccard's 0.2 gate);
    // C(snippet → page) = 1.0.
    val page = (0 until 60).map(i => s"p$i").mkString(" ")
    val snippet = (20 until 28).map(i => s"p$i").mkString(" ")
    val fixture = Seq(
      (0L, "en", page), (1L, "en", snippet),
      (2L, "en", (0 until 30).map(i => s"z$i").mkString(" ")),
    ).toDF("doc_id", "lang", "text")
    val staged = Dedup.shingleDocs(fixture)

    val jac = Dedup.ngramJaccard(staged, 100)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((0L, 1L)),
      s"fixture broken: jaccard should miss the subset pair, got $jac")

    val cont = Dedup.containmentPairs(staged, 100).collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(cont.contains((0L, 1L)), s"containment must catch the subset pair: $cont")
    val (nc, na, nb, cab, cba) = cont((0L, 1L))
    // snippet (doc 1, the b side) is fully contained: n_common == nb
    assert(nc === nb && cba === 1.0, s"expected full b-side containment: $cont")
    assert(cab < 0.2, s"a-side containment should stay small: $cab")
    assert(na > nb)
    // the unrelated doc pairs with nobody
    assert(!cont.keySet.exists(p => p._1 == 2L || p._2 == 2L))
  }
}
