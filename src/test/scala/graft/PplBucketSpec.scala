package graft

import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** Pins the CCNet-style perplexity bucketing end-to-end on a fixture
  * small enough to hand-compute: the integer-surprisal arithmetic
  * (bitlen difference = ⌊log₂⌋ difference), the histogram tertile
  * thresholds, and the head/middle/tail assignment. Also pins the two
  * contracts a refactor could silently break: docs with <2 tokens are
  * excluded, and the scoring join never degenerates into a cartesian.
  */
class PplBucketSpec extends SparkSpec {

  /** bitlen(x) = length of x's binary representation. */
  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  test("surprisal and buckets match an independent hand computation") {
    import spark.implicits._
    // doc i mixes (6-i) copies of the common "a b" with i once-only
    // bigrams -> surprisal rises with i, spreading the score range;
    // doc 6 has one token (excluded)
    val fixture = ((0 until 6).map { i =>
      val common = Seq.fill(6 - i)(Seq("a", "b")).flatten
      val rare = (0 until i).flatMap(j => Seq(s"u$i${j}a", s"u$i${j}b"))
      (i.toLong, (common ++ rare).mkString(" "))
    } :+ (6L, "a")).toDF("doc_id", "text")

    val got = TextAnalysis.pplBucketCore(fixture).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L), "doc 6 must be excluded")

    // independent model: bigram counts, prefix counts, vocab size
    val docsTok = fixture.collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
      .filter(_._2.size >= 2).toMap
    val bigrams = docsTok.values.flatMap(w => w.zip(w.tail)).toSeq
    val cvw = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cv = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val vocab = docsTok.values.flatten.toSet.size.toLong
    val expScore = docsTok.map { case (id, w) =>
      val ss = w.zip(w.tail).map(bg =>
        bitlen(cv(bg._1) + vocab) - bitlen(cvw(bg) + 1))
      id -> ss.sum.toDouble / ss.size
    }
    // the engine rounds ppl_bits to 6 decimals with the same HALF_UP
    // rule BigDecimal applies to a double's canonical decimal form
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (id, ppl, _) =>
      assert(ppl === round6(expScore(id)), s"doc $id: $ppl vs ${expScore(id)}")
    }

    // thresholds over the score histogram: 6 docs -> head = lowest
    // ceil(6/3)=2 bins' worth, middle up to ceil(12/3)=4, rest tail
    val sorted = expScore.toSeq.sortBy(x => (x._2, x._1))
    val byDoc = got.map(g => g._1 -> g._3).toMap
    val distinctScores = sorted.map(_._2).distinct.size
    assert(distinctScores >= 4, "fixture must spread scores for the tertile check")
    assert(byDoc(sorted.head._1) === "head")
    assert(byDoc(sorted.last._1) === "tail")
    // monotone: bucket order follows score order
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    val bucketSeq = sorted.map(x => rank(byDoc(x._1)))
    assert(bucketSeq === bucketSeq.sorted, s"buckets must be monotone in score: $bucketSeq")
  }

  test("gate corpus: all three buckets populated, thirds within one bin's mass") {
    val rows = TextAnalysis.taPplBucket(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 500)
    val byBucket = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // head holds at least a third (the threshold bin is inclusive) and
    // never the whole corpus
    assert(byBucket("head") >= 167 && byBucket("head") < 500)
    spark.catalog.clearCache()
  }

  test("plan: scoring joins are equi-joins on token keys; no unbroadcast cartesian") {
    val df = TextAnalysis.taPplBucket(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    // the 1-row stat crosses (vocab, total, thresholds) are all
    // broadcast() nested loops by construction; what must never appear
    // is a partitioned cartesian
    assert(!p.contains("CartesianProduct"), s"no unbroadcast cartesian:\n$p")
    // every keyed merge/hash join is on token keys (w1[, w2]) — the
    // model joins — never on anything vector- or doc-cross-shaped
    val keyed = "(?:SortMergeJoin|ShuffledHashJoin) \\[([a-z0-9_]+)#"
      .r.findAllMatchIn(p).map(_.group(1)).toList
    assert(keyed.forall(_ == "w1"), s"keyed joins must be on w1(,w2), got $keyed:\n$p")
    spark.catalog.clearCache()
  }
}
