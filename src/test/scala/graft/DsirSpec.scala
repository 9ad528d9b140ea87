package graft

import graft.queries.TextAnalysis

/** Pins [[TextAnalysis.dsirCore]] against an independent plain-Scala
  * replay (java MD5 bucketing + the exact bit-length log-ratio) on a
  * crafted fixture, the selection direction the operator exists for
  * (target-like raw docs keep, raw-only docs drop), and the plan
  * contract (the B-row score table broadcasts onto the raw stream —
  * no merge join on the bucket key).
  */
class DsirSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(bg: String): String =
    md5hex(s"graft-dsir-1|$bg").substring(0, TextAnalysis.DsirFeatureHexChars)

  private def bitlen(n: Long): Int = java.lang.Long.toBinaryString(n).length

  /** The engine's recurrence without Spark, over (doc_id, lang, text). */
  private def replay(rows: Seq[(Long, String, String)])
      : Map[Long, (Long, Long, Boolean)] = {
    val feats = rows.flatMap { case (id, lang, text) =>
      val w = text.split(" ", -1).filter(_.nonEmpty)
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => (id, lang, bucket(s"${p(0)} ${p(1)}"))).toSeq
    }
    val target = feats.filter(_._2 == "en")
    val raw = feats.filter(_._2 != "en")
    val ct = target.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cr = raw.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (target.size.toLong, raw.size.toLong)
    val b = TextAnalysis.DsirBuckets
    def s(bk: String): Long =
      (bitlen(ct.getOrElse(bk, 0L) + 1) - bitlen(nt + b)).toLong -
        (bitlen(cr.getOrElse(bk, 0L) + 1) - bitlen(nr + b))
    raw.groupBy(_._1).map { case (id, fs) =>
      val w = fs.map(f => s(f._3)).sum
      id -> ((fs.size.toLong, w, w > 0))
    }
  }

  private val fixture: Seq[(Long, String, String)] = Seq(
    // target corpus: heavy on the "alpha beta gamma" phrase family
    (0L, "en", "alpha beta gamma alpha beta gamma alpha beta"),
    (1L, "en", "beta gamma alpha beta gamma delta"),
    // raw doc echoing the target phrases -> importance weight > 0
    (10L, "de", "alpha beta gamma alpha beta gamma"),
    // raw doc of its own junk, repeated so raw probability dwarfs
    // target smoothing -> weight < 0
    (11L, "fr", "qq ww qq ww qq ww qq ww qq ww qq ww qq ww"),
    // sub-2-token raw doc: no bigrams, excluded entirely
    (12L, "zh", "solo"),
  )

  test("crafted fixture: engine == independent MD5+bitlen replay, bit-exact") {
    import spark.implicits._
    val got = TextAnalysis.dsirCore(fixture.toDF("doc_id", "lang", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val want = replay(fixture)
    assert(got === want, s"engine diverged from replay: $got vs $want")
    assert(got.keySet === Set(10L, 11L), "only raw docs with bigrams scored")
    assert(got(10L)._3, s"target-echoing raw doc must keep: ${got(10L)}")
    assert(!got(11L)._3, s"raw-only doc must drop: ${got(11L)}")
  }

  test("gate corpus: engine == replay on sf0.001") {
    val rows = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val got = TextAnalysis.taDsir(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got === replay(rows), "engine diverged from replay on the corpus")
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "fixture corpus should produce both keeps and drops (non-vacuous)")
  }

  test("plan: score table broadcasts onto the raw stream, no bucket merge join") {
    val p = TextAnalysis.taDsir(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the only merge joins on bucket are the B-row × B-row FULL OUTER
    // model merge (broadcast-hash cannot produce full outer); the
    // SCORING join — corpus-sided — must be a broadcast hash join
    val smj = "SortMergeJoin \\[([a-z_]+)#\\d+\\], \\[[a-z_]+#\\d+\\], (\\w+)".r
      .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toList
    assert(smj.forall { case (k, t) => k != "bucket" || t == "FullOuter" },
      s"only the model merge may sort-merge on bucket: $smj\n$p")
    assert(p.contains("BroadcastHashJoin [bucket"),
      s"the scoring join must broadcast the score table:\n$p")
    spark.catalog.clearCache()
  }
}
