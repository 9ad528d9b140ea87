package graft

import graft.queries.Bpe

/** BPE tokenizer APPLICATION (encode + vocab histogram): a closed-form
  * fixture where the merged table is known by hand, then the gate
  * corpus checked against an INDEPENDENT plain-Scala trainer+encoder
  * (the textbook algorithm over a word-frequency map — no Spark, no
  * SQL), plus the internal token-conservation invariant linking the
  * per-doc counts to the vocab histogram.
  */
class BpeEncodeSpec extends SparkSpec {

  /** Independent trainer returning the FINAL symbol table (word →
    * subwords) after `merges` greedy rounds — the object under test
    * for encode/vocab, mirroring BpeTrainSpec's referenceBpe.
    */
  private def referenceTable(words: Map[String, Long], merges: Int): Map[String, Vector[String]] = {
    var table: Map[String, (Vector[String], Long)] =
      words.map { case (w, f) => w -> (w.map(_.toString).toVector, f) }
    var k = 0
    var done = false
    while (k < merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, f)) <- table; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), _) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        def mergeWord(syms: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }
        table = table.map { case (w, (syms, f)) => w -> (mergeWord(syms), f) }
        k += 1
      }
    }
    table.map { case (w, (syms, _)) => w -> syms }
  }

  test("closed-form fixture: encode counts and vocab after two merges") {
    import spark.implicits._
    // corpus "aaaa aa": round 1 merges (a,a) [count 4] -> aaaa=[aa,aa],
    // aa=[aa]; round 2 merges (aa,aa) [count 1] -> aaaa=[aaaa]
    val d = Seq((0L, "aaaa aa")).toDF("doc_id", "text")
    val enc = Bpe.bpeEncode(d, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc === Seq((0L, 2L, 2L))) // 2 words -> [aaaa] + [aa] = 2 tokens
    val vocab = Bpe.bpeVocab(d, 2, 100).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // freq DESC, subword ASC; both subwords occur once at one position
    assert(vocab === Seq(("aa", 1L, 1L), ("aaaa", 1L, 1L)))
  }

  test("gate corpus: per-doc encode counts equal an independent encoder's") {
    val sfDir = "/root/testdata/sf0.001"
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val freqs = docs.flatMap(_._2.split(" ", -1).filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val table = referenceTable(freqs, Bpe.BpeMerges)
    val expect = docs.toSeq.flatMap { case (id, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      if (ws.isEmpty) None
      else Some((id, ws.length.toLong, ws.map(w => table(w).size.toLong).sum))
    }.sortBy(_._1)
    val got = Bpe.taBpeEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
  }

  test("gate corpus: vocab histogram equals the independent table's, and tokens conserve") {
    val sfDir = "/root/testdata/sf0.001"
    import spark.implicits._
    val freqs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.split(" ", -1).filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val table = referenceTable(freqs, Bpe.BpeMerges)
    val expect = table.toSeq
      .flatMap { case (w, syms) => syms.map(s => (s, freqs(w))) }
      .groupBy(_._1)
      .map { case (s, xs) => (s, xs.map(_._2).sum, xs.length.toLong) }
      .toSeq.sortBy { case (s, f, _) => (-f, s) }
      .take(Bpe.BpeVocabTop)
    val got = Bpe.taBpeVocab(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    // conservation: corpus-wide post-BPE token mass seen two ways
    val encTotal = Bpe.taBpeEncode(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(encTotal === expect.map(_._2).sum,
      "per-doc encode totals must equal the vocab histogram's corpus mass")
  }
}
