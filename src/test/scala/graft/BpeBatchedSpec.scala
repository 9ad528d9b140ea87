package graft

import graft.queries.Bpe

/** Batched BPE training must be RULE-FOR-RULE identical to the
  * sequential trainer — that is its whole contract (the batch-selection
  * proof in Bpe.trainStateBatched's Scaladoc, exercised here): on
  * closed-form fixtures including tie/interference adversaries, on
  * seeded fuzz corpora at a small maxBatch (forcing many batch
  * boundaries), and on the gate corpus at a deep merge budget.
  */
class BpeBatchedSpec extends SparkSpec {

  private def rules(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq

  private def seqVsBatched(text: Seq[String], merges: Int, maxBatch: Int): Unit = {
    import spark.implicits._
    val d = text.toDF("text")
    val got = rules(Bpe.bpeTrainBatched(d, merges, maxBatch))
    val expect = rules(Bpe.bpeTrain(d, merges))
    assert(got === expect, s"corpus: ${text.mkString("|")} maxBatch=$maxBatch")
  }

  test("closed-form fixtures match the sequential trainer") {
    // chaining fixture: round-2 merges the round-1 symbol, so the two
    // rules interfere and must land in different batches
    seqVsBatched(Seq("abab abab ab"), 4, 64)
    // greedy non-overlap on repeated symbols, same interference shape
    seqVsBatched(Seq("aaaa"), 2, 64)
    // two independent pair families (disjoint alphabets) CAN batch:
    // (a,b) and (c,d) commute and must both come out with sequential
    // counts and order
    seqVsBatched(Seq("ab ab ab cd cd xy"), 3, 64)
  }

  test("interference adversaries: ties between touching and disjoint pairs") {
    // (a,b) cnt 3; then (b,c) cnt 2 touches it; (d,e) cnt 2 is disjoint
    // but TIES the touching pair, so the strict barrier must evict it
    // from round 1's batch — the sequential order decides round 2
    seqVsBatched(Seq("ab ab abc bc de de"), 4, 64)
    // merged-symbol interference: (a,b) creates "ab" which (ab,c)
    // consumes; they must not share a batch
    seqVsBatched(Seq("ab ab ab abc abc"), 4, 64)
    // merged-symbol COLLISION: (a,bc) and (ab,c) both create "abc"
    seqVsBatched(Seq("a a ab bc c abc"), 4, 64)
  }

  test("single-character corpus: both trainers return EMPTY rules, not null") {
    import spark.implicits._
    // every word is one symbol — no pair ever exists, the first round
    // exhausts immediately; both trainers must hand back a usable
    // zero-row frame (the old code returned null and downstream NPE'd)
    val d = Seq("a b c", "x y z a").toDF("text")
    val seq = Bpe.bpeTrain(d, 4)
    val bat = Bpe.bpeTrainBatched(d, 4, 64)
    assert(seq.count() === 0L)
    assert(bat.count() === 0L)
    assert(seq.columns.toSeq === Seq("step", "lhs", "rhs", "merged", "pair_count"))
    assert(bat.columns.toSeq === Seq("step", "lhs", "rhs", "merged", "pair_count"))
  }

  test("gate corpus: deep merge budget, rule lists and symbol tables equal") {
    val d = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val merges = 32
    val (seqRules, seqWf) = Bpe.trainState(d, merges)
    val (batRules, batWf) = Bpe.trainStateBatched(d, merges)
    val a = rules(seqRules.orderBy("step")
      .selectExpr("step", "l", "r", "l || r AS m", "cnt"))
    val b = rules(batRules.orderBy("step")
      .selectExpr("step", "l", "r", "l || r AS m", "cnt"))
    assert(b === a)
    assert(a.size === merges, "gate corpus must sustain 32 merges")
    // the trained symbol tables (what vocab/encode read) agree too
    val sa = seqWf.selectExpr("word", "array_join(syms, '') AS s")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    val sb = batWf.selectExpr("word", "array_join(syms, '') AS s")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(sb === sa)
  }

  test("seeded fuzz: 30 corpora at maxBatch=3 force many batch boundaries") {
    val rnd = new scala.util.Random(20260815)
    for (_ <- 1 to 30) {
      val alphabet = "ab" + ("cde".take(rnd.nextInt(3)))
      val words = Seq.fill(3 + rnd.nextInt(5)) {
        (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = Seq.fill(8)(words(rnd.nextInt(words.size))).mkString(" ")
      seqVsBatched(Seq(text), 5, 3)
    }
  }
}
