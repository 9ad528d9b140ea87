package graft

import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** Pins each Gopher-style quality rule INDIVIDUALLY: the crafted fixture
  * has one document per rule that fails exactly that rule and passes the
  * other four, plus one document passing all five — so a threshold typo
  * or an inverted comparison in any single rule fails here even if the
  * synthetic gate corpus never trips it. (That matters for the symbol
  * rule specifically: the generator's vocabulary is pure [a-z0-9], so
  * on `documents` the rule is degenerate-by-construction — the second
  * test pins that degeneracy so a corpus change surfaces as a test
  * diff, not silent drift.)
  */
class GopherQualitySpec extends SparkSpec {

  private def mk(tokens: Seq[String]): String = tokens.mkString(" ")

  test("each rule fails exactly its crafted fixture doc") {
    import spark.implicits._
    val stop2 = Seq("the", "and")
    val fixture = Seq(
      // 50 tokens, mean len 3.96, 2 stopword hits, all distinct, no symbols
      (0L, "en", mk(stop2 ++ (0 until 48).map(i => f"w$i%03d"))),
      // 10 tokens < GopherMinTokens; every other rule passes
      (1L, "en", mk(stop2 ++ (0 until 8).map(i => f"w$i%03d"))),
      // 5-char filler tokens push mean word length to 4.92 > 4.5
      (2L, "en", mk(stop2 ++ (0 until 48).map(i => f"v$i%04d"))),
      // 50 distinct 4-char tokens, zero stopword hits
      (3L, "en", mk((0 until 50).map(i => f"x$i%03d"))),
      // 'word' x58: dup ratio 1 - 3/60 = 0.95 > 0.55
      (4L, "en", mk(stop2 ++ Seq.fill(58)("word"))),
      // 10 of 50 tokens carry '$': symbol ratio 0.2 > 0.1
      (5L, "en", mk(stop2 ++ (0 until 38).map(i => f"y$i%03d")
        ++ (0 until 10).map(i => s"a$$b$i"))),
    ).toDF("doc_id", "lang", "text")

    val got = TextAnalysis.gopherRules(fixture)
      .select("doc_id", "ok_len", "ok_wordlen", "ok_stopword", "ok_dup", "ok_symbol")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(got(0L) === ((true, true, true, true, true)))
    assert(got(1L) === ((false, true, true, true, true)))
    assert(got(2L) === ((true, false, true, true, true)))
    assert(got(3L) === ((true, true, false, true, true)))
    assert(got(4L) === ((true, true, true, false, true)))
    assert(got(5L) === ((true, true, true, true, false)))
  }

  test("a 0-token document fails the word-length rule (rule is total, not NULL)") {
    import spark.implicits._
    // without the n_tokens > 0 guard the mean-word-length division is
    // 0/0 — NULL in Spark (doc counted in NEITHER fail_wordlen nor
    // n_kept), inf in DuckDB (counted in fail_wordlen): a latent
    // engine/oracle divergence. The guard pins FALSE in both.
    val fixture = Seq((0L, "en", ""), (1L, "en", "   ")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.gopherRules(fixture)
      .select("doc_id", "ok_wordlen").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(0L -> false, 1L -> false))
  }

  test("gate corpus: four rules discriminate, the symbol rule is declared degenerate") {
    val agg = TextAnalysis.taGopherQuality(spark, "/root/testdata/sf0.001").collect()
    assert(agg.nonEmpty)
    def total(col: String): Long =
      agg.map(r => r.getLong(r.fieldIndex(col))).sum
    // the four content rules each reject real documents at gate scale
    assert(total("fail_len") > 0L)
    assert(total("fail_wordlen") > 0L)
    assert(total("fail_stopword") > 0L)
    assert(total("fail_dup") > 0L)
    // the generator vocabulary is [a-z0-9]+ — symbol failures MUST be 0;
    // if testdata ever gains symbol tokens this pin flags the change
    assert(total("fail_symbol") === 0L)
    // the filter keeps something and the kept token budget is positive
    assert(total("n_kept") > 0L)
    assert(total("tokens_kept") > 0L)
    // per-language doc counts add up to the corpus
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(total("n_docs") === n)
  }
}
