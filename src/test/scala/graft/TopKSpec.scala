package graft

import graft.functions.{TermCount, TopKByCount}

/** The bounded top-k aggregator is correct under arbitrary merge order —
  * the property Spark's partial aggregation relies on.
  */
class TopKSpec extends SparkSpec {

  private val agg = new TopKByCount(3)

  test("reduce keeps only k best with (cnt desc, term asc) tiebreak") {
    val data = Seq(
      TermCount("b", 5), TermCount("a", 5), TermCount("z", 9),
      TermCount("c", 1), TermCount("d", 7))
    val got = data.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(got) == Seq(TermCount("z", 9), TermCount("d", 7), TermCount("a", 5)))
  }

  test("merge is associative-in-effect: split points don't change the result") {
    val data = (1 to 40).map(i => TermCount(s"t$i", (i * 7 % 13).toLong))
    val whole = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    for (split <- Seq(1, 7, 20, 39)) {
      val (l, r) = data.splitAt(split)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == whole, s"split=$split")
    }
  }

  test("typed aggregation end-to-end on a Dataset") {
    import spark.implicits._
    val ds = Seq(("en", "a", 3L), ("en", "b", 9L), ("en", "c", 5L), ("en", "d", 5L),
      ("de", "x", 1L)).toDS()
    val got = ds.groupByKey(_._1)
      .mapValues { case (_, t, c) => TermCount(t, c) }
      .agg(new TopKByCount(3).toColumn.name("top"))
      .collect().toMap
    assert(got("en") == Seq(TermCount("b", 9), TermCount("c", 5), TermCount("d", 5)))
    assert(got("de") == Seq(TermCount("x", 1)))
  }
}
