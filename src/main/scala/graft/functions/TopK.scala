package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (term, count) candidate flowing into [[TopKByCount]]. */
case class TermCount(term: String, cnt: Long)

/** Typed, mergeable top-k aggregator: keeps the k highest-count terms
  * (count desc, term asc tiebreak) per group.
  *
  * The buffer is bounded at k elements, so unlike a window-rank top-k
  * the full group never materializes: each partial aggregation emits at
  * most k rows per group to the shuffle, and `merge` combines two
  * k-bounded buffers — the same map-side-combine shape the reference's
  * `insert()` gives word counts, generalized to ranked selection. At
  * 100 TB this turns "top terms per language" from a
  * sort-the-whole-group problem into an O(k) state stream aggregate.
  */
class TopKByCount(k: Int) extends Aggregator[TermCount, Seq[TermCount], Seq[TermCount]] {
  require(k > 0)

  private def prune(xs: Seq[TermCount]): Seq[TermCount] =
    xs.sortBy(t => (-t.cnt, t.term)).take(k)

  override def zero: Seq[TermCount] = Seq.empty
  override def reduce(buf: Seq[TermCount], a: TermCount): Seq[TermCount] =
    prune(buf :+ a)
  override def merge(a: Seq[TermCount], b: Seq[TermCount]): Seq[TermCount] =
    prune(a ++ b)
  override def finish(buf: Seq[TermCount]): Seq[TermCount] = prune(buf)
  override def bufferEncoder: Encoder[Seq[TermCount]] =
    ExpressionEncoder[Seq[TermCount]]()
  override def outputEncoder: Encoder[Seq[TermCount]] =
    ExpressionEncoder[Seq[TermCount]]()
}
