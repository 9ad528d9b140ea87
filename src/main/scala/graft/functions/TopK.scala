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
  *
  * Buffer invariant: always sorted by (cnt desc, term asc) and ≤ k long —
  * maintained by insertion, never by re-sorting. Once the buffer is full,
  * the common case (incoming element ranks below the current k-th) is an
  * O(1) comparison against the tail; an insert is one O(k) array splice.
  * `merge` is a single pass over two sorted buffers. Every buffer this
  * aggregator ever receives came from `zero`/`reduce`/`merge` (possibly
  * through the encoder, which preserves element order), so the invariant
  * is self-sustaining.
  */
class TopKByCount(k: Int) extends Aggregator[TermCount, Seq[TermCount], Seq[TermCount]] {
  require(k > 0)

  /** Strict "ranks strictly higher than" for the (cnt desc, term asc) order. */
  private def outranks(a: TermCount, b: TermCount): Boolean =
    a.cnt > b.cnt || (a.cnt == b.cnt && a.term < b.term)

  override def zero: Seq[TermCount] = Seq.empty

  override def reduce(buf: Seq[TermCount], a: TermCount): Seq[TermCount] =
    if (buf.length == k && !outranks(a, buf.last)) buf
    else {
      val i = buf.indexWhere(outranks(a, _)) match {
        case -1 => buf.length
        case n  => n
      }
      ((buf.take(i) :+ a) ++ buf.drop(i)).take(k)
    }

  override def merge(a: Seq[TermCount], b: Seq[TermCount]): Seq[TermCount] = {
    val out = Seq.newBuilder[TermCount]
    var n = 0
    var i = 0
    var j = 0
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && !outranks(b(j), a(i)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[TermCount]): Seq[TermCount] = buf
  override def bufferEncoder: Encoder[Seq[TermCount]] =
    ExpressionEncoder[Seq[TermCount]]()
  override def outputEncoder: Encoder[Seq[TermCount]] =
    ExpressionEncoder[Seq[TermCount]]()
}
