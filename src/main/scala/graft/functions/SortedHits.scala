package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** How many elements of `left` (a DISTINCT string array) are members of
  * `right` (a string array SORTED ascending in Spark's binary UTF8
  * ordering — `sort_array`'s order)? Binary search per probe element.
  *
  * Result-identical to `size(array_intersect(left, right))` when the
  * probe side is already distinct (array_intersect returns the distinct
  * members of the intersection; SortedHitsSpec fuzz-pins the equality)
  * — what changes is cost. The broadcast-probe decontamination screen
  * evaluates this once per arriving document against a benchmark
  * shingle set of tens of thousands of entries, and `array_intersect`
  * builds a fresh hash set over the ENTIRE broadcast array for every
  * row: O(|eval|) hashing + allocation per document. The probe side is
  * two orders of magnitude smaller, so searching each probe element in
  * the sorted broadcast array is O(|probe|·log|eval|) with zero
  * per-row set construction — at the sf0.1 screen (16.5k eval
  * shingles, ~100-shingle docs) that is ~50× less work in the
  * per-micro-batch hot loop, and the gap widens with the benchmark
  * suite.
  *
  * The SORTED-input contract is the caller's (the screen builds the
  * array with `sort_array` inside the one-row broadcast frame); an
  * unsorted right side returns an undercount, which the fuzz spec
  * documents by construction rather than a runtime check — checking
  * order per row would cost the O(|eval|) scan this expression exists
  * to avoid.
  */
case class SortedHits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_hits requires two array<string> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_hits"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedHitsImpl.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedHitsImpl.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedHits =
    copy(left = newLeft, right = newRight)
}

object SortedHits {
  /** Column-level helper (same Bridge pattern as [[ByteSplit.split]]). */
  def of(probe: org.apache.spark.sql.Column,
      sorted: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(SortedHits(Bridge.expression(probe), Bridge.expression(sorted)))
  }
}

/** Static kernel for interpreted eval and generated Java. */
object SortedHitsImpl {
  def count(probe: ArrayData, sorted: ArrayData): Int = {
    val n = probe.numElements()
    val m = sorted.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      // null probe elements match nothing (array_intersect drops them
      // from the result on a null-free right side — same count)
      if (!probe.isNullAt(i)) {
        val x = probe.getUTF8String(i)
        var lo = 0
        var hi = m - 1
        var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          // a null element cannot appear in a sort_array-built eval
          // set from non-null inputs; treat it as smaller-than-all
          // (sort_array puts nulls first), keeping the search total
          val c =
            if (sorted.isNullAt(mid)) -1
            else sorted.getUTF8String(mid).compareTo(x)
          if (c == 0) found = true
          else if (c < 0) lo = mid + 1
          else hi = mid - 1
        }
        if (found) hits += 1
      }
      i += 1
    }
    hits
  }
}
