package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word 3-gram shingles straight from the text in ONE byte pass.
  *
  * Replaces the staged form — [[ByteSplit]] → non-empty filter → two
  * `zip_with` passes building (a,b) then (a,b,c) concatenations → slice
  * — which materializes three intermediate arrays and re-copies every
  * token twice per shingle. This kernel records token boundaries in one
  * scan and emits each shingle as a single byte-copy of the
  * corresponding source span... with one subtlety: tokens in a shingle
  * are joined by ONE space regardless of how many separated them in the
  * source (runs of spaces produce empty tokens, which the staged form
  * filters out), so spans with multi-space runs are rebuilt token by
  * token rather than copied verbatim.
  *
  * Contract (bit-identical to the staged form, ShinglesSpec):
  *   - ≥3 non-empty tokens: n−2 shingles "tᵢ tᵢ₊₁ tᵢ₊₂";
  *   - <3 tokens: one element, all tokens joined by single spaces
  *     ("" for empty/spaces-only text).
  */
case class WordShingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesImpl.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Column-level helper (same Bridge pattern as [[ByteSplit.split]]). */
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(WordShingles(Bridge.expression(c)))
  }
}

/** Static kernel for interpreted eval and generated Java. */
object WordShinglesImpl {
  def shingles(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // one scan: record non-empty token [start, end) boundaries
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var count = 0
    var i = 0
    var tokStart = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > tokStart) { // non-empty token
          if (count == cap) {
            cap *= 2
            starts = java.util.Arrays.copyOf(starts, cap)
            ends = java.util.Arrays.copyOf(ends, cap)
          }
          starts(count) = tokStart
          ends(count) = i
          count += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    def join(from: Int, until: Int): UTF8String = {
      var len = 0
      var k = from
      while (k < until) { len += ends(k) - starts(k); k += 1 }
      if (until > from) len += until - from - 1 // single-space joints
      val out = new Array[Byte](len)
      var pos = 0
      k = from
      while (k < until) {
        if (k > from) { out(pos) = ' '; pos += 1 }
        val tl = ends(k) - starts(k)
        System.arraycopy(bytes, starts(k), out, pos, tl)
        pos += tl
        k += 1
      }
      UTF8String.fromBytes(out)
    }
    if (count < 3) {
      new GenericArrayData(Array[AnyRef](join(0, count)))
    } else {
      val out = new Array[AnyRef](count - 2)
      var j = 0
      while (j < count - 2) {
        out(j) = join(j, j + 3)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
