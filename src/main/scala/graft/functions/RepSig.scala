package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Repetition-signal counts in ONE byte pass:
  * (n_tokens, n_distinct, n_bigrams, n_distinct_bigrams) over the
  * non-empty single-space tokens — the inputs of `ta_repetition`'s
  * duplicate-content ratios.
  *
  * Replaces the staged form — [[ByteSplit]] → non-empty filter →
  * `array_distinct` → guarded double-`slice` + `zip_with` bigram build
  * → second `array_distinct` — which materializes the token array, the
  * bigram array, and two Catalyst distinct passes per row. This kernel
  * records token boundaries in one scan and counts distincts with open
  * hash sets over zero-copy byte spans (bigrams hash the two spans
  * joined by one space, matching the staged concat exactly).
  *
  * Contract (bit-identical to the staged form, RepSigSpec):
  *   - tokens: maximal non-empty runs between ' ' separators (tabs/\r
  *     kept inside tokens, same as [[ByteSplit]]);
  *   - n_bigrams = max(n_tokens − 1, 0); both distinct counts are 0
  *     when their base count is 0.
  */
case class RepSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rep_sig requires STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = RepSig.schema
  override def prettyName: String = "rep_sig"

  override protected def nullSafeEval(input: Any): Any =
    RepSigImpl.sig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepSigImpl.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): RepSig =
    copy(child = newChild)
}

object RepSig {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))

  /** Column-level helper (same Bridge pattern as [[ByteSplit.split]]). */
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(RepSig(Bridge.expression(c)))
  }
}

/** Static kernel for interpreted eval and generated Java. */
object RepSigImpl {
  def sig(s: UTF8String): InternalRow = {
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
        if (i > tokStart) {
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
    // distinct tokens: zero-copy spans over the source bytes
    val tokSet = new java.util.HashSet[UTF8String](Math.max(16, count * 2))
    var k = 0
    while (k < count) {
      tokSet.add(UTF8String.fromBytes(bytes, starts(k), ends(k) - starts(k)))
      k += 1
    }
    // distinct adjacent bigrams: the two spans joined by one space —
    // byte-equal to the staged concat(a, ' ', b)
    val bgSet = new java.util.HashSet[UTF8String](Math.max(16, count * 2))
    k = 0
    while (k < count - 1) {
      val l1 = ends(k) - starts(k)
      val l2 = ends(k + 1) - starts(k + 1)
      val out = new Array[Byte](l1 + 1 + l2)
      System.arraycopy(bytes, starts(k), out, 0, l1)
      out(l1) = ' '
      System.arraycopy(bytes, starts(k + 1), out, l1 + 1, l2)
      bgSet.add(UTF8String.fromBytes(out))
      k += 1
    }
    new GenericInternalRow(Array[Any](
      count, tokSet.size, Math.max(count - 1, 0), bgSet.size))
  }
}
