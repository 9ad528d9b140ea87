package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference engine's `normalizeWord` (`mpi_mapreduce.c:133-161`) as
  * a native Catalyst expression with whole-stage codegen — byte-exact
  * with the C code, including its signed-char edge: bytes ≥ 0x80 (BOM,
  * smart quotes, any UTF-8 continuation byte) compare negative and are
  * "non-alpha".
  *
  * Semantics: ASCII-lowercase in place; if at least one [a-z] byte
  * exists, strip leading/trailing non-alpha bytes; an all-non-alpha
  * token (`...`, `1871`) passes through unchanged. Output stays valid
  * UTF-8 whenever the input is: a multi-byte sequence is entirely
  * non-alpha bytes, so end-stripping never cuts one in half.
  *
  * One O(n) pass over the bytes replaces the built-in combo
  * (translate + rlike + regexp_replace = three scans plus regex
  * machinery) in the word-count hot path.
  */
case class NormalizeWord(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_word requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_word"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeWordImpl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeWordImpl.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeWord =
    copy(child = newChild)
}

/** Static implementation, referenced by both interpreted eval and the
  * generated Java (kept companion-free so scalac emits plain static
  * forwarders Janino can call).
  */
object NormalizeWordImpl {
  def normalize(s: UTF8String): UTF8String = {
    // getBytes may return UTF8String's INTERNAL array when the string is
    // exactly array-aligned — copy before mutating.
    val raw = s.getBytes
    val bytes = java.util.Arrays.copyOf(raw, raw.length)
    val n = bytes.length
    var hasAlpha = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 'A' && b <= 'Z') { bytes(i) = (b + 32).toByte; hasAlpha = true }
      else if (b >= 'a' && b <= 'z') hasAlpha = true
      i += 1
    }
    if (!hasAlpha) UTF8String.fromBytes(bytes)
    else {
      var lo = 0
      while (!(bytes(lo) >= 'a' && bytes(lo) <= 'z')) lo += 1
      var hi = n - 1
      while (!(bytes(hi) >= 'a' && bytes(hi) <= 'z')) hi -= 1
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, lo, hi + 1))
    }
  }
}
