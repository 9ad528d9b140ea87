package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp polynomial fingerprint of a string in ONE codegen pass:
  * h = Σ cp·31^i mod 1e9+7 over the string's code points.
  *
  * Replaces `aggregate(split(text, ''), 0L, (h, c) -> pmod(h*31 +
  * ascii(c), p))` — two interpreted lambda evaluations per character
  * plus a materialized one-char-string array per row. Bit-identical to
  * that form: Spark's `split` on the empty regex yields one element per
  * CODE POINT (Java regex splits between code points, keeping surrogate
  * pairs whole) and `ascii` returns the element's code point, so a
  * code-point walk with the same `floorMod` accumulation reproduces the
  * fold exactly (RollingHashSpec cross-checks on real docs plus
  * supplementary-plane and combining-mark edge cases).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashImpl.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashImpl.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-level helper (same Bridge pattern as [[ByteSplit.split]]). */
  def hash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(RollingHash(Bridge.expression(c)))
  }
}

/** Static kernel for interpreted eval and generated Java. */
object RollingHashImpl {
  private final val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = java.lang.Math.floorMod(h * 31L + cp, Mod)
      i += Character.charCount(cp)
    }
    h
  }
}
