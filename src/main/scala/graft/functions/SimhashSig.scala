package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** 16-bit SimHash of a token array in ONE pass.
  *
  * The compositional form — explode tokens, md5 each, 16 conditional
  * ±1 sums per doc — shuffles one row per token to reassemble per-doc
  * vote sums the row holding the array can accumulate locally. Fused,
  * the simhash query is pure map work with NO exchange at all (the
  * only remaining ordering is the output sort).
  *
  * BIT-IDENTICAL to the compositional form (and the DuckDB oracle that
  * replays it): hex digit i (i = 0..15) of md5(token) votes +1 when the
  * digit is 8..f — i.e. the nibble's high bit — else −1; bit i of the
  * result is set when the vote sum is ≥ 0. Integer sums are
  * order-independent, so per-row accumulation ≡ the aggregate. Returns
  * null for an empty array: the exploded form produced no rows for a
  * token-less document, so it was absent from the aggregate — callers
  * filter nulls to preserve exactly that.
  */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // null on empty input array
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SimhashSigImpl.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Integer ${ev.value}Boxed = graft.functions.SimhashSigImpl.sig($c);
      ${ev.isNull} = ${ev.value}Boxed == null;
      if (!${ev.isNull}) ${ev.value} = ${ev.value}Boxed.intValue();
    """)

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {
  /** Column-level helper (same Bridge pattern as [[ByteSplit.split]]). */
  def sig(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(SimhashSig(Bridge.expression(c)))
  }
}

/** Static kernel for interpreted eval and generated Java (plain static
  * forwarders for Janino — same pattern as [[NormalizeWordImpl]]).
  */
object SimhashSigImpl {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def sig(arr: ArrayData): Integer = {
    val n = arr.numElements()
    if (n == 0) return null
    val digest = md.get()
    val sums = new Array[Int](16)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        digest.reset()
        val d = digest.digest(arr.getUTF8String(i).getBytes)
        // hex digit k of the md5 string = nibble k of the digest; the
        // digit is in 8..f exactly when the nibble's high bit is set
        var k = 0
        while (k < 16) {
          val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
          sums(k) += (if (nib >= 8) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var out = 0
    var k = 0
    while (k < 16) {
      if (sums(k) >= 0) out |= 1 << k
      k += 1
    }
    Integer.valueOf(out)
  }
}
