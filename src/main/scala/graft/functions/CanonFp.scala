package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical-text md5 fingerprint —
  * `md5(regexp_replace(trim(lower(text)), "\\s+", " "))` as one fused
  * kernel. That staged form is the exact-dedup key of seven queries
  * (dd_exact / dd_incremental / dd_bloom_gate / dd_manifest /
  * dd_pipeline_manifest / dd_split / ta_fingerprint / st_contam), and
  * its cost is dominated by RegExpReplace's round trip: UTF8String →
  * java.lang.String (UTF-16 widening) → Matcher + StringBuffer →
  * String → UTF8String — three full copies of every document before
  * md5 sees a byte.
  *
  * Bit-exactness by construction, piece by piece:
  *   - lower(): calls [[UTF8String#toLowerCase]] — this kernel calls
  *     the SAME method (default UTF8_BINARY collation path).
  *   - trim(): strips 0x20 only — [[UTF8String#trim]], same method.
  *   - regexp_replace("\\s+", " "): java.util.regex `\s` without
  *     UNICODE_CHARACTER_CLASS is exactly [ \t\n\x0B\f\r] — six ASCII
  *     bytes that can never appear inside a multi-byte UTF-8 sequence
  *     (continuation bytes are ≥ 0x80), so a byte scan collapsing each
  *     maximal run to one 0x20 is char-exact.
  *   - md5(): MessageDigest over the canonical bytes, lowercase hex —
  *     what Md5(Cast(_, BinaryType)) computes.
  * CanonFpSpec fuzz-pins the fused column against the staged builtin
  * form (tabs/newlines/unicode/space-run cases), which is also what
  * every consumer's DuckDB oracle replays.
  */
case class CanonFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canon_fp requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "canon_fp"

  override protected def nullSafeEval(input: Any): Any =
    CanonFpImpl.fp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonFpImpl.fp($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonFp =
    copy(child = newChild)
}

object CanonFp {
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(CanonFp(Bridge.expression(c)))
  }
}

/** Static kernel for interpreted eval and generated Java. */
object CanonFpImpl {
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def fp(s: UTF8String): UTF8String = {
    // the builtins' own lower + trim — bit-exact by construction
    val t = s.toLowerCase.trim()
    val bytes = t.getBytes
    val n = bytes.length
    // collapse each maximal [ \t\n\x0B\f\r]+ run to a single 0x20
    val out = new Array[Byte](n)
    var m = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (isWs(b)) {
        out(m) = ' '
        m += 1
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
      } else {
        out(m) = b
        m += 1
        i += 1
      }
    }
    val digest = md.get()
    digest.reset()
    digest.update(out, 0, m)
    val d = digest.digest()
    val hex = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      hex(b * 2) = HEX((d(b) >> 4) & 0xf)
      hex(b * 2 + 1) = HEX(d(b) & 0xf)
      b += 1
    }
    UTF8String.fromBytes(hex)
  }
}
