package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole minhash signature in ONE pass over the shingle array.
  *
  * The compositional build — explode the shingles, `md5` each with a
  * per-family prefix, min-aggregate per doc — is correct but pays a
  * full shuffle of every (doc, shingle-hash) row to bring each
  * document's minima back together; at corpus scale that exchange
  * carries |shingles| rows for a result of one row per document. This
  * kernel computes the same minima inside the row that already holds
  * the array: no explode, no aggregate, no exchange. The signature
  * build becomes embarrassingly parallel map work.
  *
  * Output is BIT-IDENTICAL to the compositional form (and to the DuckDB
  * oracle, which replays it): hash family k over shingle s is the 8-hex
  * window `substr(md5(concat(k/4, '|', s)), (k%4)*8 + 1, 8)`, minima
  * compare lexicographically (ASCII hex ⇒ byte order, exactly
  * UTF8String's binary comparison), and the result string is the
  * in-order concatenation mh0‖mh1‖…‖mh(n-1) — so band b of r hashes is
  * `substring(sig, b*r*8 + 1, r*8)`, the same bytes the old
  * `concat(mh_{br}..mh_{br+r-1})` produced. Duplicate shingles cannot
  * change a min. Cross-checked against the compositional build in
  * MinhashSigSpec. Returns null for an empty or all-null array — the
  * document then produces null band values, which match nothing in the
  * candidate equi-join, exactly like its absence from the aggregated
  * signature table before.
  */
case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig: numHashes must be positive, got $numHashes")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // null on empty input array
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigImpl.sig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashSigImpl.sig($c, $numHashes);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** Column-level helper (same Bridge pattern as [[ByteSplit.split]]). */
  def sig(c: org.apache.spark.sql.Column, numHashes: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(MinhashSig(Bridge.expression(c), numHashes))
  }
}

/** Static kernel for interpreted eval and generated Java (plain static
  * forwarders for Janino — same pattern as [[NormalizeWordImpl]]).
  */
object MinhashSigImpl {
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def sig(arr: ArrayData, numHashes: Int): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return null
    val families = (numHashes + 3) / 4
    // "m|" prefix bytes per hash family — matches concat(lit(s"$m|"), s)
    val prefixes = new Array[Array[Byte]](families)
    var m = 0
    while (m < families) {
      prefixes(m) = (String.valueOf(m) + "|").getBytes("US-ASCII")
      m += 1
    }
    val digest = md.get()
    val hex = new Array[Byte](32)
    val mins = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (s != null) {
        val sb = s.getBytes
        m = 0
        while (m < families) {
          digest.reset()
          digest.update(prefixes(m))
          digest.update(sb)
          val d = digest.digest()
          var b = 0
          while (b < 16) {
            hex(b * 2) = HEX((d(b) >> 4) & 0xf)
            hex(b * 2 + 1) = HEX(d(b) & 0xf)
            b += 1
          }
          var j = 0
          while (j < 4) {
            val k = m * 4 + j
            if (k < numHashes) {
              val off = j * 8
              val cur = mins(k)
              if (cur == null || lessThan(hex, off, cur)) {
                val win = new Array[Byte](8)
                System.arraycopy(hex, off, win, 0, 8)
                mins(k) = win
              }
            }
            j += 1
          }
          m += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return null // all elements were null
    val out = new Array[Byte](numHashes * 8)
    var k = 0
    while (k < numHashes) {
      System.arraycopy(mins(k), 0, out, k * 8, 8)
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  /** hex[off..off+8) < cur[0..8) byte-lexicographically (ASCII hex, so
    * unsigned vs signed comparison is indistinguishable).
    */
  private def lessThan(hex: Array[Byte], off: Int, cur: Array[Byte]): Boolean = {
    var i = 0
    while (i < 8) {
      val a = hex(off + i)
      val b = cur(i)
      if (a != b) return a < b
      i += 1
    }
    false
  }
}
