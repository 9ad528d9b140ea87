package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's partitioning hash (`hashFunc`,
  * `mpi_mapreduce.c:108-117`):
  *
  * {{{ hash = 0; for each byte b: hash = ((hash << 4) ^ hash) ^ b; hash & 255 }}}
  *
  * in C signed-int32 two's-complement arithmetic over the word's BYTES
  * (`char* a; ... ^ a[i]`). Two parity notes:
  *
  *   - The C `char` is signed, so bytes ≥ 0x80 sign-extend before the
  *     xor — but `hash<<4 ^ hash ^ b` only ever moves bits UP, so bits
  *     ≥ 8 of the accumulator can never influence bits 0–7, and the
  *     final `& 255` makes sign extension provably irrelevant: the
  *     unsigned-byte fold is bit-identical. (Proved once, asserted by
  *     the high-byte cases in RefHashSpec.)
  *   - Iteration is per UTF-8 BYTE, not per codepoint: 'é' is one
  *     codepoint but two fold steps. [[RefHashWord]] folds over the
  *     UTF8String's raw bytes, byte-exact with the C loop for ANY
  *     input; [[ref_hash]] (built-ins, `ascii()` per character) is
  *     byte-exact for ASCII only and kept as the cross-check.
  *
  * The hash choice is semantics-invisible to the aggregate (SURVEY §2.4
  * — any total partitioning of keys yields identical counts); it exists
  * so the reference's bucket layout itself can be oracle-checked.
  */
object RefHash {

  /** Byte-exact column form: the codegen'd [[RefHashWord]] expression. */
  def ref_hash_bytes(word: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(RefHashWord(Bridge.expression(word)))
  }

  /** Built-ins-only cross-check (no UDF — serializable,
    * Catalyst-optimizable). Folds per CHARACTER via `ascii()`, so it
    * matches the C byte loop on ASCII input only.
    */
  def ref_hash(word: Column): Column =
    aggregate(
      filter(split(word, ""), c => c =!= ""),
      lit(0),
      (h, c) => shiftleft(h, 4).bitwiseXOR(h).bitwiseXOR(ascii(c)))
      .bitwiseAND(lit(255))

  /** JVM reference implementation (test oracle): the C loop verbatim,
    * over UTF-8 bytes.
    */
  def refHashExact(word: String): Int =
    RefHashImpl.hash(UTF8String.fromString(word))
}

/** `hashFunc` as a native Catalyst expression with whole-stage codegen —
  * one pass over the UTF-8 bytes, byte-exact with `mpi_mapreduce.c:108-117`
  * for all inputs including multi-byte UTF-8.
  */
case class RefHashWord(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ref_hash_word requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ref_hash_word"

  override protected def nullSafeEval(input: Any): Any =
    RefHashImpl.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RefHashImpl.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RefHashWord =
    copy(child = newChild)
}

/** Static implementation shared by interpreted eval and generated Java
  * (plain static forwarders for Janino — see NormalizeWordImpl).
  */
object RefHashImpl {
  def hash(s: UTF8String): Int = {
    val bytes = s.getBytes
    var h = 0
    var i = 0
    while (i < bytes.length) {
      // bytes(i) sign-extends like the C signed char; irrelevant mod 256
      // (see RefHash scaladoc) but kept literal for faithfulness.
      h = ((h << 4) ^ h) ^ bytes(i)
      i += 1
    }
    h & 255
  }
}
