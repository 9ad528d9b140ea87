package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All-bits random-hyperplane LSH signature in ONE pass over the vector.
  *
  * The compositional form — `bits` separate [[DotProduct]] expressions,
  * each re-reading the embedding array — is semantically identical but
  * reads the array `bits` times per row (192× for the embed-LSH config).
  * This kernel walks the vector once, keeping `bits` double accumulators
  * hot in cache, and emits the '+'/'-' signature directly.
  *
  * Bit j's value is BIT-IDENTICAL to
  * `when(dot_product(e, w_j) >= 0, "+").otherwise("-")`: the inner
  * accumulation is `acc += (double) e[d] * (double) w[j*dims+d]` in
  * ascending d — the same operand casts and addition order as
  * [[DotProduct]] — and a length-mismatched vector yields all '-', the
  * same result the compositional form produces via null-poisoned dots
  * (`when(null >= 0, ...)` takes the otherwise branch). Cross-checked
  * against the compositional form in EmbedLshSpec; the DuckDB oracle
  * replays the identical hyperplanes unchanged.
  */
case class HyperplaneSig(child: Expression, bits: Int, dims: Int, flatWeights: Array[Float])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if flatWeights.length == bits * dims =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig: ${flatWeights.length} weights for $bits x $dims")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float>, got ${dt.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSigImpl.sig(input.asInstanceOf[ArrayData], flatWeights, bits, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("hpWeights", flatWeights, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSigImpl.sig($c, $w, $bits, $dims)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Static kernel for interpreted eval and generated Java (plain static
  * forwarders for Janino — same pattern as [[NormalizeWordImpl]]).
  */
object HyperplaneSigImpl {
  def sig(arr: ArrayData, w: Array[Float], bits: Int, dims: Int): UTF8String = {
    val out = new Array[Byte](bits)
    if (arr.numElements() != dims) {
      java.util.Arrays.fill(out, '-'.toByte)
      return UTF8String.fromBytes(out)
    }
    val acc = new Array[Double](bits)
    var d = 0
    while (d < dims) {
      val e = arr.getFloat(d).toDouble
      var j = 0
      while (j < bits) {
        acc(j) += e * w(j * dims + d).toDouble
        j += 1
      }
      d += 1
    }
    var j = 0
    while (j < bits) {
      out(j) = if (acc(j) >= 0) '+' else '-'
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
