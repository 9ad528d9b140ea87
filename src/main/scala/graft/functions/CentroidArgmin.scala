package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment — the argmin of ‖v − c‖² over a
  * candidate array — as one native codegen'd kernel. Shared by the
  * two learned quantizers: PQ code assignment ([[graft.queries.Pq
  * .encode]], v = a subvector against one subspace's codebook) and
  * k-means cell assignment ([[graft.queries.KmeansIvf.assignCells]],
  * v = the embedding against the coarse centroids).
  *
  * Inputs: `sv` (array<float>, the vector) and `cands`
  * (array<struct<cid int, centroid array<float>, nc2 double>>, the
  * cid-SORTED broadcast candidate list with precomputed ‖c‖²).
  * Output: the cid of the nearest candidate, −1 on an empty list.
  *
  * Arithmetic is IDENTICAL to the built-in fold it replaces
  * ([[graft.queries.Pq.encode]]'s former
  * `aggregate(cands, struct(MaxValue, -1), (acc, c) =>
  * when(nv2 − 2·dot(sv,c) + nc2 < acc.d2, …))`): ‖sv‖² and each
  * dot are left folds of float→double products, d2 is
  * nv2 − 2.0·dot + nc2 on doubles, and the comparison is strict <
  * against the running best — first-lowest wins ties, which on a
  * cid-sorted list is the lowest cid, exactly the (d2, cid) order the
  * DuckDB oracles replay with row_number. A candidate whose centroid
  * length mismatches `sv` (its dot would be null, poisoning d2 — the
  * fold keeps the accumulator) is skipped, same observable result.
  *
  * What changes is cost: the fold evaluated K interpreted lambda
  * bodies per row, each allocating a zipped intermediate array for its
  * dot — this is one generated loop nest. Encoding evaluates n·M of
  * these argmins (every subvector of every vector, per training
  * iteration and once for the final code table); at 100 TB this loop
  * IS the PQ encode kernel.
  */
case class CentroidArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(StructType(Array(f0, f1, f2)), _) =>
        f0.dataType == IntegerType &&
          (f1.dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          }) && f2.dataType == DoubleType
      case _ => false
    }
    if (okLeft && okRight) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"centroid_argmin requires (array<float>, array<struct<int, array<float>, " +
        s"double>>), got ${left.dataType.catalogString} and " +
        s"${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_argmin"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sv = a.asInstanceOf[ArrayData]
    val cands = b.asInstanceOf[ArrayData]
    val n = sv.numElements()
    var nv2 = 0.0
    var i = 0
    while (i < n) { nv2 += sv.getFloat(i).toDouble * sv.getFloat(i).toDouble; i += 1 }
    var best = Double.MaxValue
    var bestCid = -1
    val k = cands.numElements()
    var j = 0
    while (j < k) {
      if (!cands.isNullAt(j)) {
        val c = cands.getStruct(j, 3)
        // a null centroid/nc2 (or a length-mismatched centroid, whose
        // dot would be null) poisons d2 in the fold formulation, which
        // then keeps the accumulator — skip the candidate
        if (!c.isNullAt(1) && !c.isNullAt(2)) {
          val cen = c.getArray(1)
          if (cen.numElements() == n) {
            var d = 0.0
            var t = 0
            while (t < n) { d += sv.getFloat(t).toDouble * cen.getFloat(t).toDouble; t += 1 }
            val d2 = nv2 - 2.0 * d + c.getDouble(2)
            if (d2 < best) { best = d2; bestCid = c.getInt(0) }
          }
        }
      }
      j += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, cands) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val k = ctx.freshName("k")
      val nv2 = ctx.freshName("nv2")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val c = ctx.freshName("c")
      val cen = ctx.freshName("cen")
      val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2")
      val rowCls = classOf[InternalRow].getName
      val arrCls = classOf[ArrayData].getName
      s"""
         |final int $n = $sv.numElements();
         |double $nv2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nv2 += (double) $sv.getFloat($i) * (double) $sv.getFloat($i);
         |}
         |double $best = Double.MAX_VALUE;
         |int $bestCid = -1;
         |final int $k = $cands.numElements();
         |for (int $j = 0; $j < $k; $j++) {
         |  if (!$cands.isNullAt($j)) {
         |    final $rowCls $c = $cands.getStruct($j, 3);
         |    if (!$c.isNullAt(1) && !$c.isNullAt(2)) {
         |      final $arrCls $cen = $c.getArray(1);
         |      if ($cen.numElements() == $n) {
         |        double $d = 0.0;
         |        for (int $t = 0; $t < $n; $t++) {
         |          $d += (double) $sv.getFloat($t) * (double) $cen.getFloat($t);
         |        }
         |        final double $d2 = $nv2 - 2.0 * $d + $c.getDouble(2);
         |        if ($d2 < $best) { $best = $d2; $bestCid = $c.getInt(0); }
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidArgmin =
    copy(left = newLeft, right = newRight)
}
