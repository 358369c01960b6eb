package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Native expressions for product quantization (see
  * graft.operators.Pq): encoding a float/double embedding into m
  * sub-codebook codes, and ADC (asymmetric distance computation)
  * scoring of a code array against a per-query lookup table. Both are
  * single fused generated loops per row — the encode visits
  * m·ksub·dsub codebook entries, the ADC probe is m table lookups —
  * and both fall back to an identical interpreted path.
  */

/** Shared element-access helpers for a unary expression over an
  * embedding array (array<float> or array<double>). */
trait VecUnaryInput { self: UnaryExpression =>
  protected def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def getter(arr: String, i: String): String =
    if (elemIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
  protected def getElem(arr: ArrayData, i: Int): Double =
    if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
  protected def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }
}

/** PQ encode: L2-normalize the vector, then per subspace j pick the
  * codebook entry with the smallest squared distance to the normalized
  * subvector (ties break to the lowest code). Normalizing makes
  * squared-L2 ADC ordering equal cosine ordering
  * (‖a−b‖² = 2 − 2·cos for unit vectors), so the shortlist ADC
  * produces ranks by the same metric the exact re-rank uses.
  * Output: array<int> of length m; null on a null / wrong-length /
  * null-element input (corrupt rows stay visible, as in VecBinaryOp).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with VecUnaryInput {

  private def m: Int = codebooks.length
  private def ksub: Int = codebooks(0).length
  private def dsub: Int = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = m * dsub
    if (a.numElements() != dim) return null
    var ss = 0.0
    var i = 0
    while (i < dim) {
      if (elemNullable && a.isNullAt(i)) return null
      val v = getElem(a, i); ss += v * v; i += 1
    }
    val inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bd = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = getElem(a, j * dsub + t) * inv - codebooks(j)(c)(t)
          d += diff * diff; t += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      codes(j) = best; j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val ss = ctx.freshName("ss")
      val inv = ctx.freshName("inv")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val bd = ctx.freshName("bd")
      val best = ctx.freshName("best")
      val diff = ctx.freshName("diff")
      val nullElem =
        if (elemNullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ss = 0.0;
         |  for (int $i = 0; $i < ${m * dsub}; $i++) {
         |    $nullElem
         |    double $d = ${getter(a, i)};
         |    $ss += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    double $inv = $ss == 0.0 ? 0.0 : 1.0 / java.lang.Math.sqrt($ss);
         |    int[] $codes = new int[$m];
         |    for (int $j = 0; $j < $m; $j++) {
         |      int $best = 0;
         |      double $bd = Double.POSITIVE_INFINITY;
         |      for (int $c = 0; $c < $ksub; $c++) {
         |        double $d = 0.0;
         |        for (int $t = 0; $t < $dsub; $t++) {
         |          double $diff = ${getter(a, s"$j * $dsub + $t")} * $inv - $cb[$j][$c][$t];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bd) { $bd = $d; $best = $c; }
         |      }
         |      $codes[$j] = $best;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** RESIDUAL PQ encode — the standard IVF-PQ formulation (Jégou et
  * al.): the code quantizes `v̂ − centroid(cell)` instead of v̂
  * itself. The residual concentrates around the origin with far less
  * variance than the raw vector, so the same m codes quantize much
  * finer; within a cell ADC distances are EXACT in the offset
  * (‖(q̂−c)−(v̂−c)‖² = ‖q̂−v̂‖²), so correctness is untouched and only
  * quantization error shrinks. The residual is NOT re-normalized —
  * that would destroy the identity. Children: (embedding, cell id);
  * `centroids` is the cell-indexed matrix riding the expression like
  * the codebooks. Null on null/corrupt input or an out-of-range cell.
  */
case class PqEncodeResidual(left: Expression, right: Expression,
                            centroids: Array[Array[Double]],
                            codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def m: Int = codebooks.length
  private def ksub: Int = codebooks(0).length
  private def dsub: Int = codebooks(0)(0).length

  // an un-validated LongType cell would compile-error the generated
  // `centroids[cell]` index (forcing interpreted fallback) and then
  // ClassCastException mid-scan — make it an analysis-time error
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects an INT cell id, got ${right.dataType}")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got $other")
    }
  }

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def getter(arr: String, i: String): String =
    if (elemIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
  private def getElem(arr: ArrayData, i: Int): Double =
    if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
  private def elemNullable: Boolean = left.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_residual"

  override def nullSafeEval(vec: Any, cellAny: Any): Any = {
    val a = vec.asInstanceOf[ArrayData]
    val cell = cellAny.asInstanceOf[Int]
    val dim = m * dsub
    if (a.numElements() != dim || cell < 0 || cell >= centroids.length) return null
    var ss = 0.0
    var i = 0
    while (i < dim) {
      if (elemNullable && a.isNullAt(i)) return null
      val v = getElem(a, i); ss += v * v; i += 1
    }
    val inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    val cent = centroids(cell)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bd = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val idx = j * dsub + t
          val diff = getElem(a, idx) * inv - cent(idx) - codebooks(j)(c)(t)
          d += diff * diff; t += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      codes(j) = best; j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val cm = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, cell) => {
      val ss = ctx.freshName("ss")
      val inv = ctx.freshName("inv")
      val cent = ctx.freshName("cent")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val bd = ctx.freshName("bd")
      val best = ctx.freshName("best")
      val diff = ctx.freshName("diff")
      val nullElem =
        if (elemNullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != ${m * dsub} || $cell < 0 || $cell >= $cm.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ss = 0.0;
         |  for (int $i = 0; $i < ${m * dsub}; $i++) {
         |    $nullElem
         |    double $d = ${getter(a, i)};
         |    $ss += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    double $inv = $ss == 0.0 ? 0.0 : 1.0 / java.lang.Math.sqrt($ss);
         |    double[] $cent = $cm[$cell];
         |    int[] $codes = new int[$m];
         |    for (int $j = 0; $j < $m; $j++) {
         |      int $best = 0;
         |      double $bd = Double.POSITIVE_INFINITY;
         |      for (int $c = 0; $c < $ksub; $c++) {
         |        double $d = 0.0;
         |        for (int $t = 0; $t < $dsub; $t++) {
         |          double $diff = ${getter(a, s"$j * $dsub + $t")} * $inv
         |            - $cent[$j * $dsub + $t] - $cb[$j][$c][$t];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bd) { $bd = $d; $best = $c; }
         |      }
         |      $codes[$j] = $best;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeResidual =
    copy(left = newLeft, right = newRight)
}

/** ADC probe: Σ_j lut(j)(codes(j)) — the approximate squared L2
  * distance between the query and a PQ-coded vector, m array lookups
  * per row. Null on a wrong-length code array or an out-of-range code
  * (corrupt rows stay visible). */
case class PqAdc(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != lut.length) return null
    var s = 0.0
    var j = 0
    while (j < lut.length) {
      val c = codes.getInt(j)
      if (c < 0 || c >= lut(j).length) return null
      s += lut(j)(c); j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |if ($a.numElements() != ${lut.length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < ${lut.length}; $j++) {
         |    int $c = $a.getInt($j);
         |    if ($c < 0 || $c >= $lutRef[$j].length) { ${ev.isNull} = true; break; }
         |    $s += $lutRef[$j][$c];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

object PqFunctions {
  def pq_encode(c: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExprBridge.toColumn(PqEncode(ExprBridge.toExpression(c), codebooks))

  def pq_encode_residual(vec: Column, cell: Column,
                         centroids: Array[Array[Double]],
                         codebooks: Array[Array[Array[Double]]]): Column =
    ExprBridge.toColumn(PqEncodeResidual(ExprBridge.toExpression(vec),
      ExprBridge.toExpression(cell), centroids, codebooks))

  def pq_adc(c: Column, lut: Array[Array[Double]]): Column =
    ExprBridge.toColumn(PqAdc(ExprBridge.toExpression(c), lut))
}
