package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Nearest-centroid assignment for IVF index maintenance
  * (graft.operators.Ivf.append): argmin over the index's centroids by
  * squared Euclidean distance, ties to the lowest cell id — the same
  * rule KMeans' own transform applies at fit time, so appended vectors
  * land in the cell a refit-free index expects to probe. One fused
  * generated loop per row (k·dim distance terms); the centroid matrix
  * rides as a reference object like PqEncode's codebooks. Null on a
  * null / wrong-length / null-element input (corrupt rows stay
  * visible, as in VecBinaryOp). */
case class IvfAssign(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with VecUnaryInput {

  private def k: Int = centroids.length
  private def dim: Int = centroids(0).length

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_assign"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (elemNullable && a.isNullAt(i)) return null
      i += 1
    }
    var best = 0
    var bd = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var d = 0.0
      var t = 0
      while (t < dim) {
        val diff = getElem(a, t) - centroids(c)(t)
        d += diff * diff; t += 1
      }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val bd = ctx.freshName("bd")
      val best = ctx.freshName("best")
      val diff = ctx.freshName("diff")
      val nullScan =
        if (elemNullable)
          s"""for (int $i = 0; $i < $dim; $i++) {
             |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    int $best = 0;
         |    double $bd = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $dim; $t++) {
         |        double $diff = ${getter(a, t)} - $cents[$c][$t];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bd) { $bd = $d; $best = $c; }
         |    }
         |    ${ev.value} = $best;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}

/** The `spill` nearest centroids, closest first (ties to the lowest
  * cell id — consistent with [[IvfAssign]]: element 0 IS ivf_assign's
  * answer). Multi-assignment ("spilled" IVF): storing a vector in its
  * top-`spill` cells lets a fixed-nprobe query find boundary vectors
  * whose second-closest cell is the one probed — recall bought with
  * storage (×spill) and per-cell scan size, not more probes. Same
  * fused generated loop as [[IvfAssign]] plus an insertion step over
  * the spill-sized result (spill is 2-4 in practice). */
case class IvfAssignMulti(child: Expression, centroids: Array[Array[Double]],
                          spill: Int)
    extends UnaryExpression with VecUnaryInput {

  require(spill >= 1 && spill <= centroids.length,
    s"ivf_assign_multi: spill must be in [1, ${centroids.length}], got $spill")

  private def k: Int = centroids.length
  private def dim: Int = centroids(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_assign_multi"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (elemNullable && a.isNullAt(i)) return null
      i += 1
    }
    val bestIdx = new Array[Int](spill)
    val bestD = Array.fill(spill)(Double.PositiveInfinity)
    var c = 0
    while (c < k) {
      var d = 0.0
      var t = 0
      while (t < dim) {
        val diff = getElem(a, t) - centroids(c)(t)
        d += diff * diff; t += 1
      }
      // strict < keeps ties on the lowest id (earlier c wins)
      if (d < bestD(spill - 1)) {
        var p = spill - 1
        while (p > 0 && d < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestIdx(p) = bestIdx(p - 1); p -= 1
        }
        bestD(p) = d; bestIdx(p) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val arrData = classOf[org.apache.spark.sql.catalyst.util.ArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val bi = ctx.freshName("bestIdx")
      val bd = ctx.freshName("bestD")
      val diff = ctx.freshName("diff")
      val nullScan =
        if (elemNullable)
          s"""for (int $i = 0; $i < $dim; $i++) {
             |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    int[] $bi = new int[$spill];
         |    double[] $bd = new double[$spill];
         |    java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $dim; $t++) {
         |        double $diff = ${getter(a, t)} - $cents[$c][$t];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bd[$spill - 1]) {
         |        int $p = $spill - 1;
         |        while ($p > 0 && $d < $bd[$p - 1]) {
         |          $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |        }
         |        $bd[$p] = $d; $bi[$p] = $c;
         |      }
         |    }
         |    ${ev.value} = $arrData.toArrayData($bi);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssignMulti =
    copy(child = newChild)
}

object IvfFunctions {
  def ivf_assign(c: Column, centroids: Array[Array[Double]]): Column =
    ExprBridge.toColumn(IvfAssign(ExprBridge.toExpression(c), centroids))

  def ivf_assign_multi(c: Column, centroids: Array[Array[Double]],
                       spill: Int): Column =
    ExprBridge.toColumn(
      IvfAssignMulti(ExprBridge.toExpression(c), centroids, spill))
}
