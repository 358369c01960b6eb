package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * Spark's higher-order functions (zip_with/aggregate lambdas) are
  * interpreted per element; for a 64-dim dot product that's ~200
  * boxed lambda calls per row. These expressions run one fused
  * generated loop per row instead (~20× faster in Bench) — the
  * "custom Expression beats composition" case from SURVEY §4.
  *
  * Element types: array<float> or array<double>; both sides accumulate
  * in double left-to-right, which is also exactly what DuckDB's
  * list_cosine_similarity over DOUBLE[] computes — keeping oracle
  * parity bit-exact.
  */
trait VecBinaryOp extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // always nullable: mismatched lengths / null elements yield NULL (a
  // visible failure on corrupt input, matching DuckDB's list_* semantics)
  // rather than silently truncating to the shorter array
  override def nullable: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def getter(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemIsFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  /** Generated guard that nulls the result on a null element; empty
    * when the array type statically has no null elements, so the hot
    * loop carries no dead branch. */
  protected def nullElemGuard(a: String, b: String, i: String, ev: ExprCode): String = {
    val checks = Seq(
      if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
      if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None).flatten
    if (checks.isEmpty) ""
    else s"if (${checks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
  }

  /** Interpreted-path guard: true when position i holds a null element. */
  protected def hasNullElem(x: ArrayData, y: ArrayData, i: Int): Boolean =
    (elemNullable(left) && x.isNullAt(i)) || (elemNullable(right) && y.isNullAt(i))
}

/** dot(a, b): Σ a_i * b_i in one generated loop. */
case class DotProduct(left: Expression, right: Expression) extends VecBinaryOp {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // corrupt row: visible, not truncated
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (hasNullElem(x, y, i)) return null
      acc += getElem(left, x, i) * getElem(right, y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${nullElemGuard(a, b, i, ev)}
         |    $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** cosine(a, b): Σab / (√Σa² · √Σb²), all three sums in ONE loop. */
case class CosineSim(left: Expression, right: Expression) extends VecBinaryOp {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // corrupt row: visible, not truncated
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      if (hasNullElem(x, y, i)) return null
      val xi = getElem(left, x, i); val yi = getElem(right, y, i)
      xy += xi * yi; xx += xi * xi; yy += yi * yi
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $xy = 0.0, $xx = 0.0, $yy = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${nullElemGuard(a, b, i, ev)}
         |    double $xi = ${getter(left, a, i)};
         |    double $yi = ${getter(right, b, i)};
         |    $xy += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column =
    ExprBridge.toColumn(DotProduct(ExprBridge.toExpression(a), ExprBridge.toExpression(b)))

  def vec_cosine(a: Column, b: Column): Column =
    ExprBridge.toColumn(CosineSim(ExprBridge.toExpression(a), ExprBridge.toExpression(b)))
}
