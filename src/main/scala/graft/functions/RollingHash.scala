package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes:
  * `h = h * 1315423911 + byte` (wrapping). A native Catalyst Expression
  * with `doGenCode`, so it participates in whole-stage codegen instead
  * of falling out of it like a Scala UDF would — the document
  * fingerprint primitive (reference analog: content fingerprinting for
  * the marker-id dedup in wrangle_data.Rmd's distinct()/alias logic).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1315423911L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 1315423911L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object GraftFunctions {
  /** Column wrapper for [[RollingHash]]. */
  def rolling_hash(c: Column): Column =
    ExprBridge.toColumn(RollingHash(ExprBridge.toExpression(c)))
}
