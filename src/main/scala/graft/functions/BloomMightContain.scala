package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` probe against a pre-built Bloom filter — the apply
  * side of a bloom semi-join reduction (see graft.operators.Joins
  * .bloomJoin).
  *
  * The filter ships as its serialized bytes (`BloomFilter.writeTo`
  * format) inside the expression, deserialized once per
  * executor-deserialization into a transient field, so the probe in the
  * generated code is a direct `mightContainLong` call — one hash + a
  * few bit tests per row, inside whole-stage codegen. No false
  * negatives by Bloom-filter construction: a row whose key WAS inserted
  * always passes, so an exact join downstream sees every true match and
  * filters the (bounded-fpp) false positives.
  *
  * Input is the 64-bit key hash (pair with `xxhash64` on both build and
  * probe sides to make the reduction type-generic), output boolean.
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects the 64-bit key hash (LONG), got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** Broadcast-variable form of [[BloomMightContainLong]] for LARGE
  * filters: the expression carries only the broadcast HANDLE (a few
  * bytes in the task binary); the filter itself ships once per
  * executor through the torrent broadcast and is resolved lazily into
  * a per-operator field on first row. Use via
  * `Joins.bloomSemiFilterBroadcast` when the filter outgrows what
  * should ride inside every task's serialized plan (rule of thumb:
  * a few MB — the 10^8-key / ~120 MB regime belongs here). */
case class BloomMightContainBcast(
    child: Expression,
    bcast: org.apache.spark.broadcast.Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects the 64-bit key hash (LONG), got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_bcast"

  override def nullSafeEval(v: Any): Any =
    bcast.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val handle = ctx.addReferenceObj("graftBloomBcast", bcast,
      "org.apache.spark.broadcast.Broadcast")
    val filterCls = classOf[BloomFilter].getName
    // resolve the broadcast ONCE per operator instance, not per row
    val cached = ctx.addMutableState(filterCls, "graftBcastFilter")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($cached == null) { $cached = ($filterCls) $handle.value(); }
         |${ev.value} = $cached.mightContainLong($c);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBcast =
    copy(child = newChild)
}

object BloomFunctions {
  /** Column wrapper: does `filter` possibly contain the long in `c`? */
  def bloom_might_contain(c: Column, filterBytes: Array[Byte]): Column =
    ExprBridge.toColumn(BloomMightContainLong(ExprBridge.toExpression(c), filterBytes))

  /** Broadcast-variable probe for filters too large to embed in the
    * expression tree. */
  def bloom_might_contain_bcast(
      c: Column,
      b: org.apache.spark.broadcast.Broadcast[BloomFilter]): Column =
    ExprBridge.toColumn(BloomMightContainBcast(ExprBridge.toExpression(c), b))
}
