package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-k-gram shingles of a string, as one tight per-row
  * loop. The declarative equivalent —
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i+1, k))))` — runs every lambda element interpreted
  * (~3 s of the sf0.1 minhash bench); this expression builds the
  * distinct shingle set in a single eval call per row. Array-producing
  * codegen buys little over that, so CodegenFallback is deliberate.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ")
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = mutable.LinkedHashSet.empty[String]
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s => UTF8String.fromString(s)).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  def shingles(c: Column, k: Int): Column =
    ExprBridge.toColumn(WordShingles(ExprBridge.toExpression(c), k))
}
