package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio container header parsing over an opaque `binary` payload
  * — the audio sibling of [[ImageHeader]], same contract: public,
  * stable formats whose stream parameters live in the leading bytes,
  * parsed without any codec.
  *
  *  - WAV: "RIFF"…"WAVE", then a CHUNK WALK — chunks are (id, LE-u32
  *    size, data) and the "fmt " chunk is not required to come first
  *    (LIST/JUNK/bext chunks legally precede it), so only a real walk
  *    finds it. Channels LE-u16 at fmt+2, sample rate LE-u32 at fmt+4,
  *    bits per sample LE-u16 at fmt+14.
  *  - FLAC: "fLaC" then the mandatory first STREAMINFO block: sample
  *    rate is a 20-BIT field straddling bytes 18–20, channels−1 the
  *    next 3 bits, bits-per-sample−1 the next 5 — bit-level packing no
  *    substring/conv composition expresses cleanly.
  *
  * Output: struct(format, sample_rate, channels, bits); null for an
  * unrecognized/truncated payload (corrupt rows stay visible). Same
  * referenced-object per-row call shape as [[ImageHeader]], so
  * projections stay inside whole-stage codegen. */
case class AudioHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY payload, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_header"

  private def row(fmt: String, sr: Int, ch: Int, bits: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), sr, ch, bits))

  /** Null for anything that is not a well-formed WAV/FLAC prefix.
    * Public so the generated code can call it. */
  def parse(b: Array[Byte]): InternalRow = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j))
    if (tag(0, "RIFF") && tag(8, "WAVE")) {
      var p = 12
      while (p + 8 <= b.length) {
        val size = le32(p + 4)
        if (tag(p, "fmt ")) {
          if (size < 16L || p + 8 + 16 > b.length) return null
          val d = p + 8
          return row("wav", le32(d + 4).toInt, le16(d + 2), le16(d + 14))
        }
        // a chunk can't outsize its payload — reject before any Int
        // overflow in the pointer arithmetic
        if (size > b.length) return null
        // chunks are word-aligned: odd sizes carry a pad byte
        p += 8 + size.toInt + (size.toInt & 1)
      }
      return null
    }
    if (tag(0, "fLaC")) {
      // 4-byte metadata block header, then STREAMINFO's fixed layout;
      // the first block MUST be STREAMINFO (type bits 0), length 34
      if (b.length < 8 + 22 || (u8(4) & 0x7f) != 0) return null
      val sr = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >> 4)
      val ch = ((u8(20) >> 1) & 0x7) + 1
      val bits = (((u8(20) & 1) << 4) | (u8(21) >> 4)) + 1
      if (sr == 0) return null // 0 is invalid per spec: treat as corrupt
      return row("flac", sr, ch, bits)
    }
    null
  }

  override def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("audioHeaderParser", this, classOf[AudioHeader].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioHeader =
    copy(child = newChild)
}

object AudioFunctions {
  /** struct(format, sample_rate, channels, bits) parsed from real
    * WAV/FLAC header bytes; null when the payload is neither. */
  def audio_header(c: Column): Column =
    ExprBridge.toColumn(AudioHeader(ExprBridge.toExpression(c)))
}
