package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL image header parsing over an opaque `binary` payload column —
  * the honest upgrade of the multimodal decode stub: these are public,
  * stable container formats whose dimensions live in the first bytes,
  * so no codec is needed to read them.
  *
  *  - PNG: 8-byte signature, then the IHDR chunk — width/height are
  *    big-endian u32 at offsets 16/20 (PNG spec §11.2.2).
  *  - JPEG: SOI (FFD8) then a SEGMENT WALK — APP0/EXIF/DQT/… segments
  *    each carry a big-endian length; the walk skips them (and any FF
  *    fill bytes) until an SOFn frame header (C0–CF minus C4/C8/CC),
  *    where height/width are big-endian u16 at data offsets 1/3. The
  *    walk is why this is an Expression and not a `substring`/`conv`
  *    composition: segment count and sizes vary per file.
  *  - GIF: "GIF87a"/"GIF89a", then LITTLE-endian u16 width/height.
  *
  * Output: struct(format, width, height); null for an unrecognized or
  * truncated payload (corrupt rows stay visible, as in PqEncode).
  * The parse runs as one per-row method call on a referenced object —
  * the same shape as BloomMightContainLong's probe — so projections
  * using it stay inside whole-stage codegen. */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY payload, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_header"

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** Null for anything that is not a well-formed PNG/JPEG/GIF prefix.
    * Public so the generated code can call it. */
  def parse(b: Array[Byte]): InternalRow = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (b.length >= 24 &&
        u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(16), be32(20))
    if (b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8))
    if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var p = 2
      while (p + 3 < b.length) {
        if (u8(p) != 0xff) return null // lost sync: corrupt stream
        // skip FF fill bytes permitted between segments
        var q = p + 1
        while (u8(q) == 0xff && q + 1 < b.length) q += 1
        val m = u8(q)
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p = q + 1 // standalone: no length
        else if (m == 0xd9 || m == 0xda) return null // EOI/SOS before any SOF
        else {
          val segStart = q + 1
          if (segStart + 1 >= b.length) return null
          val len = be16(segStart)
          if (len < 2) return null
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            // frame header data: precision(1) height(2) width(2)
            if (segStart + 6 >= b.length) return null
            return row("jpeg", be16(segStart + 5), be16(segStart + 3))
          }
          p = segStart + len
        }
      }
      return null
    }
    null
  }

  override def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imageHeaderParser", this, classOf[ImageHeader].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageHeader =
    copy(child = newChild)
}

object ImageFunctions {
  /** struct(format, width, height) parsed from real PNG/JPEG/GIF header
    * bytes; null when the payload is none of them. */
  def image_header(c: Column): Column =
    ExprBridge.toColumn(ImageHeader(ExprBridge.toExpression(c)))
}
