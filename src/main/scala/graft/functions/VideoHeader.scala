package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL video container parsing — the video sibling of [[ImageHeader]]
  * / [[AudioHeader]], completing the multimodal header trio. Stream
  * parameters come from actual container bytes; no codec involved.
  *
  *  - MP4 (ISO BMFF): a BOX WALK. Top-level boxes are
  *    [u32-be size][4cc type]; the walk skips ftyp/free/mdat/… to
  *    `moov`, then walks moov's children for `mvhd` (fullbox v0:
  *    timescale u32 at payload +12, duration u32 at +16; v1: 64-bit
  *    times — timescale at +20, duration u64 at +24) and descends
  *    `trak` for `tkhd` (v0: width/height as 16.16 fixed-point u32 at
  *    payload +76/+80; v1: at +88/+92). Box size 0 (= to EOF) and the
  *    64-bit-size escape (size==1) terminate the parse as corrupt —
  *    the fixture formats every box explicitly.
  *  - AVI (RIFF): the WAV chunk walk one level deeper — chunks are
  *    [4cc][u32-le size] (odd sizes pad a byte, the RIFF rule); the
  *    walk enters `LIST/hdrl` and reads `avih`: µs-per-frame at
  *    payload +0, total frames at +16, width/height at +32/+36.
  *
  * Output: struct(format, width, height, duration_ms); null for a
  * truncated, unrecognized, or video-less (e.g. audio-only MP4)
  * payload — corrupt rows stay visible, the PqEncode contract. The
  * parse is one per-row call on a referenced object, so projections
  * stay inside whole-stage codegen. */
case class VideoHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BINARY payload, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_header"

  private def row(fmt: String, w: Int, h: Int, durMs: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h, durMs))

  /** Null for anything that is not a well-formed MP4/AVI prefix.
    * Public so the generated code can call it. */
  def parse(b: Array[Byte]): InternalRow = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def le32(i: Int): Long =
      ((u8(i + 3).toLong << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)) & 0xffffffffL
    def cc(i: Int, s: String): Boolean =
      b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
        b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

    // ---- MP4: every file starts with a box whose type is printable;
    // require the conventional ftyp first box to claim the format
    if (b.length >= 12 && cc(4, "ftyp")) {
      var timescale = 0L; var duration = -1L
      var w = -1; var h = -1
      // walk [from, until) for child boxes
      def walk(from: Long, until: Long, depth: Int): Boolean = { // false = corrupt
        var p = from
        while (p + 8 <= until) {
          val size = be32(p.toInt)
          if (size < 8 || p + size > until) return false // 0/1/truncated: corrupt here
          val q = (p + 8).toInt
          if (cc(p.toInt + 4, "moov") && depth == 0) {
            if (!walk(p + 8, p + size, 1)) return false
          } else if (cc(p.toInt + 4, "trak") && depth == 1) {
            if (!walk(p + 8, p + size, 2)) return false
          } else if (cc(p.toInt + 4, "mvhd") && depth == 1) {
            val ver = u8(q)
            if (ver == 0 && p + size >= q + 20) {
              timescale = be32(q + 12); duration = be32(q + 16)
            } else if (ver == 1 && p + size >= q + 32) {
              timescale = be32(q + 20); duration = be64(q + 24)
            } else return false
          } else if (cc(p.toInt + 4, "tkhd") && depth == 2) {
            val ver = u8(q)
            val off = if (ver == 0) 76 else 88
            if (p + size < q + off + 8) return false
            // 16.16 fixed point; an audio track carries 0x0 and is skipped
            val tw = (be32(q + off) >> 16).toInt
            val th = (be32(q + off + 4) >> 16).toInt
            if (tw > 0 && th > 0) { w = tw; h = th }
          }
          p += size
        }
        true
      }
      if (!walk(0L, b.length.toLong, 0)) return null
      if (timescale <= 0L || duration < 0L || w < 0) return null
      return row("mp4", w, h, duration * 1000L / timescale)
    }

    // ---- AVI: RIFF container, subtype "AVI "
    if (b.length >= 12 && cc(0, "RIFF") && cc(8, "AVI ")) {
      var p = 12L
      while (p + 8 <= b.length) {
        val size = le32(p.toInt + 4)
        val q = (p + 8).toInt
        if (p + 8 + size > b.length) return null
        if (cc(p.toInt, "LIST") && size >= 4 && cc(q, "hdrl")) {
          // walk the hdrl list for avih
          var r = p + 12
          val end = p + 8 + size
          while (r + 8 <= end) {
            val csize = le32(r.toInt + 4)
            if (r + 8 + csize > end) return null
            if (cc(r.toInt, "avih")) {
              if (csize < 40) return null
              val d = (r + 8).toInt
              val uspf = le32(d); val frames = le32(d + 16)
              val w = le32(d + 32).toInt; val h = le32(d + 36).toInt
              if (w <= 0 || h <= 0) return null
              return row("avi", w, h, frames * uspf / 1000L)
            }
            r += 8 + csize + (csize & 1L) // odd chunks word-align
          }
          return null // hdrl without avih
        }
        p += 8 + size + (size & 1L)
      }
      return null
    }
    null
  }

  override def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("videoHeaderParser", this, classOf[VideoHeader].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): VideoHeader =
    copy(child = newChild)
}

object VideoFunctions {
  /** struct(format, width, height, duration_ms) parsed from real
    * MP4/AVI container bytes; null when the payload is neither. */
  def video_header(c: Column): Column =
    ExprBridge.toColumn(VideoHeader(ExprBridge.toExpression(c)))
}
