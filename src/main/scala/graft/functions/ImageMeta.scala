package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: image metadata (format, width, height)
  * parsed from a BINARY column's header bytes — the first decode step a
  * multimodal pipeline runs after `binaryFile` ingestion (q261 lands
  * the bytes; this reads their shape WITHOUT decoding pixels, so it
  * runs at full scan speed over 100 TB of image payloads: only the
  * first KB of each blob is touched, no codec library, no Python
  * worker).
  *
  * Formats recognized by magic bytes (all public file-format specs):
  *  - PNG  (RFC 2083): 8-byte signature, IHDR width/height big-endian
  *    uint32 at offsets 16/20;
  *  - JPEG (ITU T.81/JFIF): marker-segment walk from SOI past APPn/COM
  *    /DQT/DHT to the first SOFn frame header (C0–CF minus C4/C8/CC),
  *    height/width big-endian uint16 at +5/+7 in the segment;
  *  - GIF  (87a/89a): logical-screen width/height little-endian uint16
  *    at offsets 6/8;
  *  - BMP  (BITMAPINFOHEADER): width/height little-endian int32 at
  *    offsets 18/22 (height may be negative = top-down; reported
  *    absolute).
  * Anything else (or a truncated/corrupt header) → NULL, the
  * filter-don't-fail semantics a curation pipeline needs.
  */
@ExpressionDescription(
  usage = "_FUNC_(bytes) - struct(format, width, height) parsed from " +
    "PNG/JPEG/GIF/BMP header bytes, NULL if unrecognized.")
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"image_meta requires binary input, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageMetaUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageMetaUtil.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): ImageMeta = copy(child = newChild)

  override def prettyName: String = "image_meta"
}

object ImageMetaUtil {
  private def u(b: Byte): Int = b & 0xff
  private def be32(a: Array[Byte], i: Int): Int =
    (u(a(i)) << 24) | (u(a(i + 1)) << 16) | (u(a(i + 2)) << 8) | u(a(i + 3))
  private def be16(a: Array[Byte], i: Int): Int =
    (u(a(i)) << 8) | u(a(i + 1))
  private def le32(a: Array[Byte], i: Int): Int =
    u(a(i)) | (u(a(i + 1)) << 8) | (u(a(i + 2)) << 16) | (u(a(i + 3)) << 24)
  private def le16(a: Array[Byte], i: Int): Int =
    u(a(i)) | (u(a(i + 1)) << 8)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    if (w <= 0 || h <= 0) null
    else InternalRow(UTF8String.fromString(fmt), w, h)

  /** Null on anything unrecognized/truncated — never throws. */
  def parse(a: Array[Byte]): InternalRow = {
    if (a == null || a.length < 11) return null
    // PNG: \x89PNG\r\n\x1a\n + IHDR must be the first chunk
    if (a.length >= 24 &&
        u(a(0)) == 0x89 && a(1) == 'P' && a(2) == 'N' && a(3) == 'G' &&
        u(a(4)) == 0x0d && u(a(5)) == 0x0a && u(a(6)) == 0x1a &&
        u(a(7)) == 0x0a &&
        a(12) == 'I' && a(13) == 'H' && a(14) == 'D' && a(15) == 'R')
      return row("png", be32(a, 16), be32(a, 20))
    // JPEG: SOI then marker-segment walk to the first SOFn
    if (u(a(0)) == 0xff && u(a(1)) == 0xd8) {
      var i = 2
      while (i + 3 < a.length) {
        if (u(a(i)) != 0xff) return null // desynced
        var j = i
        while (j < a.length && u(a(j)) == 0xff) j += 1 // fill bytes
        if (j >= a.length) return null
        val m = u(a(j))
        if (m == 0xd9 || m == 0xda) return null // EOI/SOS before SOF
        if (m >= 0xd0 && m <= 0xd7) { i = j + 1 } // standalone RSTn
        else {
          if (j + 2 >= a.length) return null
          val len = be16(a, j + 1)
          if (len < 2) return null
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (j + 8 >= a.length) return null
            return row("jpeg", be16(a, j + 6), be16(a, j + 4))
          }
          i = j + 1 + len
        }
      }
      return null
    }
    // GIF87a / GIF89a
    if (a(0) == 'G' && a(1) == 'I' && a(2) == 'F' && a(3) == '8' &&
        (a(4) == '7' || a(4) == '9') && a(5) == 'a')
      return row("gif", le16(a, 6), le16(a, 8))
    // BMP with BITMAPINFOHEADER (the ubiquitous variant)
    if (a.length >= 26 && a(0) == 'B' && a(1) == 'M' && le32(a, 14) >= 40)
      return row("bmp", le32(a, 18), math.abs(le32(a, 22)))
    null
  }

  /** Minimal VALID header bytes for the formats [[parse]] reads —
    * fixture construction for q377 (encode and decode are independent
    * code paths: encode writes spec-mandated structures, decode walks
    * them; a shared bug would have to be a correct reading of the
    * public spec on both sides). Sizes are fixed per format: png 45,
    * jpeg 41, gif 11 bytes.
    */
  def encodeHeader(fmt: String, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def be2(x: Int): Unit = b(x >> 8, x)
    def be4(x: Int): Unit = b(x >> 24, x >> 16, x >> 8, x)
    def le2(x: Int): Unit = b(x, x >> 8)
    fmt match {
      case "png" =>
        b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        be4(13); b('I', 'H', 'D', 'R'); be4(w); be4(h)
        b(8, 2, 0, 0, 0) // depth, color, compression, filter, interlace
        be4(0) // CRC not validated by header readers
        be4(0); b('I', 'E', 'N', 'D'); be4(0)
      case "jpeg" =>
        b(0xff, 0xd8) // SOI
        b(0xff, 0xe0); be2(16) // APP0/JFIF — the walk must skip this
        b('J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 1, 0, 1, 0, 0)
        b(0xff, 0xc0); be2(17) // SOF0 baseline
        b(8); be2(h); be2(w); b(3)
        b(1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) // 3 components
        b(0xff, 0xd9) // EOI
      case "gif" =>
        b('G', 'I', 'F', '8', '9', 'a'); le2(w); le2(h); b(0x3b)
      case other => sys.error(s"encodeHeader: unknown format $other")
    }
    out.toByteArray
  }
}
