package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: container-level video metadata (brand,
  * movie timescale, duration, track count) parsed from an MP4 /
  * ISO-BMFF (MPEG-4 Part 12) BINARY column's box structure — the video
  * third of the multimodal decode family ([[ImageMeta]] q377,
  * [[AudioMeta]] q396). Reads only the `ftyp` box and the `moov` box's
  * first-level children (`mvhd` for timescale/duration, `trak` count)
  * — no sample data, no codec — so a duration/track audit over 100 TB
  * of video runs at scan speed, provided `moov` is front-of-file
  * (faststart layout, the normal case for streamable files).
  *
  * Box grammar (public ISO/IEC 14496-12 spec): `[size be32][type 4B]`
  * headers, size includes the header; size==1 → 64-bit largesize
  * follows; size==0 → box runs to EOF. `mvhd` version 0 packs
  * timescale be32 @+12 / duration be32 @+16 of its payload; version 1
  * widens creation/modification to 64-bit, shifting timescale to +20
  * and duration (be64) to +24.
  *
  * Anything unrecognized, truncated, or inconsistent → NULL —
  * filter-don't-fail, like the image and audio siblings.
  */
@ExpressionDescription(
  usage = "_FUNC_(bytes) - struct(brand, timescale, duration_ms, " +
    "n_tracks) parsed from MP4/ISO-BMFF box headers, NULL if " +
    "unrecognized.")
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"video_meta requires binary input, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VideoMetaUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VideoMetaUtil.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): VideoMeta = copy(child = newChild)

  override def prettyName: String = "video_meta"
}

object VideoMetaUtil {
  private def u(b: Byte): Int = b & 0xff
  private def be32(a: Array[Byte], i: Int): Long =
    ((u(a(i)).toLong << 24) | (u(a(i + 1)) << 16) |
      (u(a(i + 2)) << 8) | u(a(i + 3))) & 0xffffffffL
  private def be64(a: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | u(a(i + j)); j += 1 }
    v
  }
  private def typ(a: Array[Byte], i: Int): String =
    new String(a, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Box header at `off` → (payloadStart, boxEnd) or null when the
    * header is truncated/inconsistent. Long arithmetic throughout: a
    * crafted 2^32-scale size must overshoot `limit`, never wrap.
    */
  private def boxBounds(a: Array[Byte], off: Long,
      limit: Long): (Long, Long) = {
    if (off + 8 > limit) return null
    var size = be32(a, off.toInt)
    var payload = off + 8
    if (size == 1L) { // 64-bit largesize follows the type
      if (off + 16 > limit) return null
      size = be64(a, off.toInt + 8)
      payload = off + 16
    } else if (size == 0L) { // box runs to the end of the enclosure
      size = limit - off
    }
    if (size < payload - off || off + size > limit) return null
    (payload, off + size)
  }

  /** Null on anything unrecognized/truncated — never throws. */
  def parse(a: Array[Byte]): InternalRow = {
    if (a == null || a.length < 16) return null
    // an ISO-BMFF file must lead with a box whose type is `ftyp`
    if (typ(a, 4) != "ftyp") return null
    var brand: String = null
    var timescale = -1
    var durationUnits = -1L
    var nTracks = 0
    var sawMvhd = false
    var off = 0L
    val n = a.length.toLong
    while (off + 8 <= n) {
      val b = boxBounds(a, off, n)
      if (b == null) return null
      val (payload, end) = b
      typ(a, off.toInt + 4) match {
        case "ftyp" =>
          if (payload + 4 > end) return null
          brand = typ(a, payload.toInt)
        case "moov" =>
          // one-level child walk: count trak, unpack mvhd
          var c = payload
          while (c + 8 <= end) {
            val cb = boxBounds(a, c, end)
            if (cb == null) return null
            val (cp, ce) = cb
            typ(a, c.toInt + 4) match {
              case "trak" => nTracks += 1
              case "mvhd" =>
                val i = cp.toInt
                if (cp + 4 > ce) return null
                u(a(i)) match {
                  case 0 =>
                    if (cp + 20 > ce) return null
                    timescale = be32(a, i + 12).toInt
                    durationUnits = be32(a, i + 16)
                  case 1 =>
                    if (cp + 32 > ce) return null
                    timescale = be32(a, i + 20).toInt
                    durationUnits = be64(a, i + 24)
                  case _ => return null
                }
                sawMvhd = true
              case _ => ()
            }
            c = ce
          }
        case _ => ()
      }
      off = end
    }
    if (brand == null || !sawMvhd || timescale <= 0 ||
      durationUnits < 0 || nTracks <= 0) return null
    InternalRow(UTF8String.fromString(brand), timescale,
      durationUnits * 1000L / timescale, nTracks)
  }

  /** Minimal VALID ISO-BMFF bytes for [[parse]] — fixture construction
    * independent of the parser (q377/q396 pattern). Emits `ftyp`
    * (brand + one compatible brand), then `moov` containing a full
    * 108-byte version-0 `mvhd` (or version-1 when duration needs 64
    * bits) and `nTracks` empty `trak` shells.
    */
  def encodeHeader(brand: String, timescale: Int, durationUnits: Long,
      nTracks: Int): Array[Byte] = {
    require(brand.length == 4, "brand must be 4 ASCII chars")
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def be4(x: Long): Unit =
      b((x >> 24).toInt, (x >> 16).toInt, (x >> 8).toInt, x.toInt)
    def be8(x: Long): Unit = { be4(x >>> 32); be4(x & 0xffffffffL) }
    def tag(t: String): Unit = t.foreach(c => out.write(c))
    val v1 = durationUnits > 0xffffffffL
    // ftyp: size 20 = 8 header + brand + minor_version + 1 compatible
    be4(20); tag("ftyp"); tag(brand); be4(0); tag(brand)
    val mvhdSize = if (v1) 120 else 108
    be4(8L + mvhdSize + 8L * nTracks); tag("moov")
    be4(mvhdSize); tag("mvhd")
    if (v1) {
      b(1, 0, 0, 0) // version 1 + flags
      be8(0); be8(0) // creation/modification
      be4(timescale); be8(durationUnits)
    } else {
      b(0, 0, 0, 0)
      be4(0); be4(0)
      be4(timescale); be4(durationUnits)
    }
    be4(0x00010000L); b(0x01, 0, 0, 0) // rate 1.0, volume 1.0, reserved
    be4(0); be4(0) // reserved
    // unity matrix
    Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(be4)
    (1 to 6).foreach(_ => be4(0)) // pre_defined
    be4(nTracks + 1L) // next_track_ID
    (1 to nTracks).foreach { _ => be4(8); tag("trak") }
    out.toByteArray
  }
}
