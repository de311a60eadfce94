package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: audio metadata (format, sample_rate,
  * channels, bits_per_sample, num_samples) parsed from a BINARY
  * column's header bytes — the audio sibling of [[ImageMeta]], and the
  * second decode step a multimodal pipeline runs after `binaryFile`
  * ingestion (q261 lands the bytes, q377 reads image shapes, this
  * reads audio shapes). Like ImageMeta it touches only each blob's
  * first bytes — no sample decode, no codec library — so duration
  * audit over 100 TB of audio runs at scan speed.
  *
  * Formats recognized by magic bytes (public file-format specs):
  *  - WAV  (RIFF/WAVE, little-endian): walks the chunk list from
  *    offset 12 to find `fmt ` (PCM format tag, channels le16 @+2,
  *    sample rate le32 @+4, block align le16 @+12, bits le16 @+14)
  *    and `data` (payload size le32 → num_samples = size/blockAlign);
  *  - FLAC (`fLaC` + mandatory first STREAMINFO block, big-endian
  *    bit-packed): the 8 bytes at offset 18 pack sample rate (20
  *    bits), channels−1 (3), bits−1 (5), total samples (36).
  * Anything else (or a truncated/corrupt header) → NULL — the
  * filter-don't-fail semantics a curation pipeline needs.
  */
@ExpressionDescription(
  usage = "_FUNC_(bytes) - struct(format, sample_rate, channels, " +
    "bits_per_sample, num_samples) parsed from WAV/FLAC header bytes, " +
    "NULL if unrecognized.")
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_meta requires binary input, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("num_samples", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioMetaUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioMetaUtil.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): AudioMeta = copy(child = newChild)

  override def prettyName: String = "audio_meta"
}

object AudioMetaUtil {
  private def u(b: Byte): Int = b & 0xff
  private def le16(a: Array[Byte], i: Int): Int =
    u(a(i)) | (u(a(i + 1)) << 8)
  private def le32(a: Array[Byte], i: Int): Long =
    (u(a(i)) | (u(a(i + 1)) << 8) | (u(a(i + 2)) << 16) |
      (u(a(i + 3)).toLong << 24)) & 0xffffffffL
  private def be64(a: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | u(a(i + j)); j += 1 }
    v
  }

  private def row(fmt: String, sr: Int, ch: Int, bits: Int,
      n: Long): InternalRow =
    if (sr <= 0 || ch <= 0 || bits <= 0 || n < 0) null
    else InternalRow(UTF8String.fromString(fmt), sr, ch, bits, n)

  /** Null on anything unrecognized/truncated — never throws. */
  def parse(a: Array[Byte]): InternalRow = {
    if (a == null || a.length < 12) return null
    // WAV: RIFF....WAVE, then a chunk walk for `fmt ` and `data`
    if (a(0) == 'R' && a(1) == 'I' && a(2) == 'F' && a(3) == 'F' &&
        a(8) == 'W' && a(9) == 'A' && a(10) == 'V' && a(11) == 'E') {
      // Long cursor: a crafted chunk size near 2^32 must overshoot the
      // buffer (ending the walk), not wrap an Int into a stuck loop.
      var iL = 12L
      var sr = -1; var ch = -1; var bits = -1; var blockAlign = -1
      var dataSize = -1L
      while (iL + 8 <= a.length && (sr < 0 || dataSize < 0)) {
        val i = iL.toInt
        val size = le32(a, i + 4)
        if (a(i) == 'f' && a(i + 1) == 'm' && a(i + 2) == 't' &&
            a(i + 3) == ' ') {
          if (size < 16 || i + 8 + 16 > a.length) return null
          // format tag le16 @+0: PCM(1), IEEE float(3), extensible
          val tag = le16(a, i + 8)
          if (tag != 1 && tag != 3 && tag != 0xfffe) return null
          ch = le16(a, i + 10)
          sr = le32(a, i + 12).toInt
          blockAlign = le16(a, i + 20)
          bits = le16(a, i + 22)
        } else if (a(i) == 'd' && a(i + 1) == 'a' && a(i + 2) == 't' &&
            a(i + 3) == 'a') {
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        iL += 8 + size + (size & 1L)
      }
      if (sr <= 0 || blockAlign <= 0 || dataSize < 0) return null
      return row("wav", sr, ch, bits, dataSize / blockAlign)
    }
    // FLAC: fLaC + first metadata block must be STREAMINFO (type 0)
    if (a(0) == 'f' && a(1) == 'L' && a(2) == 'a' && a(3) == 'C') {
      if (a.length < 26 || (u(a(4)) & 0x7f) != 0) return null
      val len = (u(a(5)) << 16) | (u(a(6)) << 8) | u(a(7))
      if (len < 34) return null
      // 8 bytes at offset 18: sr(20) | ch-1(3) | bps-1(5) | samples(36)
      val packed = be64(a, 18)
      val sr = (packed >>> 44).toInt
      val ch = ((packed >>> 41) & 0x7).toInt + 1
      val bits = ((packed >>> 36) & 0x1f).toInt + 1
      val n = packed & 0xfffffffffL
      return row("flac", sr, ch, bits, n)
    }
    null
  }

  /** Minimal VALID header bytes for the formats [[parse]] reads —
    * fixture construction (q377's pattern: encode and decode are
    * independent code paths, both written to the public spec). Sizes
    * are fixed per format: wav 44 bytes (header only — the data chunk
    * declares its payload size but the fixture omits the samples, as
    * only the header is under test), flac 42 bytes.
    */
  def encodeHeader(fmt: String, sr: Int, ch: Int, bits: Int,
      numSamples: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def le2(x: Int): Unit = b(x, x >> 8)
    def le4(x: Long): Unit =
      b(x.toInt, (x >> 8).toInt, (x >> 16).toInt, (x >> 24).toInt)
    fmt match {
      case "wav" =>
        val blockAlign = ch * bits / 8
        val dataSize = numSamples * blockAlign
        b('R', 'I', 'F', 'F'); le4(36 + dataSize); b('W', 'A', 'V', 'E')
        b('f', 'm', 't', ' '); le4(16)
        le2(1); le2(ch); le4(sr) // PCM, channels, sample rate
        le4(sr.toLong * blockAlign); le2(blockAlign); le2(bits)
        b('d', 'a', 't', 'a'); le4(dataSize)
      case "flac" =>
        b('f', 'L', 'a', 'C')
        b(0x80, 0, 0, 34) // last-block flag | STREAMINFO, length 34
        b(0x10, 0x00, 0x10, 0x00) // min/max blocksize 4096
        b(0, 0, 0, 0, 0, 0) // min/max framesize unknown
        val packed = (sr.toLong << 44) | ((ch - 1).toLong << 41) |
          ((bits - 1).toLong << 36) | (numSamples & 0xfffffffffL)
        var j = 56
        while (j >= 0) { b((packed >>> j).toInt); j -= 8 }
        b(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // MD5 unset
      case other => sys.error(s"encodeHeader: unknown format $other")
    }
    out.toByteArray
  }
}
