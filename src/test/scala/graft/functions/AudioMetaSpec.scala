package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AudioMeta: WAV chunk-walk and FLAC STREAMINFO bit-unpacking against
  * hand-built golden bytes (independent of the encoder), chunk-order /
  * padding / format-tag variants, the encode→parse round trip, and
  * corrupt-input → null — on both the interpreted and codegen paths.
  */
class AudioMetaSpec extends SparkSpec {

  private def parse(
      bytes: Array[Byte]): Option[(String, Int, Int, Int, Long)] =
    Option(AudioMetaUtil.parse(bytes)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4)))

  /** Hand-built canonical WAV header (8000 Hz mono 16-bit PCM, 8000
    * samples = 1 s), written byte-by-byte from the RIFF spec — not via
    * the encoder under test.
    */
  private def goldenWav: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def le2(x: Int): Unit = b(x, x >> 8)
    def le4(x: Int): Unit = b(x, x >> 8, x >> 16, x >> 24)
    b('R', 'I', 'F', 'F'); le4(36 + 16000); b('W', 'A', 'V', 'E')
    b('f', 'm', 't', ' '); le4(16)
    le2(1); le2(1); le4(8000); le4(16000); le2(2); le2(16)
    b('d', 'a', 't', 'a'); le4(16000)
    out.toByteArray
  }

  test("golden WAV header (8 kHz mono 16-bit, 1 s) parses") {
    assert(parse(goldenWav) === Some(("wav", 8000, 1, 16, 8000L)))
  }

  test("golden FLAC STREAMINFO (44.1 kHz stereo 16-bit) parses from " +
    "hand-packed bytes") {
    // fLaC + last-block STREAMINFO(34); the 8 packed bytes hand-derived:
    // sr=44100=0x0AC44 (20 bits), ch-1=1 (3), bits-1=15 (5),
    // samples=441000=0x6BAA8 (36)
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    b('f', 'L', 'a', 'C'); b(0x80, 0, 0, 34)
    b(0x10, 0, 0x10, 0) // min/max blocksize
    b(0, 0, 0, 0, 0, 0) // min/max framesize
    b(0x0a, 0xc4, 0x42, 0xf0, 0x00, 0x06, 0xba, 0xa8)
    (0 until 16).foreach(_ => b(0))
    assert(parse(out.toByteArray) ===
      Some(("flac", 44100, 2, 16, 441000L)))
  }

  test("WAV chunk walk skips a LIST chunk before fmt, including the " +
    "odd-size pad byte") {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def le2(x: Int): Unit = b(x, x >> 8)
    def le4(x: Int): Unit = b(x, x >> 8, x >> 16, x >> 24)
    b('R', 'I', 'F', 'F'); le4(0); b('W', 'A', 'V', 'E')
    b('L', 'I', 'S', 'T'); le4(5); b('I', 'N', 'F', 'O', 7)
    b(0) // pad byte: odd chunk sizes are word-aligned
    b('f', 'm', 't', ' '); le4(16)
    le2(1); le2(2); le4(48000); le4(48000 * 8); le2(8); le2(32)
    b('d', 'a', 't', 'a'); le4(800)
    assert(parse(out.toByteArray) === Some(("wav", 48000, 2, 32, 100L)))
  }

  test("WAV IEEE-float (tag 3) parses; unknown tag (ALaw 6) is null") {
    val f = goldenWav; f(20) = 3
    assert(parse(f) === Some(("wav", 8000, 1, 16, 8000L)))
    val g = goldenWav; g(20) = 6
    assert(parse(g) === None)
  }

  test("corrupt, truncated, and degenerate inputs return null") {
    assert(parse(Array.emptyByteArray) === None)
    assert(parse("definitely not audio bytes".getBytes) === None)
    assert(parse(goldenWav.take(30)) === None) // fmt chunk truncated
    // FLAC whose first block is not STREAMINFO
    val bad = AudioMetaUtil.encodeHeader("flac", 8000, 1, 16, 10L)
    bad(4) = 0x84.toByte // type 4 = VORBIS_COMMENT
    assert(parse(bad) === None)
    // WAV with no data chunk
    val nd = goldenWav.take(36)
    assert(parse(nd) === None)
    // zero sample rate
    assert(parse(AudioMetaUtil.encodeHeader("wav", 0, 1, 16, 10L)) ===
      None)
  }

  test("adversarial WAV chunk size near 2^32 terminates (no Int-wrap " +
    "stuck loop) and returns null") {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    b('R', 'I', 'F', 'F'); b(0, 0, 0, 0); b('W', 'A', 'V', 'E')
    // unknown chunk declaring size 0xFFFFFFF8: Int-truncated that is
    // -8, which would freeze the cursor; the Long walk overshoots and
    // the parse ends with no fmt/data found
    b('J', 'U', 'N', 'K'); b(0xf8, 0xff, 0xff, 0xff)
    b(1, 2, 3, 4, 5, 6, 7, 8)
    assert(parse(out.toByteArray) === None)
  }

  test("encode→parse round trip across formats and parameters") {
    for {
      fmt <- Seq("wav", "flac")
      (sr, ch, bits) <- Seq((8000, 1, 16), (44100, 2, 16),
        (48000, 2, 24), (16000, 1, 8))
      n <- Seq(0L, 1L, 123456789L)
    } assert(parse(AudioMetaUtil.encodeHeader(fmt, sr, ch, bits, n)) ===
        Some((fmt, sr, ch, bits, n)), s"$fmt $sr/$ch/$bits n=$n")
    // FLAC 36-bit sample counts survive (WAV is u32-byte-bounded)
    assert(parse(AudioMetaUtil.encodeHeader("flac", 96000, 8, 24,
      0xfffffffffL)) === Some(("flac", 96000, 8, 24, 0xfffffffffL)))
  }

  test("codegen path (DataFrame) agrees with direct eval") {
    import spark.implicits._
    val rows = Seq(
      ("a", AudioMetaUtil.encodeHeader("wav", 22050, 1, 16, 500L)),
      ("b", AudioMetaUtil.encodeHeader("flac", 44100, 2, 16, 999L)),
      ("c", "junk".getBytes))
    val got = rows.toDF("id", "content")
      .select(col("id"),
        call_function("audio_meta", col("content")).as("m"))
      .select(col("id"), col("m.format"), col("m.sample_rate"),
        col("m.num_samples"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    assert(got.toSeq === Seq(("a", "wav"), ("b", "flac"), ("c", null)))
  }
}
