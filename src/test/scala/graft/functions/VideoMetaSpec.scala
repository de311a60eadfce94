package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VideoMeta: ISO-BMFF box walk against hand-built golden bytes
  * (independent of the encoder), mvhd version-0/1 variants, largesize
  * and to-EOF box sizes, the encode→parse round trip, corrupt-input →
  * null, and codegen-path agreement.
  */
class VideoMetaSpec extends SparkSpec {

  private def parse(
      bytes: Array[Byte]): Option[(String, Int, Long, Int)] =
    Option(VideoMetaUtil.parse(bytes)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2),
        r.getInt(3)))

  /** Hand-built golden file: ftyp(isom) + moov{mvhd v0 timescale=600
    * duration=3000 (5 s), 2 empty trak shells} — written byte-by-byte
    * from the ISO/IEC 14496-12 box grammar, not via the encoder.
    */
  private def golden: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def be4(x: Long): Unit =
      b((x >> 24).toInt, (x >> 16).toInt, (x >> 8).toInt, x.toInt)
    def tag(t: String): Unit = t.foreach(c => out.write(c))
    be4(16); tag("ftyp"); tag("isom"); be4(512)
    be4(8 + 108 + 16); tag("moov")
    be4(108); tag("mvhd")
    b(0, 0, 0, 0) // version 0 + flags
    be4(0); be4(0) // creation / modification
    be4(600); be4(3000) // timescale, duration
    be4(0x00010000L); b(0x01, 0, 0, 0) // rate, volume, reserved
    be4(0); be4(0)
    Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(be4)
    (1 to 6).foreach(_ => be4(0))
    be4(3)
    be4(8); tag("trak"); be4(8); tag("trak")
    out.toByteArray
  }

  test("golden MP4 (isom, 600 ts, 5 s, 2 tracks) parses") {
    assert(parse(golden) === Some(("isom", 600, 5000L, 2)))
  }

  test("mvhd version 1 (64-bit duration) parses") {
    val bytes = VideoMetaUtil.encodeHeader("mp42", 90000,
      0x1_0000_0000L, 1) // duration > u32 forces version 1
    assert(parse(bytes) ===
      Some(("mp42", 90000, 0x1_0000_0000L * 1000 / 90000, 1)))
  }

  test("size==0 (box to EOF) and largesize==1 headers are honored") {
    // rewrite golden's moov header to size==0 (runs to EOF): parse
    // must still find mvhd and both traks
    val z = golden
    z(16) = 0; z(17) = 0; z(18) = 0; z(19) = 0
    assert(parse(z) === Some(("isom", 600, 5000L, 2)))
    // largesize form: moov header rewritten as size=1 + 64-bit size,
    // which shifts the payload by 8 — rebuild with the injected field
    val g = golden
    val out = new java.io.ByteArrayOutputStream()
    out.write(g, 0, 16) // ftyp untouched
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    b(0, 0, 0, 1); out.write('m'); out.write('o'); out.write('o')
    out.write('v')
    val inner = g.length - 16 // moov content size in the original
    b(0, 0, 0, 0, 0, 0, 0, (inner + 8) & 0xff) // largesize (fits low byte)
    out.write(g, 24, g.length - 24) // children unchanged
    assert(parse(out.toByteArray) === Some(("isom", 600, 5000L, 2)))
  }

  test("corrupt, truncated, and non-MP4 inputs return null") {
    assert(parse(Array.emptyByteArray) === None)
    assert(parse("RIFFxxxxWAVE not a video".getBytes) === None)
    assert(parse(golden.take(40)) === None) // moov truncated
    // no mvhd inside moov
    val noMvhd = VideoMetaUtil.encodeHeader("isom", 600, 100L, 1)
    noMvhd(28 + 4) = 'f'; noMvhd(28 + 5) = 'r' // mvhd -> frhd
    noMvhd(28 + 6) = 'h'; noMvhd(28 + 7) = 'd'
    assert(parse(noMvhd) === None)
    // zero timescale
    assert(parse(VideoMetaUtil.encodeHeader("isom", 0, 100L, 1)) ===
      None)
    // zero tracks
    assert(parse(VideoMetaUtil.encodeHeader("isom", 600, 100L, 0)) ===
      None)
  }

  test("adversarial child box size near 2^32 terminates and is null") {
    val g = VideoMetaUtil.encodeHeader("isom", 600, 100L, 1)
    // ftyp is 20 bytes, moov header at 20..27, first child (mvhd)
    // header at 28: size @28..31, type @32..35
    assert(new String(g, 32, 4) === "mvhd")
    g(28) = 0xff.toByte; g(29) = 0xff.toByte // mvhd size -> ~2^32
    g(30) = 0xff.toByte; g(31) = 0xf8.toByte
    assert(parse(g) === None)
  }

  test("encode→parse round trip across brands and parameters") {
    for {
      brand <- Seq("isom", "mp42", "avc1")
      (ts, dur) <- Seq((600, 0L), (1000, 1L), (90000, 123456789L))
      nTrak <- Seq(1, 2, 5)
    } assert(
      parse(VideoMetaUtil.encodeHeader(brand, ts, dur, nTrak)) ===
        Some((brand, ts, dur * 1000L / ts, nTrak)),
      s"$brand ts=$ts dur=$dur traks=$nTrak")
  }

  test("codegen path (DataFrame) agrees with direct eval") {
    import spark.implicits._
    val rows = Seq(
      ("a", VideoMetaUtil.encodeHeader("isom", 600, 3000L, 2)),
      ("b", VideoMetaUtil.encodeHeader("mp42", 90000, 900000L, 1)),
      ("c", "junk".getBytes))
    val got = rows.toDF("id", "content")
      .select(col("id"),
        call_function("video_meta", col("content")).as("m"))
      .select(col("id"), col("m.brand"), col("m.duration_ms"),
        col("m.n_tracks"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq === Seq(("a", "isom", 5000L), ("b", "mp42", 10000L),
      ("c", null, -1L)))
  }
}
