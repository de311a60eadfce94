package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ImageMeta: header parsing against real-world golden bytes (a
  * canonical 1×1 PNG), hand-built multi-segment JPEGs, GIF/BMP
  * variants, the encode→parse round trip, and corrupt-input → null —
  * on both the interpreted and codegen paths.
  */
class ImageMetaSpec extends SparkSpec {

  private def parse(bytes: Array[Byte]): Option[(String, Int, Int)] =
    Option(ImageMetaUtil.parse(bytes)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

  test("golden 1x1 PNG (the canonical transparent pixel) parses") {
    // public canonical minimal PNG, e.g. the data-URI transparent pixel
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkY" +
        "PhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(parse(png) === Some(("png", 1, 1)))
  }

  test("JPEG walk skips APP0/COM/DQT segments and reads SOF2 " +
    "(progressive)") {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def be2(x: Int): Unit = b(x >> 8, x)
    b(0xff, 0xd8) // SOI
    b(0xff, 0xe0); be2(16); b('J', 'F', 'I', 'F', 0); b(1, 2, 0, 0, 1, 0, 1, 0, 0)
    b(0xff, 0xfe); be2(9); b('c', 'o', 'm', 'm', 'e', 'n', 't') // COM
    b(0xff, 0xdb); be2(5); b(0, 1, 2) // stub DQT payload
    b(0xff, 0xc2); be2(17); b(8); be2(300); be2(467); b(3) // SOF2 h=300 w=467
    b(1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    b(0xff, 0xd9)
    assert(parse(out.toByteArray) === Some(("jpeg", 467, 300)))
  }

  test("JPEG with C4/C8/CC (DHT/JPG/DAC) markers does NOT misread " +
    "them as SOF") {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def be2(x: Int): Unit = b(x >> 8, x)
    b(0xff, 0xd8)
    b(0xff, 0xc4); be2(5); b(9, 9, 9) // DHT — payload would fake dims
    b(0xff, 0xc0); be2(17); b(8); be2(20); be2(40); b(3)
    b(1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    b(0xff, 0xd9)
    assert(parse(out.toByteArray) === Some(("jpeg", 40, 20)))
  }

  test("JPEG with SOS before any SOF returns null (no dims found)") {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    b(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 1, 2, 3, 4, 5, 6)
    assert(parse(out.toByteArray) === None)
  }

  test("GIF87a and GIF89a little-endian dims") {
    def gif(ver: Char, w: Int, h: Int): Array[Byte] =
      Array[Byte]('G', 'I', 'F', '8', ver.toByte, 'a',
        (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0xff).toByte, 0x3b)
    assert(parse(gif('7', 640, 480)) === Some(("gif", 640, 480)))
    assert(parse(gif('9', 300, 70000 & 0xffff)) === Some(("gif", 300, 4464)))
  }

  test("BMP BITMAPINFOHEADER incl. negative (top-down) height") {
    def bmp(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le4(x: Int): Unit =
        Seq(x, x >> 8, x >> 16, x >> 24).foreach(v => out.write(v & 0xff))
      out.write('B'); out.write('M')
      le4(100); le4(0); le4(54) // size, reserved, pixel offset
      le4(40); le4(w); le4(h)   // header size, width, height
      le4(0)
      out.toByteArray
    }
    assert(parse(bmp(1920, 1080)) === Some(("bmp", 1920, 1080)))
    assert(parse(bmp(64, -64)) === Some(("bmp", 64, 64)))
  }

  test("corrupt, truncated, and zero-dim inputs return null") {
    assert(parse(Array.emptyByteArray) === None)
    assert(parse("not an image at all".getBytes) === None)
    assert(parse(ImageMetaUtil.encodeHeader("png", 10, 10).take(20)) === None)
    assert(parse(ImageMetaUtil.encodeHeader("png", 0, 10)) === None)
    // PNG signature but garbage chunk type
    val bad = ImageMetaUtil.encodeHeader("png", 5, 5)
    bad(12) = 'X'
    assert(parse(bad) === None)
  }

  test("encode→parse round trip for every format") {
    for {
      fmt <- Seq("png", "jpeg", "gif")
      (w, h) <- Seq((1, 1), (17, 4000), (65535, 2))
    } assert(parse(ImageMetaUtil.encodeHeader(fmt, w, h)) ===
        Some((fmt, w, h)), s"$fmt $w x $h")
    // PNG supports > 16-bit dims; JPEG/GIF dims are uint16 by spec
    assert(parse(ImageMetaUtil.encodeHeader("png", 100000, 3)) ===
      Some(("png", 100000, 3)))
  }

  test("codegen path (DataFrame) agrees with direct eval") {
    import spark.implicits._
    val rows = Seq(
      ("a", ImageMetaUtil.encodeHeader("png", 12, 34)),
      ("b", ImageMetaUtil.encodeHeader("jpeg", 56, 78)),
      ("c", ImageMetaUtil.encodeHeader("gif", 9, 10)),
      ("d", "junk".getBytes))
    val got = rows.toDF("id", "content")
      .select(col("id"),
        call_function("image_meta", col("content")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    assert(got.toSeq === Seq(("a", "png"), ("b", "jpeg"), ("c", "gif"),
      ("d", null)))
  }
}
