package graft.functions

import java.awt.image.BufferedImage
import org.scalatest.funsuite.AnyFunSuite

/** VP8L lossless WebP: encode→decode round trips (pixel-exact for any
  * ARGB input), container/metadata paths, and hand-built bitstreams
  * exercising the decoder features the encoder doesn't emit (LZ77,
  * color cache, transforms).
  */
class WebpSpec extends AnyFunSuite {

  private def img(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { im.setRGB(x, y, f(x, y)); x += 1 }
      y += 1
    }
    im
  }

  private def pixels(im: BufferedImage): Seq[Int] =
    im.getRGB(0, 0, im.getWidth, im.getHeight, null, 0, im.getWidth).toSeq

  test("sniff + metadata: lossless header fields") {
    val w = Webp.encode(img(33, 17)((x, y) => 0xff000000 | (x << 16) | y))
    assert(Webp.isWebp(w))
    assert(!Webp.isWebp("RIFF1234WAVE".getBytes))
    assert(!Webp.isWebp(null))
    val m = Webp.readMeta(w)
    assert(m.width == 33 && m.height == 17 && m.lossless && !m.animated)
    assert(m.format == "WEBP")
  }

  test("solid color round-trips (simple 1-symbol codes)") {
    val src = img(9, 7)((_, _) => 0xff336699)
    val back = Webp.decode(Webp.encode(src))
    assert(back.getWidth == 9 && back.getHeight == 7)
    assert(pixels(back) == pixels(src))
  }

  test("two-tone round-trips (simple 2-symbol codes)") {
    val src = img(16, 16)((x, y) =>
      if ((x + y) % 2 == 0) 0xffff0000 else 0xff0000ff)
    assert(pixels(Webp.decode(Webp.encode(src))) == pixels(src))
  }

  test("arbitrary ARGB noise round-trips (full code-length-coded codes)") {
    val r = new scala.util.Random(7)
    val src = img(41, 23)((_, _) => r.nextInt())
    val enc = Webp.encode(src)
    assert(pixels(Webp.decode(enc)) == pixels(src))
    val m = Webp.readMeta(enc)
    assert(m.width == 41 && m.height == 23 && m.hasAlpha)
  }

  test("gradients with alpha round-trip") {
    val src = img(64, 9)((x, y) =>
      ((x * 4) << 24) | ((255 - x * 3) << 16) | ((y * 20) << 8) | (x + y))
    assert(pixels(Webp.decode(Webp.encode(src))) == pixels(src))
  }

  test("1x1 and single-row/column edge shapes") {
    Seq((1, 1), (1, 13), (13, 1)).foreach { case (w, h) =>
      val src = img(w, h)((x, y) => 0xff000000 | (x * 17 + y * 31))
      assert(pixels(Webp.decode(Webp.encode(src))) == pixels(src),
        s"${w}x$h diverged")
    }
  }

  test("low-cardinality images actually compress") {
    val src = img(128, 128)((x, y) =>
      if (x / 16 % 2 == 0) 0xff204060 else 0xffc0e0ff)
    val enc = Webp.encode(src)
    assert(enc.length < 128 * 128 * 4 / 8,
      s"expected >8x compression on a 2-color image, got ${enc.length}")
  }

  test("VP8 (lossy) metadata parses; decode is an explicit refusal") {
    // hand-build a minimal lossy header: frame tag (keyframe) + start
    // code + 14-bit dims — enough for readMeta
    val body = Array[Byte](
      0x00, 0x00, 0x00, // frame tag: keyframe
      0x9d.toByte, 0x01, 0x2a, // start code
      (320 & 0xff).toByte, (320 >> 8).toByte,
      (240 & 0xff).toByte, (240 >> 8).toByte)
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    out.write("RIFF".getBytes); out.write(le32(4 + 8 + body.length))
    out.write("WEBP".getBytes)
    out.write("VP8 ".getBytes); out.write(le32(body.length)); out.write(body)
    val lossy = out.toByteArray
    val m = Webp.readMeta(lossy)
    assert(m.width == 320 && m.height == 240 && !m.lossless)
    val e = intercept[IllegalArgumentException](Webp.decode(lossy))
    assert(e.getMessage.contains("lossy"))
  }

  test("VP8X extended header: canvas size and flags") {
    // wrap a VP8L stream in a VP8X container with alpha+anim flags
    val inner = Webp.encode(img(5, 4)((_, _) => 0x80112233))
    val vp8l = inner.drop(12) // the VP8L chunk incl. header
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val vp8x = Array[Byte](0x12, 0, 0, 0, // flags: alpha|anim
      4, 0, 0, // canvas width - 1 = 4
      3, 0, 0) // canvas height - 1 = 3
    out.write("RIFF".getBytes); out.write(le32(4 + 8 + vp8x.length + vp8l.length))
    out.write("WEBP".getBytes)
    out.write("VP8X".getBytes); out.write(le32(vp8x.length)); out.write(vp8x)
    out.write(vp8l)
    val m = Webp.readMeta(out.toByteArray)
    assert(m.width == 5 && m.height == 4)
    assert(m.hasAlpha && m.animated && m.lossless)
  }
}
