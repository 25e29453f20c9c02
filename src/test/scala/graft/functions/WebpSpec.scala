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

  test("animation: encode → readAnimFrames round-trips frames and timing") {
    def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb & 0xffffff)); g.fillRect(0, 0, w, h)
      g.dispose(); img
    }
    val frames = Seq((solid(8, 6, 0xAA1122), 40), (solid(8, 6, 0x22BB33), 70),
      (solid(5, 4, 0x3344CC), 120))
    val anim = Webp.encodeAnimation(frames, loopCount = 3)
    assert(Webp.isWebp(anim))
    val meta = Webp.readMeta(anim)
    assert(meta.animated && meta.width == 8 && meta.height == 6)
    assert(Webp.animInfo(anim).map(_._1).contains(3))
    val back = Webp.readAnimFrames(anim)
    assert(back.map(_.durationMs) == Seq(40, 70, 120))
    assert(back.map(f => (f.width, f.height)) == Seq((8, 6), (8, 6), (5, 4)))
    assert((back(0).image.getRGB(3, 3) & 0xffffff) == 0xAA1122)
    assert((back(1).image.getRGB(7, 5) & 0xffffff) == 0x22BB33)
    assert((back(2).image.getRGB(0, 0) & 0xffffff) == 0x3344CC)
    // still image degrades to a single zero-duration frame
    val still = Webp.encode(solid(4, 4, 0x555555))
    val one = Webp.readAnimFrames(still)
    assert(one.length == 1 && one.head.durationMs == 0)
    assert((one.head.image.getRGB(1, 1) & 0xffffff) == 0x555555)
  }

  test("animation: 50 random frame sets round-trip pixel-exact") {
    val r = new scala.util.Random(179)
    for (case_ <- 0 until 50) {
      val n = r.nextInt(5) + 1
      val frames = (0 until n).map { _ =>
        val w = r.nextInt(12) + 1; val h = r.nextInt(10) + 1
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_ARGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, r.nextInt())
        (img: java.awt.image.BufferedImage, r.nextInt(1000) + 1)
      }
      val back = Webp.readAnimFrames(Webp.encodeAnimation(frames))
      assert(back.length == n, s"case $case_")
      back.zip(frames).foreach { case (got, (img, dur)) =>
        assert(got.durationMs == dur, s"case $case_")
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          assert(got.image.getRGB(x, y) == img.getRGB(x, y),
            s"case $case_ pixel $x,$y")
      }
    }
  }
}
