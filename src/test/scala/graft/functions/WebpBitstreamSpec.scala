package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Hand-built VP8L bitstreams exercising the decoder features the
  * fixture encoder does not emit: LZ77 backrefs (plain + 2D distance
  * map), the color cache, and all four transforms.
  */
class WebpBitstreamSpec extends AnyFunSuite {

  private def wrap(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    out.write("RIFF".getBytes); out.write(le32(4 + 8 + body.length))
    out.write("WEBP".getBytes)
    out.write("VP8L".getBytes); out.write(le32(body.length)); out.write(body)
    if (body.length % 2 == 1) out.write(0)
    out.toByteArray
  }

  private def header(b: Webp.BitWriter, w: Int, h: Int): Unit = {
    b.write(0x2f, 8); b.write(w - 1, 14); b.write(h - 1, 14)
    b.write(0, 1); b.write(0, 3)
  }

  /** write a full (non-simple) code for `alphabetSize` with the given
    * symbol→len map, mirroring the encoder's literal-lengths layout
    */
  private def fullCode(b: Webp.BitWriter, alphabetSize: Int,
      lens: Map[Int, Int]): Webp.PrefixCode = {
    val la = new Array[Int](alphabetSize)
    lens.foreach { case (s, l) => la(s) = l }
    val clHist = new Array[Long](19)
    la.foreach(l => clHist(l) += 1)
    val clLens = Webp.huffmanLengths(clHist, maxLen = 7)
    b.write(0, 1)
    b.write(19 - 4, 4)
    Webp.CodeLengthCodeOrder.foreach(s => b.write(clLens(s), 3))
    b.write(0, 1)
    val clCode = new Webp.PrefixCode(clLens)
    la.foreach(l => Webp.writeSym(b, clCode, l))
    new Webp.PrefixCode(la)
  }

  private def simple1(b: Webp.BitWriter, sym: Int,
      alphabetSize: Int): Webp.PrefixCode = {
    b.write(1, 1); b.write(0, 1)
    if (sym < 2) { b.write(0, 1); b.write(sym, 1) }
    else { b.write(1, 1); b.write(sym, 8) }
    val la = new Array[Int](alphabetSize); la(sym) = 1
    new Webp.PrefixCode(la)
  }

  private def pix(im: java.awt.image.BufferedImage): Seq[Int] =
    im.getRGB(0, 0, im.getWidth, im.getHeight, null, 0, im.getWidth).toSeq

  test("LZ77 plain distance: repeat-last-pixel run fills the row") {
    // 4x1: literal green=7,r=0,b=0,a=255 then backref len 3, dist 1
    val b = new Webp.BitWriter
    header(b, 4, 1)
    b.write(0, 1) // no transforms
    b.write(0, 1) // no cache
    b.write(0, 1) // no meta
    // G alphabet 280: symbols {7 lit, 258 len-code-2(=3)}
    val g = fullCode(b, 280, Map(7 -> 1, 258 -> 1))
    val r = simple1(b, 0, 256)
    val bl = simple1(b, 0, 256)
    val a = simple1(b, 255, 256)
    // distance: code 13 + 5 extra bits (24) → distVal 121 → plain dist 1
    val d = simple1(b, 13, 40)
    Webp.writeSym(b, g, 7) // literal pixel (G=7)
    Webp.writeSym(b, g, 258) // length code 2 → len 3
    Webp.writeSym(b, d, 13)
    b.write(24, 5) // extra bits for distVal = 96 + 24 + 1 = 121
    val img = Webp.decode(wrap(b.toBytes))
    assert(pix(img) == Seq.fill(4)(0xff000700))
  }

  test("LZ77 2D distance map: distVal 1 = pixel directly above") {
    // 2x2: two literals (G=1, G=2), then backref len 2 distVal 1 →
    // (dx,dy)=(0,1) → dist = xsize = 2 → copies row 0 into row 1
    val b = new Webp.BitWriter
    header(b, 2, 2)
    b.write(0, 1); b.write(0, 1); b.write(0, 1)
    val g = fullCode(b, 280, Map(1 -> 2, 2 -> 2, 257 -> 1)) // len-code 1 (=2)
    val r = simple1(b, 0, 256)
    val bl = simple1(b, 0, 256)
    val a = simple1(b, 255, 256)
    val d = simple1(b, 0, 40) // dist code 0 → distVal 1
    Webp.writeSym(b, g, 1)
    Webp.writeSym(b, g, 2)
    Webp.writeSym(b, g, 257) // length 2
    Webp.writeSym(b, d, 0)
    val img = Webp.decode(wrap(b.toBytes))
    assert(pix(img) == Seq(0xff000100, 0xff000200, 0xff000100, 0xff000200))
  }

  test("color cache: cached pixel replays without re-coding channels") {
    val cacheBits = 4
    val p = 0xff00a000 // a=ff, r=0, g=a0, b=0
    val idx = ((0x1e35a7bd * p) >>> (32 - cacheBits)) & ((1 << cacheBits) - 1)
    val b = new Webp.BitWriter
    header(b, 3, 1)
    b.write(0, 1) // no transforms
    b.write(1, 1); b.write(cacheBits, 4) // cache on
    b.write(0, 1) // no meta
    val cacheSym = 256 + 24 + idx
    val g = fullCode(b, 280 + 16, Map(0xa0 -> 1, cacheSym -> 1))
    val r = simple1(b, 0, 256)
    val bl = simple1(b, 0, 256)
    val a = simple1(b, 255, 256)
    val d = simple1(b, 0, 40)
    Webp.writeSym(b, g, 0xa0) // literal → inserts into cache
    Webp.writeSym(b, g, cacheSym) // cache hit
    Webp.writeSym(b, g, cacheSym) // again
    val img = Webp.decode(wrap(b.toBytes))
    assert(pix(img) == Seq(p, p, p))
  }

  test("subtract-green transform: decode adds green back to r/b") {
    val b = new Webp.BitWriter
    header(b, 1, 1)
    b.write(1, 1); b.write(2, 2) // transform: subtract-green
    b.write(0, 1) // no more transforms
    b.write(0, 1); b.write(0, 1) // no cache, no meta
    // residual (a=ff, r=10, g=20, b=30) → actual r=30, b=50
    val g = simple1(b, 0x20, 280)
    val r = simple1(b, 0x10, 256)
    val bl = simple1(b, 0x30, 256)
    val a = simple1(b, 0xff, 256)
    val d = simple1(b, 0, 40)
    val img = Webp.decode(wrap(b.toBytes))
    assert(pix(img) == Seq(0xff302050))
  }

  test("predictor transform end-to-end: mode L propagates the first pixel") {
    val b = new Webp.BitWriter
    header(b, 3, 1)
    b.write(1, 1) // a transform follows
    b.write(0, 2) // kind: predictor
    b.write(2, 3) // size_bits = 2 + 2 = 4 → single tile for 3x1
    // sub-image (1x1, isMain=false): cache bit, then 5 codes, then pixel
    b.write(0, 1) // sub-image: no cache
    simple1(b, 1, 280) // mode 1 = L, stored in green
    simple1(b, 0, 256); simple1(b, 0, 256); simple1(b, 0, 256)
    simple1(b, 0, 40)
    // single-symbol codes: zero payload bits — sub-image done
    b.write(0, 1) // no more transforms
    // main image: no cache, no meta
    b.write(0, 1); b.write(0, 1)
    // residuals: pixel0 = p - black = (0, r, g, b); others all zero
    val g = fullCode(b, 280, Map(0x15 -> 1, 0 -> 1))
    val r = fullCode(b, 256, Map(0x25 -> 1, 0 -> 1))
    val bl = fullCode(b, 256, Map(0x35 -> 1, 0 -> 1))
    val a = simple1(b, 0, 256) // alpha residual 0 (pred supplies ff)
    simple1(b, 0, 40)
    Webp.writeSym(b, g, 0x15); Webp.writeSym(b, r, 0x25); Webp.writeSym(b, bl, 0x35)
    Webp.writeSym(b, g, 0); Webp.writeSym(b, r, 0); Webp.writeSym(b, bl, 0)
    Webp.writeSym(b, g, 0); Webp.writeSym(b, r, 0); Webp.writeSym(b, bl, 0)
    val img = Webp.decode(wrap(b.toBytes))
    // (0,0): pred black + residual; (1,0)/(2,0): mode L, residual 0
    assert(pix(img) == Seq.fill(3)(0xff251535))
  }

  test("color-indexing transform with pixel packing (2-color palette)") {
    val b = new Webp.BitWriter
    header(b, 8, 1)
    b.write(1, 1) // a transform follows
    b.write(3, 2) // kind: color indexing
    b.write(2 - 1, 8) // palette size - 1
    // palette sub-image (2x1, isMain=false): delta-coded entries
    b.write(0, 1) // no cache
    // entry0 = red (ffff0000); entry1 delta = blue - red
    val e0 = 0xffff0000
    val e1 = 0xff0000ff
    def chan(v: Int, sh: Int) = (v >> sh) & 0xff
    val d1 = (((chan(e1, 24) - chan(e0, 24)) & 0xff) << 24) |
      (((chan(e1, 16) - chan(e0, 16)) & 0xff) << 16) |
      (((chan(e1, 8) - chan(e0, 8)) & 0xff) << 8) |
      ((chan(e1, 0) - chan(e0, 0)) & 0xff)
    // duplicate-channel maps collapse to a single-symbol code (zero
    // payload bits on both sides) — fullCode handles either shape
    val pg = fullCode(b, 280, Map(chan(e0, 8) -> 1, chan(d1, 8) -> 1))
    val pr = fullCode(b, 256, Map(chan(e0, 16) -> 1, chan(d1, 16) -> 1))
    val pb = fullCode(b, 256, Map(chan(e0, 0) -> 1, chan(d1, 0) -> 1))
    val pa = fullCode(b, 256, Map(chan(e0, 24) -> 1, chan(d1, 24) -> 1))
    simple1(b, 0, 40)
    def writePalettePixel(p: Int): Unit = {
      Webp.writeSym(b, pg, chan(p, 8)); Webp.writeSym(b, pr, chan(p, 16))
      Webp.writeSym(b, pb, chan(p, 0)); Webp.writeSym(b, pa, chan(p, 24))
    }
    writePalettePixel(e0); writePalettePixel(d1)
    b.write(0, 1) // no more transforms
    // main image: packed — 2 colors → width_bits 3 → xsize = 1 packed px
    // indices 0,1,0,1,1,0,1,0 → bits LSB-first in green: 01011010 = 0x5a
    b.write(0, 1); b.write(0, 1) // no cache, no meta
    val mg = simple1(b, 0x5a, 280)
    simple1(b, 0, 256); simple1(b, 0, 256); simple1(b, 255, 256)
    simple1(b, 0, 40)
    // all codes single-symbol → zero payload bits for the one pixel
    val img = Webp.decode(wrap(b.toBytes))
    assert(pix(img) == Seq(e0, e1, e0, e1, e1, e0, e1, e0))
  }
}
