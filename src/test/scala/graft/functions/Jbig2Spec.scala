package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 (ITU-T T.88): MQ coder encode/decode round trips across
  * context banks, generic-region exactness for all four templates with
  * and without TPGDON, non-nominal AT pixels, the embedded segment
  * layer, the PDF JBIG2Decode filter presentation, and corruption
  * behavior (fail soft, never OOM).
  */
class Jbig2Spec extends AnyFunSuite {

  private def mkBitmap(w: Int, h: Int)(f: (Int, Int) => Boolean):
      Jbig2.Bitmap = {
    val bm = Jbig2.Bitmap.empty(w, h)
    for (y <- 0 until h; x <- 0 until w) if (f(x, y)) bm.set(x, y)
    bm
  }

  test("MQ coder: random decision streams round-trip exactly") {
    val rnd = new scala.util.Random(3)
    for (trial <- 0 until 20) {
      val n = 200 + rnd.nextInt(2000)
      val labels = Array.fill(n)(rnd.nextInt(64))
      // biased decisions exercise both MPS and LPS paths deeply
      val bias = 0.05 + rnd.nextDouble() * 0.9
      val bits = Array.fill(n)(if (rnd.nextDouble() < bias) 1 else 0)
      val enc = new Jbig2.ArithEncoder
      val ecx = new Jbig2.Contexts(64)
      (0 until n).foreach(i => enc.encode(ecx, labels(i), bits(i)))
      val data = enc.flush()
      val dec = new Jbig2.ArithDecoder(data)
      val dcx = new Jbig2.Contexts(64)
      (0 until n).foreach { i =>
        assert(dec.decode(dcx, labels(i)) == bits(i),
          s"trial $trial decision $i (bias $bias, ${data.length} bytes)")
      }
    }
  }

  test("MQ coder: all-MPS and all-LPS extremes") {
    for (value <- Seq(0, 1); n <- Seq(1, 7, 64, 1000)) {
      val enc = new Jbig2.ArithEncoder
      val ecx = new Jbig2.Contexts(2)
      (0 until n).foreach(_ => enc.encode(ecx, 0, value))
      val data = enc.flush()
      val dec = new Jbig2.ArithDecoder(data)
      val dcx = new Jbig2.Contexts(2)
      (0 until n).foreach(i => assert(dec.decode(dcx, 0) == value, s"$i"))
    }
  }

  test("generic region: all templates, varied geometry, exact decode") {
    val rnd = new scala.util.Random(17)
    for (template <- 0 to 3; trial <- 0 until 3) {
      val w = 5 + rnd.nextInt(60) // off-byte widths exercise padding
      val h = 3 + rnd.nextInt(40)
      val bm = mkBitmap(w, h)((x, y) =>
        ((x * 3 + y * 7 + trial) % 11) < 4 || rnd.nextInt(5) == 0)
      val at = Jbig2.nominalAt(template)
      val mq = Jbig2.encodeGeneric(bm, template, at, tpgdon = false)
      val dec = Jbig2.decodeGeneric(new Jbig2.ArithDecoder(mq),
        new Jbig2.Contexts(1 << 16), w, h, template, at, tpgdon = false)
      assert(dec.data.sameElements(bm.data), s"template $template/$trial")
    }
  }

  test("generic region: TPGDON typical rows decode exactly") {
    for (template <- 0 to 3) {
      // long runs of repeated rows — the case TPGDON compresses
      val bm = mkBitmap(40, 30)((x, y) => (y / 5) % 2 == 0 && x % 3 != 0)
      val at = Jbig2.nominalAt(template)
      val mq = Jbig2.encodeGeneric(bm, template, at, tpgdon = true)
      val mqPlain = Jbig2.encodeGeneric(bm, template, at, tpgdon = false)
      val dec = Jbig2.decodeGeneric(new Jbig2.ArithDecoder(mq),
        new Jbig2.Contexts(1 << 16), 40, 30, template, at, tpgdon = true)
      assert(dec.data.sameElements(bm.data), s"template $template")
      // typicality must actually pay on this fixture
      assert(mq.length < mqPlain.length, s"template $template: " +
        s"tpgdon ${mq.length} vs plain ${mqPlain.length}")
    }
  }

  test("generic region: non-nominal AT pixels round-trip") {
    val bm = mkBitmap(33, 21)((x, y) => (x + 2 * y) % 5 < 2)
    val at = Array((1, -1), (-4, -1), (3, -2), (-3, -2))
    val mq = Jbig2.encodeGeneric(bm, 0, at, tpgdon = false)
    val dec = Jbig2.decodeGeneric(new Jbig2.ArithDecoder(mq),
      new Jbig2.Contexts(1 << 16), 33, 21, 0, at, tpgdon = false)
    assert(dec.data.sameElements(bm.data))
  }

  test("embedded segment stream: write -> parse -> decode, all templates") {
    for (template <- 0 to 3; tpgdon <- Seq(false, true)) {
      val bm = mkBitmap(29, 17)((x, y) => ((x ^ y) & 3) == 0)
      val stream = Jbig2.writeEmbedded(bm, template, tpgdon)
      val segs = Jbig2.segments(stream)
      assert(segs.map(_.segType) == Seq(48, 39))
      assert(segs.forall(_.page == 1))
      val (page, notes) = Jbig2.decodeEmbedded(stream)
      assert(page.width == 29 && page.height == 17)
      assert(page.data.sameElements(bm.data), s"t$template tpgdon=$tpgdon")
      assert(notes.isEmpty)
    }
  }

  test("PDF filter presentation inverts to DeviceGray (0 = black)") {
    val bm = mkBitmap(16, 4)((x, y) => y == 1) // row 1 all black
    val out = Jbig2.pdfFilterDecode(Jbig2.writeEmbedded(bm))
    assert(out.length == 2 * 4)
    assert(out(0) == -1 && out(1) == -1) // row 0 white (all 1s)
    assert(out(2) == 0 && out(3) == 0) // row 1 black (all 0s)
  }

  test("rendered PDF page: JBIG2 image paints the closed-form pixels") {
    val w = 21; val h = 13
    val bm = mkBitmap(w, h)((x, y) => x >= 3 && x < 9 && y >= 2 && y < 7)
    val b = new Pdf.PdfBuilder
    val img = b.addStream(
      "/Type /XObject /Subtype /Image " +
        s"/Width $w /Height $h /ColorSpace /DeviceGray " +
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
      Jbig2.writeEmbedded(bm))
    b.addPage(s"q $w 0 0 $h 0 0 cm /I Do Q", (w, h),
      s"/XObject << /I $img 0 R >>")
    val pages = PdfRender.renderPageImages(b.build())
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pages.head.png))
    var black = 0
    for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
      if ((im.getRGB(x, y) & 0xffffff) == 0) black += 1
    assert(black == 6 * 5, s"black=$black")
  }

  test("globals-referencing streams are a named render skip") {
    val b = new Pdf.PdfBuilder
    val bm = mkBitmap(8, 8)((x, y) => x == y)
    val img = b.addStream(
      "/Type /XObject /Subtype /Image /Width 8 /Height 8 " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        "/Filter /JBIG2Decode /DecodeParms << /JBIG2Globals 99 0 R >>",
      Jbig2.writeEmbedded(bm))
    b.addPage("q 8 0 0 8 0 0 cm /I Do Q", (8, 8),
      s"/XObject << /I $img 0 R >>")
    val rendered = PdfRender.renderPageImages(b.build())
    assert(rendered.head.unsupported.exists(_.contains("jbig2-globals")))
  }

  test("corrupt streams fail soft: no crash, no OOM") {
    val bm = mkBitmap(25, 15)((x, y) => (x + y) % 4 == 0)
    val stream = Jbig2.writeEmbedded(bm, 0, tpgdon = true)
    val rnd = new scala.util.Random(9)
    (0 until 150).foreach { _ =>
      val mut = stream.clone()
      val at = rnd.nextInt(mut.length)
      mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val (page, _) = Jbig2.decodeEmbedded(mut)
        assert(page.width.toLong * page.height <= (1L << 26))
      } catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
          _: UnsupportedOperationException => ()
      }
    }
    (0 to stream.length by 7).foreach { cut =>
      try Jbig2.decodeEmbedded(stream.take(cut))
      catch { case _: IllegalArgumentException => () }
    }
  }
}
