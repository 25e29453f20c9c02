package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** JPEG 2000 (ITU-T T.800) baseline: Tier-1 pass-walk roundtrips,
  * 5/3 DWT perfect reconstruction, tag trees, full codestream
  * encode→decode lossless identity across geometries / levels /
  * code-block sizes / components, JP2 box unwrap, and corruption
  * behavior (fail soft, never OOM).
  */
class Jpeg2000Spec extends AnyFunSuite {

  private def roundtrip(planes: Array[Array[Int]], w: Int, h: Int,
      levels: Int, cbExp: Int, rct: Boolean, clue: String): Unit = {
    val cs = Jpeg2000.encode(planes, w, h, 8, levels, cbExp, rct)
    val img = Jpeg2000.decode(cs)
    assert(img.width == w && img.height == h, clue)
    assert(img.comps.length == planes.length, clue)
    planes.zip(img.comps).zipWithIndex.foreach { case ((want, got), c) =>
      assert(got.sameElements(want), s"$clue comp $c")
    }
  }

  test("T1 code block: random coefficients round-trip, all bands") {
    val rnd = new scala.util.Random(7)
    for (band <- 0 to 3; trial <- 0 until 4) {
      val w = 1 + rnd.nextInt(40) // off-stripe heights exercise sh < 4
      val h = 1 + rnd.nextInt(37)
      val coeffs = Array.fill(w * h)(
        if (rnd.nextInt(3) == 0) 0
        else rnd.nextInt(2000) - 1000)
      val (bytes, planes, passes) = Jpeg2000.t1Encode(coeffs, w, h, band)
      if (coeffs.forall(_ == 0)) assert(passes == 0)
      else {
        val (mags, negs) =
          Jpeg2000.t1Decode(bytes, 0, bytes.length, w, h, band, planes,
            passes)
        coeffs.zipWithIndex.foreach { case (want, i) =>
          val got = if (negs(i)) -mags(i) else mags(i)
          assert(got == want, s"band $band trial $trial at $i")
        }
      }
    }
  }

  test("T1 sparse blocks exercise run-length coding") {
    // a mostly-zero block with isolated spikes: cleanup RL columns
    val w = 16; val h = 16
    val coeffs = new Array[Int](w * h)
    coeffs(5 * w + 3) = 7
    coeffs(12 * w + 9) = -300
    coeffs(15 * w + 15) = 1
    val (bytes, planes, passes) = Jpeg2000.t1Encode(coeffs, w, h, 3)
    val (mags, negs) =
      Jpeg2000.t1Decode(bytes, 0, bytes.length, w, h, 3, planes, passes)
    coeffs.zipWithIndex.foreach { case (want, i) =>
      assert((if (negs(i)) -mags(i) else mags(i)) == want, s"at $i")
    }
  }

  test("5/3 DWT: forward then inverse is the identity") {
    val rnd = new scala.util.Random(11)
    for ((cw, ch) <- Seq((1, 1), (2, 3), (5, 1), (7, 7), (64, 33), (17, 50))) {
      val a = Array.fill(cw * ch)(rnd.nextInt(512) - 256)
      val want = a.clone()
      Jpeg2000.fwdDwtLevel(a, cw, cw, ch)
      Jpeg2000.invDwtLevel(a, cw, cw, ch)
      assert(a.sameElements(want), s"${cw}x$ch")
    }
  }

  test("RCT: forward then inverse is the identity") {
    val rnd = new scala.util.Random(13)
    val r = Array.fill(100)(rnd.nextInt(256) - 128)
    val g = Array.fill(100)(rnd.nextInt(256) - 128)
    val b = Array.fill(100)(rnd.nextInt(256) - 128)
    val (wr, wg, wb) = (r.clone(), g.clone(), b.clone())
    Jpeg2000.fwdRct(r, g, b)
    Jpeg2000.invRct(r, g, b)
    assert(r.sameElements(wr) && g.sameElements(wg) && b.sameElements(wb))
  }

  test("tag tree: encode -> decode across thresholds") {
    val rnd = new scala.util.Random(17)
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 5), (8, 1))) {
      val enc = new Jpeg2000.TagTree(w, h)
      val vals = Array.fill(w * h)(rnd.nextInt(6))
      vals.zipWithIndex.foreach { case (v, i) => enc.value(i) = v }
      enc.buildUp()
      val bw = new Jpeg2000.HdrBitWriter
      for (y <- 0 until h; x <- 0 until w) enc.encodeValue(bw, x, y)
      val bytes = bw.alignEnd()
      val dec = new Jpeg2000.TagTree(w, h)
      val br = new Jpeg2000.HdrBitReader(bytes, 0)
      for (y <- 0 until h; x <- 0 until w)
        assert(dec.decodeValue(br, x, y) == vals(y * w + x),
          s"${w}x$h at ($x,$y)")
    }
  }

  test("header bit I/O: 0xFF stuffing round-trips") {
    val rnd = new scala.util.Random(19)
    // long 1-runs force 0xFF bytes and the 7-bit stuffing rule
    val bits = Array.fill(400)(if (rnd.nextInt(5) == 0) 0 else 1)
    val bw = new Jpeg2000.HdrBitWriter
    bits.foreach(bw.bit)
    val bytes = bw.alignEnd()
    assert(!bytes.lastOption.contains(0xff.toByte))
    val br = new Jpeg2000.HdrBitReader(bytes, 0)
    bits.foreach(b => assert(br.bit() == b))
  }

  test("full codestream: lossless identity across geometries") {
    val rnd = new scala.util.Random(23)
    for (((w, h), levels, cbExp) <- Seq(
      ((1, 1), 0, 2), ((5, 7), 1, 2), ((16, 16), 2, 4),
      ((64, 64), 3, 6), ((100, 81), 5, 4), ((37, 3), 2, 5))) {
      val plane = Array.fill(w * h)(rnd.nextInt(256))
      roundtrip(Array(plane), w, h, levels, cbExp,
        rct = false, s"${w}x$h l$levels cb$cbExp")
    }
  }

  test("full codestream: 3-component RGB with and without RCT") {
    val rnd = new scala.util.Random(29)
    val w = 50; val h = 23
    val planes = Array.fill(3)(Array.fill(w * h)(rnd.nextInt(256)))
    roundtrip(planes, w, h, 3, 4, rct = true, "rct")
    roundtrip(planes, w, h, 3, 4, rct = false, "no-rct")
  }

  test("structured images (gradients, tiles) stay lossless") {
    val w = 48; val h = 32
    val grad = Array.tabulate(w * h)(i => (i % w) * 255 / (w - 1))
    val tiles = Array.tabulate(w * h)(i =>
      if (((i % w) / 8 + (i / w) / 8) % 2 == 0) 16 else 240)
    roundtrip(Array(grad), w, h, 4, 6, rct = false, "gradient")
    roundtrip(Array(tiles), w, h, 2, 4, rct = false, "tiles")
  }

  test("multi-tile codestreams: lossless identity across tile grids") {
    val rnd = new scala.util.Random(31)
    // (image, tile grid, levels, cbExp): edge tiles narrower/shorter
    // than the grid pitch, tile dims below/above the code-block size,
    // levels deep enough that small tiles bottom out early
    for (((w, h), (tw, th), levels, cbExp) <- Seq(
      ((40, 24), (16, 16), 2, 4), ((33, 17), (10, 8), 1, 3),
      ((64, 64), (32, 32), 3, 5), ((21, 30), (21, 7), 2, 2),
      ((50, 50), (17, 23), 4, 6))) {
      val plane = Array.fill(w * h)(rnd.nextInt(256))
      val cs = Jpeg2000.encodeTiled(Array(plane), w, h, 8, levels,
        tw, th, cbExp)
      val img = Jpeg2000.decode(cs)
      assert(img.width == w && img.height == h)
      assert(img.comps.head.sameElements(plane),
        s"${w}x$h tiles ${tw}x$th l$levels cb$cbExp")
    }
  }

  test("multi-tile RGB with RCT stays lossless") {
    val rnd = new scala.util.Random(37)
    val w = 40; val h = 28
    val planes = Array.fill(3)(Array.fill(w * h)(rnd.nextInt(256)))
    val cs = Jpeg2000.encodeTiled(planes, w, h, 8, 2, 16, 12, 4,
      useRct = true)
    val img = Jpeg2000.decode(cs)
    planes.zip(img.comps).zipWithIndex.foreach { case ((want, got), c) =>
      assert(got.sameElements(want), s"comp $c")
    }
    // the stream must really be tiled (one SOT per tile: 3x3 grid)
    var sots = 0
    for (i <- 0 until cs.length - 1)
      if ((cs(i) & 0xff) == 0xff && (cs(i + 1) & 0xff) == 0x90) sots += 1
    assert(sots == 9, s"sots=$sots")
  }

  test("corrupt multi-tile codestreams fail soft") {
    val rnd = new scala.util.Random(41)
    val plane = Array.fill(30 * 20)(rnd.nextInt(256))
    val cs = Jpeg2000.encodeTiled(Array(plane), 30, 20, 8, 2, 11, 9, 3)
    (0 until 200).foreach { _ =>
      val mut = cs.clone()
      val at = rnd.nextInt(mut.length)
      mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val img = Jpeg2000.decode(mut)
        assert(img.width.toLong * img.height <= (1L << 26))
      } catch { case _: IllegalArgumentException => () }
    }
    (0 to cs.length by 7).foreach { cut =>
      try Jpeg2000.decode(cs.take(cut))
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("JP2 box wrapper unwraps to the codestream") {
    val plane = Array.tabulate(8 * 8)(i => i * 3 % 256)
    val cs = Jpeg2000.encode(Array(plane), 8, 8, 8, 1, 2)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val len = payload.length + 8
      Array[Byte](((len >> 24) & 0xff).toByte, ((len >> 16) & 0xff).toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++
        typ.getBytes("ISO-8859-1") ++ payload
    }
    val jp2 = box("jP  ", Array[Byte](13, 10, -121, 10)) ++
      box("ftyp", "jp2 ".getBytes("ISO-8859-1") ++ new Array[Byte](8)) ++
      box("jp2c", cs)
    val img = Jpeg2000.decode(jp2)
    assert(img.comps.head.sameElements(plane))
  }

  test("rendered PDF page: JPXDecode image paints the exact pixels") {
    val w = 20; val h = 12
    // two-tone tile pattern: exact pixel counts survive lossless coding
    val plane = Array.tabulate(w * h)(i =>
      if ((i % w) < 8 && (i / w) < 5) 0 else 255)
    val cs = Jpeg2000.encode(Array(plane), w, h, 8, 2, 4)
    val b = new Pdf.PdfBuilder
    val img = b.addStream(
      "/Type /XObject /Subtype /Image " +
        s"/Width $w /Height $h /ColorSpace /DeviceGray " +
        "/BitsPerComponent 8 /Filter /JPXDecode", cs)
    b.addPage(s"q $w 0 0 $h 0 0 cm /I Do Q", (w, h),
      s"/XObject << /I $img 0 R >>")
    val pdf = b.build()
    val pages = PdfRender.renderPageImages(pdf)
    assert(pages.head.unsupported.isEmpty,
      pages.head.unsupported.mkString(","))
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pages.head.png))
    var black = 0
    for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
      if ((im.getRGB(x, y) & 0xffffff) == 0) black += 1
    assert(black == 8 * 5, s"black=$black")
    // extractImages re-encodes to PNG through the same decode
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.length == 1 && imgs.head.format == "png")
    val ex = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(imgs.head.data))
    assert(ex.getRaster.getSample(0, 0, 0) == 0)
    assert(ex.getRaster.getSample(8, 0, 0) == 255)
  }

  test("3-component RCT JPX renders as RGB in a PDF page") {
    val w = 10; val h = 10
    val planes = Array(
      Array.tabulate(w * h)(i => if (i % w < 5) 255 else 0), // red left
      Array.fill(w * h)(0),
      Array.tabulate(w * h)(i => if (i % w < 5) 0 else 255)) // blue right
    val cs = Jpeg2000.encode(planes, w, h, 8, 1, 4, useRct = true)
    val b = new Pdf.PdfBuilder
    val img = b.addStream(
      "/Type /XObject /Subtype /Image " +
        s"/Width $w /Height $h /ColorSpace /DeviceRGB " +
        "/BitsPerComponent 8 /Filter /JPXDecode", cs)
    b.addPage(s"q $w 0 0 $h 0 0 cm /I Do Q", (w, h),
      s"/XObject << /I $img 0 R >>")
    val pages = PdfRender.renderPageImages(b.build())
    assert(pages.head.unsupported.isEmpty)
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pages.head.png))
    assert((im.getRGB(2, 5) & 0xffffff) == 0xff0000, "left red")
    assert((im.getRGB(7, 5) & 0xffffff) == 0x0000ff, "right blue")
  }

  test("9/7 irreversible: near-lossless at the fine quantizer") {
    val rnd = new scala.util.Random(37)
    for ((w, h, levels, cbExp) <- Seq((40, 28, 3, 4), (17, 9, 1, 2),
      (64, 64, 5, 6))) {
      val plane = Array.fill(w * h)(rnd.nextInt(256))
      val cs = Jpeg2000.encode97(Array(plane), w, h, 8, levels, cbExp)
      val img = Jpeg2000.decode(cs)
      assert(img.width == w && img.height == h)
      val errs = plane.zip(img.comps.head).map { case (a, b) =>
        math.abs(a - b)
      }
      // quantizer step 1/4 + midpoint reconstruction + float synthesis:
      // every sample within 2, average well under half a level
      assert(errs.max <= 2, s"${w}x$h maxErr=${errs.max}")
      assert(errs.sum.toDouble / errs.length < 0.5,
        s"${w}x$h meanErr=${errs.sum.toDouble / errs.length}")
    }
  }

  test("9/7 with ICT: RGB decodes within tolerance") {
    val rnd = new scala.util.Random(41)
    val w = 24; val h = 20
    val planes = Array.fill(3)(Array.fill(w * h)(rnd.nextInt(256)))
    val cs = Jpeg2000.encode97(planes, w, h, 8, 2, 4, useIct = true)
    val img = Jpeg2000.decode(cs)
    planes.zip(img.comps).zipWithIndex.foreach { case ((want, got), c) =>
      val maxErr = want.zip(got).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 3, s"comp $c maxErr=$maxErr") // ICT adds rounding
    }
  }

  test("out-of-scope codestreams are a named render skip") {
    val plane = Array.fill(8 * 8)(128)
    val cs = Jpeg2000.encode(Array(plane), 8, 8, 8, 1, 2)
    // flip the COD progression byte to 4 (CPRL, unsupported): named skip
    val i = cs.indexOfSlice(Array(0xff.toByte, 0x52.toByte))
    val mut = cs.clone()
    mut(i + 5) = 4
    val b = new Pdf.PdfBuilder
    val img = b.addStream(
      "/Type /XObject /Subtype /Image /Width 8 /Height 8 " +
        "/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /JPXDecode",
      mut)
    b.addPage("q 8 0 0 8 0 0 cm /I Do Q", (8, 8),
      s"/XObject << /I $img 0 R >>")
    val pages = PdfRender.renderPageImages(b.build())
    assert(pages.head.unsupported.exists(_.startsWith("jpx-")),
      pages.head.unsupported.mkString(","))
  }

  test("corrupt codestreams fail soft: no crash, no OOM") {
    val rnd = new scala.util.Random(31)
    val plane = Array.fill(24 * 18)(rnd.nextInt(256))
    val cs = Jpeg2000.encode(Array(plane), 24, 18, 8, 2, 4)
    (0 until 200).foreach { _ =>
      val mut = cs.clone()
      val at = rnd.nextInt(mut.length)
      mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val img = Jpeg2000.decode(mut)
        assert(img.width.toLong * img.height <= (1L << 26))
      } catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
          _: NegativeArraySizeException | _: MatchError => ()
      }
    }
    (0 to cs.length by 7).foreach { cut =>
      try Jpeg2000.decode(cs.take(cut))
      catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException => ()
      }
    }
  }

  // ---- real-encoder tier: bypass / COC-QCC / multi-tile-parts ------

  private def roundtripAdv(planes: Array[Array[Int]], w: Int, h: Int,
      levels: Array[Int], cbExps: Array[Int], bypass: Array[Boolean],
      tileW: Int, tileH: Int, tileParts: Int, rct: Boolean,
      clue: String): Array[Byte] = {
    val cs = Jpeg2000.encodeAdvanced(planes, w, h, 8, levels, cbExps,
      bypass, tileW, tileH, tileParts, rct)
    val img = Jpeg2000.decode(cs)
    assert(img.width == w && img.height == h, clue)
    planes.zip(img.comps).zipWithIndex.foreach { case ((want, got), c) =>
      assert(got.sameElements(want), s"$clue comp $c")
    }
    cs
  }

  /** Count a marker by scanning the codestream byte-pairwise. Only
    * safe for markers >= 0xFF90 (SOT/SOD/EOC): MQ stuffing keeps coded
    * bytes after 0xFF at <= 0x8F, so lower marker codes CAN occur
    * inside packet bodies — count those with countHeaderMarker.
    */
  private def countMarker(cs: Array[Byte], mk: Int): Int =
    (0 until cs.length - 1).count(i =>
      (cs(i) & 0xff) == 0xff && (cs(i + 1) & 0xff) == (mk & 0xff))

  /** Count a marker by WALKING the main header (marker-length hops
    * from SIZ to the first SOT) — correct for COC/QCC/COD/QCD. */
  private def countHeaderMarker(cs: Array[Byte], mk: Int): Int = {
    def u16(i: Int) = ((cs(i) & 0xff) << 8) | (cs(i + 1) & 0xff)
    var p = 2
    var n = 0
    while (u16(p) != 0xff90) {
      if (u16(p) == mk) n += 1
      p += 2 + u16(p + 2)
    }
    n
  }

  test("T1 bypass: raw SPP/MRP segments round-trip, all bands") {
    val rnd = new scala.util.Random(77)
    for (band <- 0 to 3; trial <- 0 until 4) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(37)
      // magnitudes up to ~2000 give ~11 planes, well past the 4-plane
      // MQ prefix, so raw segments really run
      val coeffs = Array.fill(w * h)(
        if (rnd.nextInt(3) == 0) 0 else rnd.nextInt(4000) - 2000)
      val (segs, planes, passes) =
        Jpeg2000.t1EncodeSegs(coeffs, w, h, band, bypass = true)
      if (!coeffs.forall(_ == 0)) {
        if (planes > 4)
          assert(segs.length > 1, s"bypass must split segments ($planes planes)")
        val data = segs.map(_._1).foldLeft(Array.emptyByteArray)(_ ++ _)
        val (mags, negs) = Jpeg2000.t1DecodeSegs(data, 0,
          segs.map(_._1.length), w, h, band, planes, passes, bypass = true)
        coeffs.zipWithIndex.foreach { case (want, i) =>
          val got = if (negs(i)) -mags(i) else mags(i)
          assert(got == want, s"band $band trial $trial at $i")
        }
      }
    }
  }

  test("bypass codestream: lossless identity, cb-style bit set") {
    val rnd = new scala.util.Random(78)
    val w = 37; val h = 29
    val plane = Array.fill(w * h)(rnd.nextInt(256))
    val cs = roundtripAdv(Array(plane), w, h, Array(3), Array(4),
      Array(true), 0, 0, 1, rct = false, "bypass gray")
    // SPcod code-block style byte (COD at SIZ end) must carry bit 0
    val codAt = (0 until cs.length - 1).indexWhere(i =>
      (cs(i) & 0xff) == 0xff && (cs(i + 1) & 0xff) == 0x52)
    assert((cs(codAt + 12) & 0xff) == 1, "bypass bit in COD SPcod")
  }

  test("COC/QCC: per-component levels and code-block sizes round-trip") {
    val rnd = new scala.util.Random(79)
    val w = 41; val h = 33
    val planes = Array.fill(3)(Array.fill(w * h)(rnd.nextInt(256)))
    val cs = roundtripAdv(planes, w, h, Array(2, 0, 4), Array(4, 6, 5),
      Array(false, false, true), 0, 0, 1, rct = false, "per-comp")
    assert(countHeaderMarker(cs, 0xff53) == 2, "COC for comps 1 and 2")
    assert(countHeaderMarker(cs, 0xff5d) == 2, "QCC for comps 1 and 2")
  }

  test("multi-tile-parts: TPsot > 0 round-trips, SOT count checks out") {
    val rnd = new scala.util.Random(80)
    val w = 50; val h = 38
    val plane = Array.fill(w * h)(rnd.nextInt(256))
    val cs = roundtripAdv(Array(plane), w, h, Array(2), Array(4),
      Array(false), 23, 17, 3, rct = false, "tile-parts")
    // 3x3 tiles, up to 3 parts each (levels 2 -> 3 packets per tile)
    val tiles = 3 * 3
    assert(countMarker(cs, 0x90) == tiles * 3, "3 tile-parts per tile")
  }

  test("kitchen sink: tiles + parts + per-comp + bypass + RCT") {
    val rnd = new scala.util.Random(81)
    val w = 61; val h = 47
    val planes = Array.fill(3)(Array.fill(w * h)(rnd.nextInt(256)))
    val cs = roundtripAdv(planes, w, h, Array(3, 1, 2), Array(4, 5, 3),
      Array(true, false, true), 29, 21, 2, rct = true, "kitchen sink")
    assert(countHeaderMarker(cs, 0xff53) == 2 &&
      countHeaderMarker(cs, 0xff5d) == 2)
    assert(countMarker(cs, 0x90) > 6, "multiple tile-parts emitted")
  }

  test("corrupt advanced codestreams fail soft: no crash, no OOM") {
    val rnd = new scala.util.Random(82)
    val w = 40; val h = 30
    val planes = Array.fill(3)(Array.fill(w * h)(rnd.nextInt(256)))
    val cs = Jpeg2000.encodeAdvanced(planes, w, h, 8,
      Array(3, 1, 2), Array(4, 5, 3), Array(true, false, true),
      19, 13, 2, useRct = true)
    (0 until 400).foreach { _ =>
      val mut = cs.clone()
      val at = rnd.nextInt(mut.length)
      mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val img = Jpeg2000.decode(mut)
        assert(img.width.toLong * img.height <= (1L << 26))
      } catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException =>
          ()
      }
    }
    (0 to cs.length by 11).foreach { cut =>
      try Jpeg2000.decode(cs.take(cut))
      catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException =>
          ()
      }
    }
  }
}
