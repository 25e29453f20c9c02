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

  test("integer arithmetic coding (Annex A): values + OOB round-trip") {
    // every bucket boundary, signs, OOB interleaved, shared banks
    val vals: Seq[Option[Int]] = Seq(
      Some(0), Some(1), Some(3), Some(4), Some(19), Some(20), Some(83),
      Some(84), Some(339), Some(340), Some(4435), Some(4436), Some(70000),
      Some(-1), Some(-3), Some(-4), Some(-20), Some(-84), Some(-340),
      Some(-4436), Some(-123456), None, Some(7), None, Some(-7))
    val rnd = new scala.util.Random(41)
    val mixed = vals ++ Seq.fill(300)(Some(rnd.nextInt(9000) - 4500))
    val enc = new Jbig2.ArithEncoder
    val e1 = new Jbig2.IntCtx; val e2 = new Jbig2.IntCtx
    mixed.zipWithIndex.foreach { case (v, i) =>
      Jbig2.encodeInt(enc, if (i % 2 == 0) e1 else e2, v)
    }
    val data = enc.flush()
    val ad = new Jbig2.ArithDecoder(data)
    val d1 = new Jbig2.IntCtx; val d2 = new Jbig2.IntCtx
    mixed.zipWithIndex.foreach { case (v, i) =>
      assert(Jbig2.decodeInt(ad, if (i % 2 == 0) d1 else d2) == v, s"at $i")
    }
  }

  test("IAID symbol-id coding round-trips at every code length") {
    for (n <- Seq(1, 2, 3, 5, 8, 17, 300)) {
      val scl = Jbig2.symCodeLen(n)
      assert((1 << scl) >= n && scl >= 1, s"n=$n scl=$scl")
      val enc = new Jbig2.ArithEncoder
      val ecx = new Jbig2.Contexts(1 << (scl + 1))
      val ids = (0 until n) ++ Seq(0, n - 1, n / 2)
      ids.foreach(Jbig2.encodeIaid(enc, ecx, scl, _))
      val ad = new Jbig2.ArithDecoder(enc.flush())
      val dcx = new Jbig2.Contexts(1 << (scl + 1))
      ids.foreach(id => assert(Jbig2.decodeIaid(ad, dcx, scl) == id))
    }
  }

  private def glyphs(seed: Int): Seq[Jbig2.Bitmap] = {
    val rnd = new scala.util.Random(seed)
    // three height classes (two symbols share a height) in
    // non-decreasing height order, varied widths
    Seq((5, 6), (7, 6), (4, 8), (6, 9), (9, 9)).map { case (w, h) =>
      mkBitmap(w, h)((x, y) =>
        (x + y * 2 + seed) % 4 < 2 || rnd.nextInt(6) == 0)
    }
  }

  test("symbol dictionary: encode -> decode round-trips exactly") {
    for (template <- 0 to 3; seed <- Seq(1, 9)) {
      val syms = glyphs(seed + template)
      val payload = Jbig2.encodeSymbolDict(syms, template)
      val got = Jbig2.decodeSymbolDict(payload, 0, payload.length,
        IndexedSeq.empty)
      assert(got.isRight, s"t$template: $got")
      val dec = got.toOption.get
      assert(dec.length == syms.length)
      syms.zip(dec).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.width == b.width && a.height == b.height, s"sym $i dims")
        assert(a.data.sameElements(b.data), s"sym $i pixels (t$template)")
      }
    }
  }

  test("text region: multi-strip placement composes the exact page") {
    val syms = glyphs(3)
    // two strips (t=2 and t=14), varied symbols, disjoint and
    // overlapping (OR) placements
    val insts = Seq(
      Jbig2.TextInstance(0, 1, 2), Jbig2.TextInstance(2, 8, 2),
      Jbig2.TextInstance(4, 14, 2), Jbig2.TextInstance(1, 26, 2),
      Jbig2.TextInstance(3, 2, 14), Jbig2.TextInstance(3, 6, 14),
      Jbig2.TextInstance(0, 20, 14))
    val (data, globals) = Jbig2.writeEmbeddedText(40, 26, syms, insts)
    assert(globals.isEmpty)
    val (page, notes) = Jbig2.decodeEmbedded(data)
    assert(notes.isEmpty, notes.mkString(","))
    assert(page.width == 40 && page.height == 26)
    val want = Jbig2.Bitmap.empty(40, 26)
    insts.foreach { i =>
      val g = syms(i.id)
      for (y <- 0 until g.height; x <- 0 until g.width)
        if (g.get(x, y) == 1 && i.s + x < 40 && i.t + y < 26)
          want.set(i.s + x, i.t + y)
    }
    assert(page.data.sameElements(want.data))
  }

  test("text region: symbols from a /JBIG2Globals stream render in PDF") {
    val syms = glyphs(5)
    val insts = Seq(Jbig2.TextInstance(0, 0, 0), Jbig2.TextInstance(1, 7, 0),
      Jbig2.TextInstance(4, 16, 0))
    val (data, globals) =
      Jbig2.writeEmbeddedText(30, 10, syms, insts, splitGlobals = true)
    assert(globals.nonEmpty)
    // direct filter surface
    val viaFilter = Jbig2.pdfFilterDecode(data, globals)
    val (direct, notes) = Jbig2.decodeEmbedded(data, globals)
    assert(notes.isEmpty, notes.mkString(","))
    assert(viaFilter.sameElements(direct.data.map(b => (~b).toByte)))
    // through a rendered PDF page with the globals as its own stream obj
    val b = new Pdf.PdfBuilder
    val gRef = b.addStream("", globals)
    val img = b.addStream(
      "/Type /XObject /Subtype /Image /Width 30 /Height 10 " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /JBIG2Decode /DecodeParms << /JBIG2Globals $gRef 0 R >>",
      data)
    b.addPage("q 30 0 0 10 0 0 cm /I Do Q", (30, 10),
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
    assert(black == direct.blackCount, s"render black=$black")
    // and through extractImages' PNG re-encode
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.length == 1 && imgs.head.format == "png")
  }

  test("refinement region (§6.3): both templates round-trip exactly") {
    val rnd = new scala.util.Random(29)
    for (template <- 0 to 1; trial <- 0 until 3) {
      val rw = 6 + rnd.nextInt(30); val rh = 5 + rnd.nextInt(20)
      val ref = mkBitmap(rw, rh)((x, y) => (x + 2 * y + trial) % 5 < 2)
      // target reshapes the reference (different dims) and flips pixels
      val w = rw + rnd.nextInt(5) - 2; val h = rh + rnd.nextInt(5) - 2
      val dx = rnd.nextInt(5) - 2; val dy = rnd.nextInt(5) - 2
      val target = mkBitmap(math.max(w, 1), math.max(h, 1))((x, y) =>
        ref.get(x - dx, y - dy) == 1 ^ (rnd.nextInt(12) == 0))
      val at = if (template == 0 && trial == 2) Array((-2, -1), (1, -1))
        else Jbig2.nominalRefineAt
      val enc = new Jbig2.ArithEncoder
      val ecx = new Jbig2.Contexts(1 << 13)
      Jbig2.encodeRefinementInto(enc, ecx, target, template, at, ref, dx, dy)
      val dec = Jbig2.decodeRefinement(new Jbig2.ArithDecoder(enc.flush()),
        new Jbig2.Contexts(1 << 13), target.width, target.height,
        template, at, ref, dx, dy)
      assert(dec.data.sameElements(target.data), s"t$template/$trial")
      // near-identical targets must code much smaller than from scratch
      if (w == rw && h == rh) {
        val enc2 = new Jbig2.ArithEncoder
        Jbig2.encodeRefinementInto(enc2, new Jbig2.Contexts(1 << 13),
          target, template, at, ref, dx, dy)
        val plain = Jbig2.encodeGeneric(target, 0, Jbig2.nominalAt(0),
          tpgdon = false)
        assert(enc2.flush().length <= plain.length + 2,
          s"refinement didn't pay (t$template/$trial)")
      }
    }
  }

  test("refagg symbol dictionary: refined exports decode exactly") {
    for (rTemplate <- 0 to 1) {
      val base = glyphs(13)
      // refine inputs AND a previously-decoded new symbol (chained id
      // >= inSyms.length), height-class ordered targets
      val t0 = mkBitmap(6, 6)((x, y) => base(0).get(x, y) == 1 ^ (x == y))
      val t1 = mkBitmap(7, 7)((x, y) => base(2).get(x, y) == 1 || y == 6)
      val t2 = mkBitmap(7, 7)((x, y) => t1.get(x, y) == 1 ^ (x == 3))
      val refined = Seq((0, t0), (2, t1), (base.length + 1, t2))
      val payload = Jbig2.encodeSymbolDictRefAgg(base, refined, rTemplate)
      val got = Jbig2.decodeSymbolDict(payload, 0, payload.length,
        base.toIndexedSeq)
      assert(got.isRight, s"rt$rTemplate: $got")
      val dec = got.toOption.get
      assert(dec.length == base.length + refined.length)
      (base ++ Seq(t0, t1, t2)).zip(dec).zipWithIndex.foreach {
        case ((a, b), i) =>
          assert(a.width == b.width && a.height == b.height, s"sym $i dims")
          assert(a.data.sameElements(b.data), s"sym $i pixels (rt$rTemplate)")
      }
    }
  }

  test("refined text instances compose the exact page (§6.4.11)") {
    val syms = glyphs(19)
    // instance 1 and 3 are refined: reshaped + pixel-flipped variants
    val v0 = mkBitmap(6, 6)((x, y) => syms(0).get(x, y) == 1 ^ (x + y == 5))
    val v3 = mkBitmap(8, 9)((x, y) => syms(3).get(x, y) == 1 || x == 7)
    val insts = Seq(
      Jbig2.TextInstance(2, 1, 1),
      Jbig2.TextInstance(0, 7, 1, refined = Some(v0)),
      Jbig2.TextInstance(4, 15, 1),
      Jbig2.TextInstance(3, 3, 12, refined = Some(v3)),
      Jbig2.TextInstance(1, 13, 12))
    val (data, _) = Jbig2.writeEmbeddedText(30, 24, syms, insts)
    val (page, notes) = Jbig2.decodeEmbedded(data)
    assert(notes.isEmpty, notes.mkString(","))
    val want = Jbig2.Bitmap.empty(30, 24)
    insts.foreach { i =>
      val g = i.refined.getOrElse(syms(i.id))
      for (y <- 0 until g.height; x <- 0 until g.width)
        if (g.get(x, y) == 1 && i.s + x < 30 && i.t + y < 24)
          want.set(i.s + x, i.t + y)
    }
    assert(page.data.sameElements(want.data))
  }

  test("refagg dictionary chains through the embedded stream + PDF") {
    val base = glyphs(23).take(3) // heights 6,6,8
    val bold0 = mkBitmap(5, 6)((x, y) =>
      base(0).get(x, y) == 1 || base(0).get(x - 1, y) == 1)
    val bold2 = mkBitmap(4, 8)((x, y) =>
      base(2).get(x, y) == 1 || base(2).get(x - 1, y) == 1)
    val refined = Seq((0, bold0), (2, bold2))
    // text symbols index base ++ refined-targets (export order)
    val insts = Seq(Jbig2.TextInstance(3, 0, 0), // bold0
      Jbig2.TextInstance(1, 7, 0), Jbig2.TextInstance(4, 14, 0)) // bold2
    val (data, globals) = Jbig2.writeEmbeddedText(22, 10, base, insts,
      splitGlobals = true, refined = refined)
    assert(Jbig2.segments(globals).count(_.segType == 0) == 2)
    val (page, notes) = Jbig2.decodeEmbedded(data, globals)
    assert(notes.isEmpty, notes.mkString(","))
    val drawn = Seq((bold0, 0), (base(1), 7), (bold2, 14))
    val want = Jbig2.Bitmap.empty(22, 10)
    drawn.foreach { case (g, s) =>
      for (y <- 0 until g.height; x <- 0 until g.width)
        if (g.get(x, y) == 1 && s + x < 22) want.set(s + x, y)
    }
    assert(page.data.sameElements(want.data))
    // and the PDF filter surface resolves the two-dict globals chain
    val out = Jbig2.pdfFilterDecode(data, globals)
    assert(out.sameElements(page.data.map(b => (~b).toByte)))
  }

  test("refinement region segment refines the composed page (REPLACE)") {
    for (template <- 0 to 1; tpgron <- Seq(false, true)) {
      val base = mkBitmap(24, 16)((x, y) => (x + 2 * y) % 5 < 2)
      // target both ADDS ink and CLEARS base ink inside the box — only
      // REPLACE composition + true refinement decode can produce it
      val bx = 4; val by = 3
      val target = mkBitmap(14, 9)((x, y) =>
        base.get(bx + x, by + y) == 1 ^ ((x + y) % 7 == 0))
      val stream = Jbig2.writeEmbeddedRefine(base, target, bx, by,
        template, tpgron)
      val (page, notes) = Jbig2.decodeEmbedded(stream)
      assert(notes.isEmpty, notes.mkString(","))
      val want = Jbig2.Bitmap.empty(24, 16)
      for (y <- 0 until 16; x <- 0 until 24) {
        val in = x >= bx && x < bx + 14 && y >= by && y < by + 9
        val v = if (in) target.get(x - bx, y - by) else base.get(x, y)
        if (v == 1) want.set(x, y)
      }
      assert(page.data.sameElements(want.data), s"t$template tp=$tpgron")
      // the cleared pixels must actually exist (REPLACE is load-bearing)
      assert((0 until 9).exists(y => (0 until 14).exists(x =>
        base.get(bx + x, by + y) == 1 && target.get(x, y) == 0)))
    }
  }

  test("TPGRON typical rows must pay on identity-like refinements") {
    // solid reference: every interior pixel has a uniform 3x3
    // neighborhood, so typical rows skip ~90% of decisions; the target
    // deviates only at border pixels (non-uniform neighborhoods via
    // the out-of-bounds zeros), keeping every row typical
    val ref = mkBitmap(300, 200)((_, _) => true)
    val target = mkBitmap(300, 200)((x, y) =>
      !(x == 0 && y % 7 == 0))
    for (template <- 0 to 1) {
      def sz(tp: Boolean): Int = {
        val enc = new Jbig2.ArithEncoder
        Jbig2.encodeRefinementInto(enc, new Jbig2.Contexts(1 << 13),
          target, template, Jbig2.nominalRefineAt, ref, 0, 0, tp)
        enc.flush().length
      }
      val dec = Jbig2.decodeRefinement(
        new Jbig2.ArithDecoder({
          val enc = new Jbig2.ArithEncoder
          Jbig2.encodeRefinementInto(enc, new Jbig2.Contexts(1 << 13),
            target, template, Jbig2.nominalRefineAt, ref, 0, 0,
            tpgron = true)
          enc.flush()
        }),
        new Jbig2.Contexts(1 << 13), 300, 200, template,
        Jbig2.nominalRefineAt, ref, 0, 0, tpgron = true)
      assert(dec.data.sameElements(target.data), s"t$template")
      assert(sz(true) < sz(false), s"t$template: tpgron didn't pay")
    }
  }

  test("external combination operators compose in stream order") {
    // two overlapping generic regions with XOR: overlap cancels
    val a = mkBitmap(12, 8)((x, y) => true)
    val b = mkBitmap(12, 8)((x, y) => x < 6)
    val sa = Jbig2.writeEmbedded(a) // full stream: page info + region
    val sb = Jbig2.writeEmbedded(b)
    // re-point region b's comb op to XOR and append its region segment
    val regB = Jbig2.segments(sb).find(_.segType == 39).get
    val regBytes = sb.slice(regB.dataFrom - 11, regB.dataUntil)
    regBytes(11 + 16) = 2 // external comb op byte inside region info
    val (page, notes) = Jbig2.decodeEmbedded(sa ++ regBytes)
    assert(notes.isEmpty, notes.mkString(","))
    for (y <- 0 until 8; x <- 0 until 12)
      assert(page.get(x, y) == (if (x < 6) 0 else 1), s"($x,$y)")
  }

  test("pattern dictionary (§6.7): encode -> decode round-trips exactly") {
    for (template <- 0 to 3; n <- Seq(2, 4, 7)) {
      val pats = (0 until n).map(k =>
        mkBitmap(5, 4)((x, y) => (x + 2 * y + k) % (k + 2) == 0))
      val payload = Jbig2.encodePatternDict(pats, template)
      val got = Jbig2.decodePatternDict(payload, 0, payload.length)
      assert(got.isRight, s"t$template n$n: $got")
      val dec = got.toOption.get
      assert(dec.length == n)
      pats.zip(dec).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.data.sameElements(b.data), s"pattern $i (t$template n$n)")
      }
    }
  }

  test("halftone region (§6.6): gray-coded planes compose the page") {
    // 6 patterns -> 3 bitplanes; 5x5 square pitch; grid indices a
    // closed form; the decoded page must equal direct composition
    val pats = (0 until 6).map(k =>
      mkBitmap(5, 5)((x, y) => (x * 2 + y * 3 + k) % 6 < k + 1))
    val hgw = 6; val hgh = 4
    val grid = Array.tabulate(hgh, hgw)((mg, ng) => (mg * 3 + ng) % 6)
    val (data, globals) =
      Jbig2.writeEmbeddedHalftone(30, 20, pats, grid)
    assert(globals.isEmpty)
    val (page, notes) = Jbig2.decodeEmbedded(data)
    assert(notes.isEmpty, notes.mkString(","))
    assert(page.width == 30 && page.height == 20)
    val want = Jbig2.Bitmap.empty(30, 20)
    for (mg <- 0 until hgh; ng <- 0 until hgw) {
      val pat = pats(grid(mg)(ng))
      for (y <- 0 until 5; x <- 0 until 5)
        if (pat.get(x, y) == 1) want.set(ng * 5 + x, mg * 5 + y)
    }
    assert(page.data.sameElements(want.data))
  }

  test("halftone: pattern dict via /JBIG2Globals + PDF filter surface") {
    val pats = (0 until 4).map(k =>
      mkBitmap(4, 4)((x, y) => (x + y + k) % 4 <= k % 3))
    val grid = Array.tabulate(3, 5)((mg, ng) => (mg + 2 * ng) % 4)
    val (data, globals) =
      Jbig2.writeEmbeddedHalftone(20, 12, pats, grid, splitGlobals = true)
    assert(globals.nonEmpty)
    assert(Jbig2.segments(globals).map(_.segType) == Seq(16))
    val (direct, notes) = Jbig2.decodeEmbedded(data, globals)
    assert(notes.isEmpty, notes.mkString(","))
    val viaFilter = Jbig2.pdfFilterDecode(data, globals)
    assert(viaFilter.sameElements(direct.data.map(b => (~b).toByte)))
  }

  test("corrupt halftone streams fail soft: no crash, no OOM") {
    val pats = (0 until 5).map(k =>
      mkBitmap(4, 4)((x, y) => (x * 3 + y + k) % 5 < 2))
    val grid = Array.tabulate(4, 4)((mg, ng) => (mg * 2 + ng) % 5)
    val (stream, _) = Jbig2.writeEmbeddedHalftone(16, 16, pats, grid)
    val rnd = new scala.util.Random(43)
    (0 until 200).foreach { _ =>
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
    (0 to stream.length by 5).foreach { cut =>
      try Jbig2.decodeEmbedded(stream.take(cut))
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("corrupt refagg/refined streams fail soft: no crash, no OOM") {
    val base = glyphs(31).take(3)
    val v = mkBitmap(6, 6)((x, y) => base(0).get(x, y) == 1 ^ (x == 2))
    val insts = Seq(Jbig2.TextInstance(3, 0, 0),
      Jbig2.TextInstance(1, 8, 0, refined = Some(v)))
    val (stream, globals) = Jbig2.writeEmbeddedText(20, 12, base, insts,
      splitGlobals = true, refined = Seq((0, v)))
    val rnd = new scala.util.Random(37)
    (0 until 150).foreach { _ =>
      val mutG = globals.clone()
      val at = rnd.nextInt(mutG.length)
      mutG(at) = (mutG(at) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val (page, _) = Jbig2.decodeEmbedded(stream, mutG)
        assert(page.width.toLong * page.height <= (1L << 26))
      } catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
          _: UnsupportedOperationException => ()
      }
    }
    (0 until 150).foreach { _ =>
      val mut = stream.clone()
      val at = rnd.nextInt(mut.length)
      mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val (page, _) = Jbig2.decodeEmbedded(mut, globals)
        assert(page.width.toLong * page.height <= (1L << 26))
      } catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
          _: UnsupportedOperationException => ()
      }
    }
  }

  test("MMR generic region routes through the T.6 decoder") {
    val bm = mkBitmap(37, 22)((x, y) => (x / 3 + y / 2) % 3 == 0)
    val stream = Jbig2.writeEmbedded(bm, mmr = true)
    val (page, notes) = Jbig2.decodeEmbedded(stream)
    assert(notes.isEmpty, notes.mkString(","))
    assert(page.data.sameElements(bm.data))
  }

  test("dictionaries chaining via referred segments export through") {
    // dict A exports 2 symbols; a text region referring to A draws both
    val syms = glyphs(7).take(2)
    val insts = Seq(Jbig2.TextInstance(0, 0, 0), Jbig2.TextInstance(1, 9, 3))
    val (data, _) = Jbig2.writeEmbeddedText(20, 12, syms, insts)
    val segs = Jbig2.segments(data)
    assert(segs.map(_.segType) == Seq(48, 0, 6))
    assert(segs(2).refs == Seq(1L))
  }

  test("corrupt symbol/text streams fail soft: no crash, no OOM") {
    val syms = glyphs(11)
    val insts = Seq(Jbig2.TextInstance(0, 1, 1), Jbig2.TextInstance(3, 9, 1),
      Jbig2.TextInstance(2, 4, 12))
    val (stream, _) = Jbig2.writeEmbeddedText(30, 24, syms, insts)
    val rnd = new scala.util.Random(23)
    (0 until 200).foreach { _ =>
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
    (0 to stream.length by 5).foreach { cut =>
      try Jbig2.decodeEmbedded(stream.take(cut))
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("hostile canvas: two in-bound regions cannot compose an overflow") {
    // one wide region at y=0 and one tall region at x=0, each passing
    // the per-region (x+w)*(y+h) bound, union to w*h >> 2^26 — the
    // composed-canvas bound must fall back, not overflow Bitmap.empty
    val wide = Jbig2.writeEmbedded(mkBitmap(8, 8)((x, y) => x == y))
    def patch(stream: Array[Byte], x: Long, y: Long): Array[Byte] = {
      // region segment starts after page info (11 + 19 bytes header+data)
      val m = stream.clone()
      val base = 11 + 19 + 11 // second segment's data: w,h,x,y
      def put32(at: Int, v: Long): Unit = {
        m(at) = ((v >> 24) & 0xff).toByte; m(at + 1) = ((v >> 16) & 0xff).toByte
        m(at + 2) = ((v >> 8) & 0xff).toByte; m(at + 3) = (v & 0xff).toByte
      }
      put32(base + 8, x); put32(base + 12, y)
      m
    }
    val a = patch(wide, 8000000L, 0L) // x huge: (x+w)*(y+h) ~ 2^26 ok
    val b = patch(wide, 0L, 8000000L)
    val combined = a ++ Jbig2.segments(b).filter(_.segType == 39).map(s =>
      b.slice(s.dataFrom - 11, s.dataUntil)).head // re-append region seg
    val (page, notes) = Jbig2.decodeEmbedded(combined)
    assert(page.width.toLong * page.height <= (1L << 26),
      s"${page.width}x${page.height} notes=${notes.mkString(",")}")
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
