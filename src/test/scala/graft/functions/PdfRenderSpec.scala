package graft.functions

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** PDF page rasterization (the reference's `page.render().to_pil()`
  * surface): every assertion is a CLOSED-FORM pixel count or sample on a
  * fixture whose geometry is pixel-aligned — antialiasing has no freedom
  * on integer-boundary rectangles, so counts are exact.
  */
class PdfRenderSpec extends AnyFunSuite {

  private def pdf(build: Pdf.PdfBuilder => Unit): Array[Byte] = {
    val b = new Pdf.PdfBuilder
    build(b)
    b.build()
  }

  private def render(bytes: Array[Byte], page: Int = 0,
      scale: Double = 1.0): BufferedImage = {
    val pages = PdfRender.renderPageImages(bytes, scale)
    javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pages(page).png))
  }

  private def count(im: BufferedImage, rgb: Int): Int = {
    var n = 0
    var y = 0
    while (y < im.getHeight) {
      var x = 0
      while (x < im.getWidth) {
        if ((im.getRGB(x, y) & 0xffffff) == rgb) n += 1
        x += 1
      }
      y += 1
    }
    n
  }

  private def px(im: BufferedImage, x: Int, y: Int): Int =
    im.getRGB(x, y) & 0xffffff

  private val Red = 0xff0000
  private val Green = 0x00ff00
  private val Blue = 0x0000ff
  private val Black = 0x000000
  private val White = 0xffffff

  // ---------------- paths, fills, transforms ----------------

  test("rectangle fill is pixel-exact: geometry, color, count") {
    val im = render(pdf(_.addPage("1 0 0 rg 10 20 30 40 re f", (200, 100))))
    assert(im.getWidth == 200 && im.getHeight == 100)
    // user rect [10,40]x[20,60] → device rows 40..79, cols 10..39
    assert(count(im, Red) == 1200)
    assert(px(im, 10, 40) == Red && px(im, 39, 79) == Red)
    assert(px(im, 9, 50) == White && px(im, 40, 50) == White)
    assert(px(im, 20, 39) == White && px(im, 20, 80) == White)
  }

  test("nonzero winding fills nested same-direction rects solid") {
    val im = render(pdf(_.addPage(
      "0 g 10 10 40 40 re 20 20 20 20 re f", (100, 100))))
    assert(count(im, Black) == 1600)
  }

  test("even-odd winding leaves the nested rect as a hole") {
    val im = render(pdf(_.addPage(
      "0 g 10 10 40 40 re 20 20 20 20 re f*", (100, 100))))
    assert(count(im, Black) == 1200)
    assert(px(im, 30, 70) == White) // inside the hole (user (30,30))
  }

  test("cm concatenates onto the CTM") {
    val im = render(pdf(_.addPage(
      "q 2 0 0 2 0 0 cm 1 0 0 rg 10 10 20 10 re f Q", (200, 100))))
    assert(count(im, Red) == 800) // 40 x 20 device pixels
    assert(px(im, 21, 65) == Red && px(im, 59, 79) == Red)
  }

  test("q/Q restores color and CTM") {
    val im = render(pdf(_.addPage(
      "1 0 0 rg q 0 1 0 rg 2 0 0 2 0 0 cm Q 10 10 10 10 re f",
      (100, 100))))
    assert(count(im, Red) == 100)
    assert(count(im, Green) == 0)
  }

  test("W n intersects the clip path") {
    val im = render(pdf(_.addPage(
      "10 10 30 30 re W n 0 0 1 rg 0 0 200 100 re f", (200, 100))))
    assert(count(im, Blue) == 900)
    assert(px(im, 20, 70) == Blue && px(im, 50, 70) == White)
  }

  test("clip survives inside q/Q and is restored by Q") {
    val im = render(pdf(_.addPage(
      "q 10 10 10 10 re W n 0 0 1 rg 0 0 100 100 re f Q " +
        "1 0 0 rg 50 50 10 10 re f", (100, 100))))
    assert(count(im, Blue) == 100) // clipped fill
    assert(count(im, Red) == 100) // unclipped after Q
  }

  test("stroke: butt-capped horizontal line, width in user space") {
    val im = render(pdf(_.addPage(
      "4 w 0 0 1 RG 20 50 m 120 50 l S", (200, 100))))
    assert(count(im, Blue) == 400) // 100 long x 4 wide
    assert(px(im, 60, 48) == Blue && px(im, 60, 51) == Blue)
    assert(px(im, 60, 47) == White && px(im, 60, 52) == White)
  }

  test("stroke width scales with the CTM") {
    val im = render(pdf(_.addPage(
      "q 2 0 0 2 0 0 cm 4 w 0 0 1 RG 10 25 m 60 25 l S Q", (200, 100))))
    assert(count(im, Blue) == 800) // 100 long x 8 wide in device space
  }

  test("cmyk fill converts per (1-c)(1-k)") {
    val im = render(pdf(_.addPage("0 1 1 0 k 10 10 10 10 re f", (100, 100))))
    assert(count(im, Red) == 100)
  }

  test("bezier curve fill covers the expected interior samples") {
    val im = render(pdf(_.addPage(
      "0 g 20 20 m 80 20 l 80 20 80 80 50 80 c 20 80 20 20 20 20 c h f",
      (100, 100))))
    assert(px(im, 50, 50) == Black) // deep interior
    assert(px(im, 5, 5) == White && px(im, 95, 95) == White)
  }

  // ---------------- scale / page geometry ----------------

  test("scale=2 doubles the raster and quadruples areas") {
    val im = render(pdf(_.addPage("0 g 10 20 30 40 re f", (200, 100))),
      scale = 2.0)
    assert(im.getWidth == 400 && im.getHeight == 200)
    assert(count(im, Black) == 4800)
  }

  test("MediaBox origin offsets translate content") {
    // box [20,30 .. 220,130]: a rect at user (20,30) lands at device (0, bottom)
    val im = render(pdf(_.addPageBox("0 g 20 30 10 10 re f",
      (20, 30, 220, 130))))
    assert(im.getWidth == 200 && im.getHeight == 100)
    assert(count(im, Black) == 100)
    assert(px(im, 0, 99) == Black && px(im, 9, 90) == Black)
  }

  test("/Rotate 90 swaps raster dimensions and turns content") {
    val im = render(pdf(_.addPageBox("0 g 0 0 30 10 re f",
      (0, 0, 200, 100), extraEntries = " /Rotate 90")))
    assert(im.getWidth == 100 && im.getHeight == 200)
    // the 30x10 rect at the user origin must render as a 10x30 device rect
    assert(count(im, Black) == 300)
  }

  test("multi-page documents render per-page sizes") {
    val pages = PdfRender.renderPageImages(pdf { b =>
      b.addPage("0 g 0 0 10 10 re f", (100, 50))
      b.addPage("0 g 0 0 20 10 re f", (300, 200))
    })
    assert(pages.map(p => (p.page, p.width, p.height)) ==
      Seq((1, 100, 50), (2, 300, 200)))
  }

  // ---------------- images ----------------

  test("image XObject: unit-square placement, nearest-neighbor samples") {
    val im = render(pdf { b =>
      val img = b.addStream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 1 " +
          "/ColorSpace /DeviceRGB /BitsPerComponent 8",
        Array(0xff, 0, 0, 0, 0xff, 0).map(_.toByte))
      b.addPage("q 40 0 0 20 30 60 cm /ImX Do Q", (200, 100),
        s"/XObject << /ImX $img 0 R >>")
    })
    // user rect [30,70]x[60,80] → device y 20..39; left half red
    assert(px(im, 35, 30) == Red && px(im, 45, 30) == Red)
    assert(px(im, 55, 30) == Green && px(im, 65, 30) == Green)
    assert(px(im, 29, 30) == White && px(im, 71, 30) == White)
    assert(count(im, Red) == 400 && count(im, Green) == 400)
  }

  test("image XObject: FlateDecode samples decode identically") {
    val raw = Array(0xff, 0, 0, 0, 0xff, 0).map(_.toByte)
    val z = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](64)
      val n = d.deflate(buf)
      java.util.Arrays.copyOf(buf, n)
    }
    val im = render(pdf { b =>
      val img = b.addStream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 1 " +
          "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
        z)
      b.addPage("q 20 0 0 20 0 0 cm /I Do Q", (100, 100),
        s"/XObject << /I $img 0 R >>")
    })
    assert(count(im, Red) == 200 && count(im, Green) == 200)
  }

  test("ImageMask stencils the fill color through set bits") {
    // 2x2, 1bpc, rows 0x80 0x40: sample==0 paints (spec default Decode)
    val im = render(pdf { b =>
      val msk = b.addStream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 2 " +
          "/ImageMask true /BitsPerComponent 1",
        Array(0x80, 0x40).map(_.toByte))
      b.addPage("1 0 0 rg q 20 0 0 20 50 40 cm /M Do Q", (200, 100),
        s"/XObject << /M $msk 0 R >>")
    })
    assert(count(im, Red) == 200)
    // top row of image = user upper half: painted where bit==0 → (1,0)
    assert(px(im, 65, 45) == Red && px(im, 55, 45) == White)
    assert(px(im, 55, 55) == Red && px(im, 65, 55) == White)
  }

  test("ImageMask /Decode [1 0] inverts the stencil") {
    val im = render(pdf { b =>
      val msk = b.addStream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 2 " +
          "/ImageMask true /BitsPerComponent 1 /Decode [1 0]",
        Array(0x80, 0x40).map(_.toByte))
      b.addPage("1 0 0 rg q 20 0 0 20 50 40 cm /M Do Q", (200, 100),
        s"/XObject << /M $msk 0 R >>")
    })
    assert(count(im, Red) == 200)
    assert(px(im, 55, 45) == Red && px(im, 65, 45) == White)
  }

  test("inline image (BI/ID/EI) with abbreviated keys") {
    val im = render(pdf(_.addPage(
      "q 20 0 0 20 10 10 cm BI /W 1 /H 1 /CS /G /BPC 8 ID " +
        "\u0000 EI Q", (100, 100))))
    assert(count(im, Black) == 400)
    assert(px(im, 15, 75) == Black)
  }

  test("inline image honors explicit /L payload length") {
    val im = render(pdf(_.addPage(
      "q 10 0 0 10 0 0 cm BI /W 2 /H 1 /CS /RGB /BPC 8 /L 6 ID " +
        "\u00ff\u0000\u0000\u0000\u00ff\u0000 EI Q 0 g 50 50 5 5 re f",
      (100, 100))))
    assert(count(im, Red) == 50 && count(im, Green) == 50)
    assert(count(im, Black) == 25) // the op after EI still executed
  }

  test("indexed color space images map palette entries") {
    val im = render(pdf { b =>
      // palette: 0→red 1→blue, 1bpc 2x1: bits 10 → left red, right blue
      val img = b.addStream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 1 " +
          "/ColorSpace [/Indexed /DeviceRGB 1 <ff00000000ff>] " +
          "/BitsPerComponent 1",
        Array(0x40).map(_.toByte)) // bit7=0 → red, bit6=1 → blue
      b.addPage("q 20 0 0 10 0 0 cm /I Do Q", (100, 100),
        s"/XObject << /I $img 0 R >>")
    })
    assert(count(im, Red) == 100 && count(im, Blue) == 100)
  }

  test("SMask drives per-pixel alpha over the page background") {
    val im = render(pdf { b =>
      val sm = b.addStream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 1 " +
          "/ColorSpace /DeviceGray /BitsPerComponent 8",
        Array(0xff, 0x00).map(_.toByte)) // left opaque, right transparent
      val img = b.addStream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 1 " +
          "/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
          s"/SMask $sm 0 R",
        Array(0xff, 0, 0, 0xff, 0, 0).map(_.toByte))
      b.addPage("q 40 0 0 20 0 0 cm /I Do Q", (100, 100),
        s"/XObject << /I $img 0 R >>")
    })
    assert(count(im, Red) == 400) // left half painted
    assert(px(im, 30, 90) == White) // right half fully transparent
  }

  // ---------------- form XObjects ----------------

  test("form XObject applies /Matrix and restores state") {
    val im = render(pdf { b =>
      val form = b.addStream(
        "/Type /XObject /Subtype /Form /BBox [0 0 10 10] " +
          "/Matrix [1 0 0 1 100 50]",
        "0 g 0 0 10 10 re f".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      b.addPage("1 0 0 rg q /F Do Q 0 0 5 5 re f", (200, 100),
        s"/XObject << /F $form 0 R >>")
    })
    assert(count(im, Black) == 100) // at user (100..110, 50..60)
    assert(px(im, 105, 45) == Black)
    assert(count(im, Red) == 25) // fill color restored after Do
  }

  test("form XObject /BBox clips its own content") {
    val im = render(pdf { b =>
      val form = b.addStream(
        "/Type /XObject /Subtype /Form /BBox [0 0 10 10]",
        "0 g 0 0 30 30 re f".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      b.addPage("/F Do", (100, 100), s"/XObject << /F $form 0 R >>")
    })
    assert(count(im, Black) == 100)
  }

  // ---------------- Type3 text (the exact tier) ----------------

  private def type3Page(b: Pdf.PdfBuilder, content: String,
      mediaBox: (Double, Double) = (200, 100),
      widths: String = "[1200]"): Unit = {
    val proc = b.addStream("",
      "1200 0 d0 0 0 1000 1000 re f"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val font = b.addObj(
      "<< /Type /Font /Subtype /Type3 /FontMatrix [0.001 0 0 0.001 0 0] " +
        s"/CharProcs << /box $proc 0 R >> " +
        "/Encoding << /Type /Encoding /Differences [65 /box] >> " +
        s"/FirstChar 65 /LastChar 65 /Widths $widths >>")
    b.addPage(content, mediaBox, s"/Font << /T3 $font 0 R >>")
  }

  test("Type3 glyphs render exactly: position, size, advance") {
    val im = render(pdf(b => type3Page(b,
      "BT /T3 10 Tf 20 30 Td (AAA) Tj ET")))
    // three 10x10 boxes at x=20,32,44 (advance 12), baseline y=30
    assert(count(im, Black) == 300)
    assert(px(im, 25, 65) == Black && px(im, 37, 65) == Black &&
      px(im, 49, 65) == Black)
    assert(px(im, 31, 65) == White) // 2pt gap between boxes
    assert(px(im, 25, 71) == White && px(im, 25, 59) == White)
  }

  test("TJ adjustments shift the pen by -adj/1000*size") {
    val im = render(pdf(b => type3Page(b,
      "BT /T3 10 Tf 0 50 Td [(A) -500 (A)] TJ ET")))
    assert(count(im, Black) == 200)
    // second box starts at 12 + 5 = 17
    assert(px(im, 5, 45) == Black && px(im, 16, 45) == White &&
      px(im, 18, 45) == Black)
  }

  test("Tm applies a full text matrix (scale 2)") {
    val im = render(pdf(b => type3Page(b,
      "BT /T3 10 Tf 2 0 0 2 10 20 Tm (A) Tj ET")))
    assert(count(im, Black) == 400) // 20x20 box, user (10..30, 20..40)
    assert(px(im, 15, 65) == Black && px(im, 29, 61) == Black)
    assert(px(im, 15, 81) == White && px(im, 31, 70) == White)
  }

  test("T* advances by the leading; Tc adds char spacing") {
    val im = render(pdf(b => type3Page(b,
      "BT /T3 10 Tf 14 TL 3 Tc 10 60 Td (AA) Tj T* (A) Tj ET")))
    // line 1: boxes at x=10 and x=25 (advance 12+3); line 2 at y=46
    assert(count(im, Black) == 300)
    assert(px(im, 15, 35) == Black && px(im, 30, 35) == Black)
    assert(px(im, 15, 49) == Black) // second line, 14pt lower
  }

  test("Tr 3 (invisible, the OCR-layer mode) suppresses painting") {
    val im = render(pdf(b => type3Page(b,
      "BT /T3 10 Tf 3 Tr 20 30 Td (AAA) Tj ET")))
    assert(count(im, Black) == 0)
  }

  test("Type3 glyph procs inherit the current fill color") {
    val im = render(pdf(b => type3Page(b,
      "0 0 1 rg BT /T3 10 Tf 20 30 Td (A) Tj ET")))
    assert(count(im, Blue) == 100)
  }

  // ---------------- ExtGState / alpha ----------------

  test("gs /ca blends the fill against the white page") {
    val im = render(pdf { b =>
      val gs = b.addObj("<< /Type /ExtGState /ca 0.5 >>")
      b.addPage("/G1 gs 1 0 0 rg 10 10 10 10 re f", (100, 100),
        s"/ExtGState << /G1 $gs 0 R >>")
    })
    val c = px(im, 15, 85)
    val (r, g2, b2) = ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)
    assert(r == 255 && math.abs(g2 - 127) <= 1 && math.abs(b2 - 127) <= 1)
  }

  // ---------------- end-to-end with the existing writer ----------------

  test("writePdf text pages render with substituted fonts") {
    val bytes = Pdf.writePdf(Seq("Hello graft renderer"))
    val pages = PdfRender.renderPageImages(bytes)
    assert(pages.head.width == 612 && pages.head.height == 792)
    assert(pages.head.unsupported.contains("font-substituted"))
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pages.head.png))
    // text band: baseline at user y=720, 12pt → device rows ~60..72
    var ink = 0
    for (y <- 56 to 76; x <- 72 to 300)
      if ((im.getRGB(x, y) & 0xffffff) != White) ink += 1
    assert(ink > 50, s"expected glyph ink in the text band, got $ink")
  }

  test("writePdfWithImages embedded figure renders at its cm placement") {
    val bytes = Pdf.writePdfWithImages(Seq("page one"),
      Map(0 -> Images.solidPng(8, 6, 0x123456)))
    val im = render(bytes)
    // content: q 8 0 0 6 72 394 cm → device y = 792-400..792-394
    assert(px(im, 75, 395) == 0x123456)
    assert(count(im, 0x123456) == 48)
  }

  // ---------------- robustness ----------------

  test("garbage bytes fail fast as IllegalArgumentException") {
    intercept[IllegalArgumentException] {
      PdfRender.renderPageImages("not a pdf at all".getBytes)
    }
  }

  test("oversized page rasters are refused with byte justification") {
    val e = intercept[IllegalArgumentException] {
      PdfRender.renderPageImages(
        pdf(_.addPage("", (20000, 20000))), scale = 1.0)
    }
    assert(e.getMessage.contains("too large"))
  }

  test("unsupported constructs are named, not silent") {
    val pages = PdfRender.renderPageImages(
      pdf(_.addPage("/Sh1 sh 0 g 0 0 5 5 re f", (100, 100))))
    assert(pages.head.unsupported.contains("shading-skipped"))
    // and the rest of the page still rendered
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pages.head.png))
    assert(count(im, Black) == 25)
  }

  test("renderPagesSafe captures per-document errors (Spark surface)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(
      ("ok", pdf(_.addPage("0 g 0 0 5 5 re f", (50, 50)))),
      ("bad", "junk".getBytes)).toDF("id", "pdf")
    val out = df.select($"id",
      PdfRender.renderPagesSafe($"pdf").as("r")).collect()
    val okRow = out.find(_.getString(0) == "ok").get.getStruct(1)
    val badRow = out.find(_.getString(0) == "bad").get.getStruct(1)
    assert(okRow.getSeq[org.apache.spark.sql.Row](0).length == 1)
    assert(okRow.isNullAt(1))
    assert(badRow.isNullAt(0) && badRow.getString(1).nonEmpty)
  }

  // ---------------- CFF / FontFile3 text (the exact tier) ----------------

  private def cffBytes(): Array[Byte] =
    Cff.write(Seq("A" -> Cff.charstring(Seq(0, 0, "rmoveto",
      100, "hlineto", 50, "vlineto", -100, "hlineto", "endchar"))),
      Seq(65))

  test("embedded CFF (Type1C): glyphs interpret to exact pixel rects") {
    val im = render(pdf { b =>
      val ff = b.addStream("/Subtype /Type1C", cffBytes())
      val fd = b.addObj(
        s"<< /Type /FontDescriptor /FontName /Fx /Flags 4 /FontFile3 $ff 0 R >>")
      val font = b.addObj(
        "<< /Type /Font /Subtype /Type1 /BaseFont /Fx " +
          "/Encoding << /Differences [65 /A] >> " +
          s"/FirstChar 65 /LastChar 65 /Widths [1000] /FontDescriptor $fd 0 R >>")
      b.addPage("BT /F1 100 Tf 20 30 Td (AA) Tj ET", (300, 100),
        s"/Font << /F1 $font 0 R >>")
    })
    // glyph rect 100x50 units x FontMatrix 0.001 x Tf 100 = 10x5 pt;
    // advance 1000/1000*100 = 100 pt -> rects at x 20..30 and 120..130
    assert(count(im, Black) == 100)
    assert(px(im, 25, 67) == Black && px(im, 125, 67) == Black)
    assert(px(im, 25, 71) == White && px(im, 31, 67) == White)
    assert(px(im, 119, 67) == White && px(im, 130, 67) == White)
  }

  test("embedded CFF falls back to the built-in encoding without Differences") {
    val im = render(pdf { b =>
      val ff = b.addStream("/Subtype /Type1C", cffBytes())
      val fd = b.addObj(
        s"<< /Type /FontDescriptor /FontName /Fx /FontFile3 $ff 0 R >>")
      val font = b.addObj(
        "<< /Type /Font /Subtype /Type1 /BaseFont /Fx " +
          s"/FirstChar 65 /LastChar 65 /Widths [1000] /FontDescriptor $fd 0 R >>")
      b.addPage("BT /F1 100 Tf 20 30 Td (A) Tj ET", (200, 100),
        s"/Font << /F1 $font 0 R >>")
    })
    assert(count(im, Black) == 50)
    assert(px(im, 25, 67) == Black)
  }

  test("Type0/Identity-H over CFF: 2-byte codes address glyph ids") {
    val im = render(pdf { b =>
      val ff = b.addStream("/Subtype /CIDFontType0C", cffBytes())
      val fd = b.addObj(
        s"<< /Type /FontDescriptor /FontName /Fx /FontFile3 $ff 0 R >>")
      val cidFont = b.addObj(
        "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Fx " +
          "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) " +
          s"/Supplement 0 >> /DW 1000 /W [1 [1000]] /FontDescriptor $fd 0 R >>")
      val font = b.addObj(
        "<< /Type /Font /Subtype /Type0 /BaseFont /Fx " +
          s"/Encoding /Identity-H /DescendantFonts [$cidFont 0 R] >>")
      b.addPage("BT /F1 100 Tf 20 30 Td <0001> Tj ET", (200, 100),
        s"/Font << /F1 $font 0 R >>")
    })
    assert(count(im, Black) == 50)
    assert(px(im, 25, 67) == Black && px(im, 19, 67) == White)
  }

  test("corrupt FontFile3 degrades to substitution, never fails the page") {
    val bad = cffBytes().take(20)
    val pages = PdfRender.renderPageImages(pdf { b =>
      val ff = b.addStream("/Subtype /Type1C", bad)
      val fd = b.addObj(
        s"<< /Type /FontDescriptor /FontName /Fx /FontFile3 $ff 0 R >>")
      val font = b.addObj(
        "<< /Type /Font /Subtype /Type1 /BaseFont /Fx " +
          s"/FirstChar 65 /LastChar 65 /Widths [1000] /FontDescriptor $fd 0 R >>")
      b.addPage("BT /F1 100 Tf 20 30 Td (A) Tj ET", (200, 100),
        s"/Font << /F1 $font 0 R >>")
    })
    assert(pages.length == 1)
    assert(pages.head.unsupported.contains("cff-load-failed"))
  }

  // ---------------- patterns & shading ----------------

  test("tiling pattern: cell content tiles with exact per-tile counts") {
    val im = render(pdf { b =>
      val pat = b.addStream(
        "/PatternType 1 /PaintType 1 /TilingType 1 /BBox [0 0 10 10] " +
          "/XStep 10 /YStep 10 /Resources << >>",
        "0 g 0 0 4 4 re f"
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      b.addPage("/Pattern cs /P1 scn 0 0 40 20 re f", (40, 20),
        s"/Pattern << /P1 $pat 0 R >>")
    })
    // 4x2 tiles, 16 black px each, anywhere the fill rect covers
    assert(count(im, Black) == 128)
    // pattern space anchors at page origin (bottom-left): the cell rect
    // [0,4)x[0,4) sits at the BOTTOM of each 10x10 tile
    assert(px(im, 1, 17) == Black && px(im, 11, 17) == Black)
    assert(px(im, 1, 7) == Black) // tile row above
    assert(px(im, 5, 17) == White && px(im, 1, 12) == White)
  }

  test("uncolored tiling pattern (PaintType 2) stencils the scn color") {
    val im = render(pdf { b =>
      val pat = b.addStream(
        "/PatternType 1 /PaintType 2 /TilingType 1 /BBox [0 0 10 10] " +
          "/XStep 10 /YStep 10 /Resources << >>",
        "0 0 4 4 re f"
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      b.addPage("/Pattern cs 0 1 0 /P1 scn 0 0 40 20 re f", (40, 20),
        s"/Pattern << /P1 $pat 0 R >>")
    })
    assert(count(im, Green) == 128)
    assert(count(im, Black) == 0)
  }

  test("sh: constant axial shading floods the clip exactly") {
    val im = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 40 0] " +
          "/Function << /FunctionType 2 /C0 [1 0 0] /C1 [1 0 0] /N 1 >> " +
          "/Extend [true true] >>")
      b.addPage("q 5 5 20 10 re W n /S1 sh Q", (40, 20),
        s"/Shading << /S1 $shd 0 R >>")
    })
    // constant function => exact flood of the 20x10 clip
    assert(count(im, Red) == 200)
    assert(px(im, 5, 14) == Red && px(im, 24, 5) == Red)
    assert(px(im, 4, 10) == White && px(im, 25, 10) == White)
  }

  test("axial gradient: endpoint colors at the axis ends") {
    val im = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 80 0] " +
          "/Function << /FunctionType 2 /C0 [1 0 0] /C1 [0 0 1] /N 1 >> " +
          "/Extend [true true] >>")
      b.addPage("/S1 sh", (80, 10), s"/Shading << /S1 $shd 0 R >>")
    })
    val left = im.getRGB(0, 5)
    val right = im.getRGB(79, 5)
    assert(((left >> 16) & 0xff) > 240 && (left & 0xff) < 15)
    assert(((right >> 16) & 0xff) < 15 && (right & 0xff) > 240)
    // midpoint is an even blend (within rounding)
    val mid = im.getRGB(40, 5)
    assert(math.abs(((mid >> 16) & 0xff) - (mid & 0xff)) <= 8)
  }

  test("sh honors the current CTM (cm before sh repositions the axis)") {
    // ISO 32000-1 §8.7.4.2: sh coordinates live in CURRENT user space.
    // Translate user space by +40 before sh: the red→blue axis
    // [0 0 20 0] must land at device x=40..60, not 0..20.
    val im = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 20 0] " +
          "/Function << /FunctionType 2 /C0 [1 0 0] /C1 [0 0 1] /N 1 >> " +
          "/Extend [true true] >>")
      b.addPage("q 1 0 0 1 40 0 cm /S1 sh Q", (80, 10),
        s"/Shading << /S1 $shd 0 R >>")
    })
    val left = im.getRGB(10, 5)   // well before the translated axis
    val right = im.getRGB(75, 5)  // well past it
    val mid = im.getRGB(50, 5)    // translated midpoint
    assert(((left >> 16) & 0xff) > 240 && (left & 0xff) < 15, "left red")
    assert(((right >> 16) & 0xff) < 15 && (right & 0xff) > 240, "right blue")
    // the exact paint samples pixel CENTERS (x=50 → s=0.525), where
    // AWT's LinearGradientPaint used to land nearer 0.5
    assert(math.abs(((mid >> 16) & 0xff) - (mid & 0xff)) <= 16, "mid blend")
  }

  test("radial shading with r0 > 0: exact annulus blend and extends") {
    // concentric circles r0=5, r1=15 at (20,20): s = (d-5)/10 exactly
    val im = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 3 /ColorSpace /DeviceRGB " +
          "/Coords [20 20 5 20 20 15] " +
          "/Function << /FunctionType 2 /C0 [1 0 0] /C1 [0 0 1] /N 1 >> " +
          "/Extend [true true] >>")
      b.addPage("/S1 sh", (40, 40), s"/Shading << /S1 $shd 0 R >>")
    })
    // PDF y-up: device row for user y=20 on a 40-high page is 19-20;
    // sample along the horizontal through the center
    def at(dx: Int) = im.getRGB(20 + dx, 19)
    assert(((at(0) >> 16) & 0xff) > 230, "center extends inner red")
    assert(((at(4) >> 16) & 0xff) > 230, "inside r0 still red")
    val mid = at(10) // d=10 → s=0.5
    // pixel centers sit at half-integer offsets from the circle
    // center, so s at the sampled pixel is 0.551, not 0.5 exactly
    assert(math.abs(((mid >> 16) & 0xff) - (mid & 0xff)) <= 32,
      s"midpoint blend ${mid.toHexString}")
    assert((at(16) & 0xff) > 230, "outside r1 extends blue")
    // without /Extend the outside stays unpainted (white page)
    val im2 = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 3 /ColorSpace /DeviceRGB " +
          "/Coords [20 20 5 20 20 15] " +
          "/Function << /FunctionType 2 /C0 [1 0 0] /C1 [0 0 1] /N 1 >> >>")
      b.addPage("/S1 sh", (40, 40), s"/Shading << /S1 $shd 0 R >>")
    })
    assert(px(im2, 38, 19) == White, "no extend: outside transparent")
    // d=13.5 → s=0.85: blue-dominant inside the annulus
    assert(((im2.getRGB(33, 19) >> 16) & 0xff) < 60, "annulus painted")
  }

  // mesh stream packing: bpc=16 with Decode [0 65535 ...] keeps
  // coordinates integer-exact; bpcomp=8 with Decode [0 1] per channel
  // round-trips any 0-255 color byte exactly
  private def meshDict(shType: Int, extra: String = ""): String =
    s"/ShadingType $shType /ColorSpace /DeviceRGB " +
      "/BitsPerCoordinate 16 /BitsPerComponent 8 /BitsPerFlag 8 " +
      "/Decode [0 65535 0 65535 0 1 0 1 0 1] " + extra

  private def vtx(w: PdfRender.MeshBitWriter, flag: Int, x: Int, y: Int,
      rgb: Int): Unit = {
    if (flag >= 0) w.bits(flag.toLong, 8)
    w.bits(x.toLong, 16); w.bits(y.toLong, 16)
    w.bits(((rgb >> 16) & 0xff).toLong, 8)
    w.bits(((rgb >> 8) & 0xff).toLong, 8)
    w.bits((rgb & 0xff).toLong, 8)
    w.align()
  }

  test("type 4 free-form mesh: flag-1 strip covers the rect exactly") {
    val w = new PdfRender.MeshBitWriter
    // triangle (0,0)(40,0)(0,20) then strip continuation to (40,20)
    vtx(w, 0, 0, 0, Red); vtx(w, 0, 40, 0, Red); vtx(w, 0, 0, 20, Red)
    vtx(w, 1, 40, 20, Red)
    val im = render(pdf { b =>
      val shd = b.addStream(meshDict(4), w.bytes)
      b.addPage("/S1 sh", (40, 20), s"/Shading << /S1 $shd 0 R >>")
    })
    assert(count(im, Red) == 800, s"red=${count(im, Red)}")
  }

  test("type 4 Gouraud interpolation matches barycentric closed form") {
    val w = new PdfRender.MeshBitWriter
    vtx(w, 0, 0, 0, Red); vtx(w, 0, 40, 0, Green); vtx(w, 0, 0, 20, Blue)
    val im = render(pdf { b =>
      val shd = b.addStream(meshDict(4), w.bytes)
      b.addPage("/S1 sh", (40, 20), s"/Shading << /S1 $shd 0 R >>")
    })
    // device pixel (x, y) center -> user (x+0.5, 19.5-y); barycentric
    // on (0,0)R (40,0)G (0,20)B: l2 = ux/40, l3 = uy/20
    for ((x, y) <- Seq((10, 5), (4, 16), (20, 12))) {
      val ux = x + 0.5; val uy = 19.5 - y
      val l2 = ux / 40; val l3 = uy / 20; val l1 = 1 - l2 - l3
      if (l1 >= 0) {
        val want = ((l1 * 255).round.toInt << 16) |
          ((l2 * 255).round.toInt << 8) | (l3 * 255).round.toInt
        assert(px(im, x, y) == want,
          f"($x,$y) got ${px(im, x, y)}%06x want $want%06x")
      }
    }
  }

  test("type 5 lattice mesh covers the rect exactly") {
    val w = new PdfRender.MeshBitWriter
    // 2 rows x 3 vertices spanning [0,40]x[0,20], flat green
    for (y <- Seq(0, 20); x <- Seq(0, 20, 40)) vtx(w, -1, x, y, Green)
    val im = render(pdf { b =>
      val shd = b.addStream(meshDict(5, "/VerticesPerRow 3 "), w.bytes)
      b.addPage("/S1 sh", (40, 20), s"/Shading << /S1 $shd 0 R >>")
    })
    assert(count(im, Green) == 800, s"green=${count(im, Green)}")
  }

  private def coonsPatch(w: PdfRender.MeshBitWriter, flag: Int,
      pts: Seq[(Int, Int)], cols: Seq[Int]): Unit = {
    w.bits(flag.toLong, 8)
    pts.foreach { case (x, y) =>
      w.bits(x.toLong, 16); w.bits(y.toLong, 16)
    }
    cols.foreach { rgb =>
      w.bits(((rgb >> 16) & 0xff).toLong, 8)
      w.bits(((rgb >> 8) & 0xff).toLong, 8)
      w.bits((rgb & 0xff).toLong, 8)
    }
    w.align()
  }

  test("type 6 Coons patch: affine square, bilinear corner colors") {
    // straight-edge square [0,30]^2 (control points at thirds) with
    // c3 = c2 + c4 - c1 so the bilinear color field is LINEAR and any
    // triangulation of the affine patch reproduces it exactly
    val w = new PdfRender.MeshBitWriter
    coonsPatch(w, 0, Seq((0, 0), (0, 10), (0, 20), (0, 30), (10, 30),
      (20, 30), (30, 30), (30, 20), (30, 10), (30, 0), (20, 0), (10, 0)),
      Seq(Black, Green, 0xffff00, Red)) // c1..c4; c3 = c2 + c4
    val im = render(pdf { b =>
      val shd = b.addStream(meshDict(6), w.bytes)
      b.addPage("/S1 sh", (30, 30), s"/Shading << /S1 $shd 0 R >>")
    })
    assert(count(im, White) == 0, s"white=${count(im, White)}")
    // color field: r = 255u, g = 255v with u = ux/30, v = uy/30
    for ((x, y) <- Seq((3, 3), (15, 20), (27, 6))) {
      val u = (x + 0.5) / 30; val v = (29.5 - y) / 30
      val got = px(im, x, y)
      def ch(sh: Int) = (got >> sh) & 0xff
      assert(math.abs(ch(16) - (255 * u).round.toInt) <= 2 &&
        math.abs(ch(8) - (255 * v).round.toInt) <= 2 && ch(0) == 0,
        f"($x,$y) got $got%06x u=$u v=$v")
    }
  }

  test("type 6 edge flags chain patches; type 7 tensor renders") {
    // patch A [0,30]x[0,30] flat red; flag-2 continuation shares A's
    // RIGHT edge (p7..p10) and extends to [30,60] flat red
    val w = new PdfRender.MeshBitWriter
    coonsPatch(w, 0, Seq((0, 0), (0, 10), (0, 20), (0, 30), (10, 30),
      (20, 30), (30, 30), (30, 20), (30, 10), (30, 0), (20, 0), (10, 0)),
      Seq(Red, Red, Red, Red))
    // shared edge = A's p7..p10, i.e. new p1 = (30,30) ... p4 = (30,0);
    // the boundary then continues FROM p4 along the bottom
    coonsPatch(w, 2, Seq((40, 0), (50, 0), (60, 0), (60, 10),
      (60, 20), (60, 30), (50, 30), (40, 30)), Seq(Red, Red))
    val im = render(pdf { b =>
      val shd = b.addStream(meshDict(6), w.bytes)
      b.addPage("/S1 sh", (60, 30), s"/Shading << /S1 $shd 0 R >>")
    })
    assert(count(im, Red) == 1800, s"red=${count(im, Red)}")
    // tensor (type 7): same affine square with interior points at the
    // affine positions — must cover and color like the Coons case
    val w7 = new PdfRender.MeshBitWriter
    coonsPatch(w7, 0, Seq((0, 0), (0, 10), (0, 20), (0, 30), (10, 30),
      (20, 30), (30, 30), (30, 20), (30, 10), (30, 0), (20, 0), (10, 0),
      (10, 10), (10, 20), (20, 20), (20, 10)),
      Seq(Blue, Blue, Blue, Blue))
    val im7 = render(pdf { b =>
      val shd = b.addStream(meshDict(7), w7.bytes)
      b.addPage("/S1 sh", (30, 30), s"/Shading << /S1 $shd 0 R >>")
    })
    assert(count(im7, Blue) == 900, s"blue=${count(im7, Blue)}")
  }

  test("shading /BBox clips the painted area in shading space") {
    val im = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 40 0] " +
          "/Function << /FunctionType 2 /C0 [1 0 0] /C1 [1 0 0] /N 1 >> " +
          "/Extend [true true] /BBox [5 5 25 15] >>")
      b.addPage("/S1 sh", (40, 20), s"/Shading << /S1 $shd 0 R >>")
    })
    // extend-true axial would flood the page; /BBox keeps 20x10
    assert(count(im, Red) == 200, s"red=${count(im, Red)}")
  }

  test("shading pattern /Background fills the unpainted area; sh ignores it") {
    // triangle (0,0)(20,0)(0,20): pixel centers with x <= y are inside
    // (user-space flip), so exactly 210 of the 20x20 fill
    val w = new PdfRender.MeshBitWriter
    vtx(w, 0, 0, 0, Red); vtx(w, 0, 20, 0, Red); vtx(w, 0, 0, 20, Red)
    val mesh = w.bytes
    val im = render(pdf { b =>
      val shd = b.addStream(meshDict(4, "/Background [0 0 1] "), mesh)
      val pat = b.addObj(s"<< /PatternType 2 /Shading $shd 0 R >>")
      b.addPage("/Pattern cs /P1 scn 0 0 20 20 re f", (20, 20),
        s"/Pattern << /P1 $pat 0 R >>")
    })
    assert(count(im, Red) == 210, s"red=${count(im, Red)}")
    assert(count(im, Blue) == 190, s"blue=${count(im, Blue)}")
    // `sh` must IGNORE /Background (ISO 32000-1 §8.7.4.3)
    val im2 = render(pdf { b =>
      val shd = b.addStream(meshDict(4, "/Background [0 0 1] "), mesh)
      b.addPage("/S1 sh", (20, 20), s"/Shading << /S1 $shd 0 R >>")
    })
    assert(count(im2, Blue) == 0, s"blue=${count(im2, Blue)}")
    assert(count(im2, Red) == 210)
  }

  test("type 1 function shading paints fn(s,t) inside /Domain only") {
    val im = render(pdf { b =>
      // PostScript { 0 }: stack (s, t) -> (s, t, 0) = (r, g, b)
      val fn = b.addStream(
        "/FunctionType 4 /Domain [0 1 0 1] /Range [0 1 0 1 0 1]",
        "{ 0 }".getBytes("ISO-8859-1"))
      val shd = b.addObj(
        "<< /ShadingType 1 /ColorSpace /DeviceRGB " +
          s"/Matrix [30 0 0 30 0 0] /Function $fn 0 R >>")
      b.addPage("/S1 sh", (40, 30), s"/Shading << /S1 $shd 0 R >>")
    })
    // x >= 30 maps outside the domain: unpainted white strip
    assert(count(im, White) == 10 * 30, s"white=${count(im, White)}")
    for ((x, y) <- Seq((10, 15), (0, 29), (29, 0))) {
      val s = (x + 0.5) / 30; val t = (29.5 - y) / 30
      val got = px(im, x, y)
      assert(math.abs(((got >> 16) & 0xff) - (255 * s).round.toInt) <= 1 &&
        math.abs(((got >> 8) & 0xff) - (255 * t).round.toInt) <= 1 &&
        (got & 0xff) == 0, f"($x,$y) got $got%06x")
    }
  }

  test("radial shading under ANISOTROPIC cm: exact device ellipse") {
    // 2x horizontal stretch before sh: circle r=8 at (10,20) in shading
    // space is a device ellipse, semi-axes 16 x 8 at (20,20). The old
    // sqrt|det| approximation drew a circle of r = 8*sqrt(2) ~ 11.3 —
    // the probe at device x=34 (inside the ellipse, outside that
    // circle) separates them.
    val im = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 3 /ColorSpace /DeviceRGB " +
          "/Coords [10 20 0 10 20 8] " +
          "/Function << /FunctionType 2 /C0 [1 0 0] /C1 [0 0 1] /N 1 >> >>")
      b.addPage("q 2 0 0 1 0 0 cm /S1 sh Q", (40, 40),
        s"/Shading << /S1 $shd 0 R >>")
    })
    // device row 19 = user y 20.5 (dy = 0.5 from the center)
    assert(px(im, 34, 19) != White, "inside ellipse (outside sqrt-det circle)")
    assert((im.getRGB(34, 19) & 0xff) > 200, "s~0.91: blue-dominant")
    assert(px(im, 37, 19) == White, "beyond the ellipse: unpainted")
    assert(px(im, 20, 12) != White, "minor axis inside (dy=7.5 < 8)")
    assert(px(im, 20, 8) == White, "minor axis outside (dy=11.5 > 8)")
    assert(((im.getRGB(20, 19) >> 16) & 0xff) > 230, "center red")
  }

  test("axial shading under SHEAR: iso-lines follow shading space") {
    // shear [1 0 1 1 0 0] before sh; axis (0,0)->(10,0) in shading
    // space, no /Extend. Inverse map: x_s = x_d - y_d, so s at device
    // (x, row 19 = user y 20.5) is (x+0.5-20.5)/10. AWT's
    // LinearGradientPaint would keep iso-lines vertical in DEVICE space
    // (s_old = x/10: clamped blue at x=25) and clamp /Extend-false ends.
    val im = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB " +
          "/Coords [0 0 10 0] " +
          "/Function << /FunctionType 2 /C0 [1 0 0] /C1 [0 0 1] /N 1 >> >>")
      b.addPage("q 1 0 1 1 0 0 cm /S1 sh Q", (40, 40),
        s"/Shading << /S1 $shd 0 R >>")
    })
    val mid = im.getRGB(25, 19) // s = 0.5: an even red/blue blend
    assert(math.abs(((mid >> 16) & 0xff) - (mid & 0xff)) <= 16,
      s"sheared midpoint ${mid.toHexString}")
    assert(px(im, 5, 19) == White, "s < 0 with no extend: unpainted")
    assert(px(im, 33, 19) == White, "s > 1 with no extend: unpainted")
    assert(((im.getRGB(21, 19) >> 16) & 0xff) >= 229, "s=0.1: red end")
  }

  test("ROTATED tiling pattern: 90-degree matrix paints exact pixels") {
    // cell: black 6x2 rect at the cell origin of a 10x10 cell; pattern
    // /Matrix [0 1 -1 0 20 0] rotates 90° — under rotation the rect
    // covers 2x6 device pixels per tile, 4 tiles on a 20x20 page
    val im = render(pdf { b =>
      val pat = b.addStream(
        "/PatternType 1 /PaintType 1 /TilingType 1 " +
          "/BBox [0 0 10 10] /XStep 10 /YStep 10 /Resources << >> " +
          "/Matrix [0 1 -1 0 20 0]",
        "0 g 0 0 6 2 re f".getBytes("ISO-8859-1"))
      b.addPage("/Pattern cs /P1 scn 0 0 20 20 re f", (20, 20),
        s"/Pattern << /P1 $pat 0 R >>")
    })
    assert(count(im, Black) == 4 * 12, s"black=${count(im, Black)}")
  }

  test("ROTATED tiling pattern: arbitrary angle tiles with coverage") {
    // 30° rotation: counts aren't closed-form at pixel granularity, but
    // the former named skip must be gone and coverage must be periodic
    // (roughly area-proportional: 12/100 of the page, wide tolerance)
    val im = render(pdf { b =>
      val pat = b.addStream(
        "/PatternType 1 /PaintType 1 /TilingType 1 " +
          "/BBox [0 0 10 10] /XStep 10 /YStep 10 /Resources << >> " +
          "/Matrix [0.866 0.5 -0.5 0.866 10 0]",
        "0 g 0 0 6 2 re f".getBytes("ISO-8859-1"))
      b.addPage("/Pattern cs /P1 scn 0 0 40 40 re f", (40, 40),
        s"/Pattern << /P1 $pat 0 R >>")
    })
    val black = count(im, Black)
    assert(black > 100 && black < 300, s"black=$black (expect ~192)")
    val pages = PdfRender.renderPageImages(pdf { b =>
      val pat = b.addStream(
        "/PatternType 1 /PaintType 1 /TilingType 1 " +
          "/BBox [0 0 10 10] /XStep 10 /YStep 10 /Resources << >> " +
          "/Matrix [0.866 0.5 -0.5 0.866 10 0]",
        "0 g 0 0 6 2 re f".getBytes("ISO-8859-1"))
      b.addPage("/Pattern cs /P1 scn 0 0 40 40 re f", (40, 40),
        s"/Pattern << /P1 $pat 0 R >>")
    })
    assert(!pages.head.unsupported.exists(_.contains("pattern-rotated")))
  }

  test("type 4 (PostScript calculator) shading function") {
    // f(t) = (t, 1-t, 0): green at the left end, red at the right
    val im = render(pdf { b =>
      val fn = b.addStream(
        "/FunctionType 4 /Domain [0 1] /Range [0 1 0 1 0 1]",
        "{ dup 1 exch sub 0 }".getBytes("ISO-8859-1"))
      val shd = b.addObj(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 80 0] " +
          s"/Function $fn 0 R /Extend [true true] >>")
      b.addPage("/S1 sh", (80, 10), s"/Shading << /S1 $shd 0 R >>")
    })
    val left = im.getRGB(2, 5)
    val right = im.getRGB(77, 5)
    assert(((left >> 8) & 0xff) > 230 && ((left >> 16) & 0xff) < 25, "left")
    assert(((right >> 16) & 0xff) > 230 && ((right >> 8) & 0xff) < 25,
      "right")
  }

  test("Separation colorspace runs its type 4 tint transform") {
    // tint t -> (1-t)^3 gray in DeviceRGB: full tint paints black
    val im = render(pdf { b =>
      val fn = b.addStream(
        "/FunctionType 4 /Domain [0 1] /Range [0 1 0 1 0 1]",
        "{ 1 exch sub dup dup }".getBytes("ISO-8859-1"))
      b.addPage("/CS0 cs 1 scn 2 2 8 4 re f", (16, 8),
        s"/ColorSpace << /CS0 [/Separation /Spot /DeviceRGB $fn 0 R] >>")
    })
    assert(count(im, Black) == 32)
    assert(px(im, 0, 0) == White)
  }

  test("DeviceN with a 2-D multi-input sampled tint transform") {
    // 2x2 grid, f(a,b) = a XOR b (corners); alternate DeviceGray.
    // scn 1 1 -> gray 0 (black); scn 1 0 -> gray 1 (white on white)
    val im = render(pdf { b =>
      val fn = b.addStream(
        "/FunctionType 0 /Domain [0 1 0 1] /Range [0 1] " +
          "/Size [2 2] /BitsPerSample 8",
        Array(0x00.toByte, 0xff.toByte, 0xff.toByte, 0x00.toByte))
      b.addPage(
        "/CS0 cs 1 1 scn 0 0 8 8 re f 1 0 scn 8 0 8 8 re f", (16, 8),
        "/ColorSpace << /CS0 [/DeviceN [/A /B] /DeviceGray " +
          s"$fn 0 R] >>")
    })
    assert(count(im, Black) == 64, "left half black")
    assert(px(im, 12, 4) == White, "right half white")
    // interior of the grid interpolates: f(1, 0.5) = 0.5 via the
    // function evaluator itself (render path proves the corners)
  }

  test("shading PATTERN (scn) with a stitching step function") {
    val im = render(pdf { b =>
      val pat = b.addObj(
        "<< /PatternType 2 /Shading << /ShadingType 2 " +
          "/ColorSpace /DeviceRGB /Coords [0 0 80 0] " +
          "/Function << /FunctionType 3 " +
          "/Functions [<< /FunctionType 2 /C0 [1 0 0] /C1 [1 0 0] /N 1 >> " +
          "<< /FunctionType 2 /C0 [0 0 1] /C1 [0 0 1] /N 1 >>] " +
          "/Bounds [0.5] /Encode [0 1 0 1] /Domain [0 1] >> " +
          "/Extend [true true] >> >>")
      b.addPage("/Pattern cs /P1 scn 0 0 80 10 re f", (80, 10),
        s"/Pattern << /P1 $pat 0 R >>")
    })
    // constant pieces are exact away from the 0.4375..0.5 blend band
    assert(px(im, 10, 5) == Red && px(im, 30, 5) == Red)
    assert(px(im, 45, 5) == Blue && px(im, 70, 5) == Blue)
    assert(count(im, Red) >= 34 * 10 && count(im, Blue) >= 39 * 10)
  }

  test("radial shading: center and far-field colors") {
    val im = render(pdf { b =>
      val shd = b.addObj(
        "<< /ShadingType 3 /ColorSpace /DeviceRGB " +
          "/Coords [30 30 0 30 30 20] " +
          "/Function << /FunctionType 2 /C0 [0 1 0] /C1 [0 0 1] /N 1 >> " +
          "/Extend [true true] >>")
      b.addPage("/S1 sh", (60, 60), s"/Shading << /S1 $shd 0 R >>")
    })
    val c = im.getRGB(30, 30)
    assert(((c >> 8) & 0xff) > 240) // center: green
    val corner = im.getRGB(1, 1) // beyond radius: padded end color
    assert((corner & 0xff) > 240)
  }

  test("numeric color after a pattern clears the pattern paint") {
    val im = render(pdf { b =>
      val pat = b.addStream(
        "/PatternType 1 /PaintType 1 /TilingType 1 /BBox [0 0 10 10] " +
          "/XStep 10 /YStep 10 /Resources << >>",
        "0 g 0 0 4 4 re f"
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      b.addPage(
        "/Pattern cs /P1 scn 0 0 20 20 re f 1 0 0 rg 20 0 20 20 re f",
        (40, 20), s"/Pattern << /P1 $pat 0 R >>")
    })
    assert(count(im, Red) == 400) // solid right half
    assert(count(im, Black) == 64) // 2x2 tiles on the left half
  }

  test("sampled (Type 0) function shading: grid stops reproduce exactly") {
    val im = render(pdf { b =>
      // 3 samples: red, red, blue -> constant red on [0,0.5], then blend
      val fn = b.addStream(
        "/FunctionType 0 /Domain [0 1] /Range [0 1 0 1 0 1] " +
          "/Size [3] /BitsPerSample 8",
        Array(0xff, 0, 0, 0xff, 0, 0, 0, 0, 0xff).map(_.toByte))
      val shd = b.addObj(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 80 0] " +
          s"/Function $fn 0 R /Extend [true true] >>")
      b.addPage("/S1 sh", (80, 10), s"/Shading << /S1 $shd 0 R >>")
    })
    // plateau between the two identical samples is exactly red
    assert(px(im, 10, 5) == Red && px(im, 30, 5) == Red)
    val right = im.getRGB(79, 5)
    assert((right & 0xff) > 240 && ((right >> 16) & 0xff) < 15)
    val mid = im.getRGB(60, 5) // midpoint of the second segment
    assert(math.abs(((mid >> 16) & 0xff) - (mid & 0xff)) <= 8)
  }
}
