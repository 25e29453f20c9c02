package graft.catalog

import graft.TestSpark
import graft.functions.{CcittFax, Cff, Pdf, PdfRender}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit, round 12: the page-rasterization surface
  * (PdfRender with its round-12 CCITT and CFF tiers) driven by the
  * CATALOG's computed-column machinery — backfill on addColumn, compute
  * on insert, cascade on update, MVCC time travel reading the old
  * computed value, and a corrupt document degrading to a sentinel
  * without failing the commit.
  *
  * Why this pairing: each side is individually oracle-gated (q188/q189
  * render closed forms; q87/q149 computed-column lifecycle) — the audit
  * checks the COMPOSITION a real corpus table uses: "store raw PDFs,
  * keep derived pixel statistics as stored computed columns, let DML
  * maintain them".
  */
class R12InteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-r12x").toString)

  /** One-page PDF with a black w×h rect at (10, 10) drawn four ways:
    * vector fill, Type3 glyph, CCITT G4 image, embedded-CFF glyph —
    * all render to exactly w*h black pixels on a 60×40 page.
    */
  private def fixture(kind: Int, w: Int, h: Int): Array[Byte] = {
    val b = new Pdf.PdfBuilder
    kind match {
      case 0 => // vector
        b.addPage(s"0 g 10 10 $w $h re f", (60, 40))
      case 1 => // Type3: glyph box scaled to w x h by Tf/Matrix
        val proc = b.addStream("",
          s"${w * 10} 0 d0 0 0 ${w * 10} ${h * 10} re f"
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        val font = b.addObj(
          "<< /Type /Font /Subtype /Type3 /FontMatrix [0.01 0 0 0.01 0 0] " +
            s"/CharProcs << /box $proc 0 R >> " +
            "/Encoding << /Differences [65 /box] >> " +
            s"/FirstChar 65 /LastChar 65 /Widths [${w * 10}] >>")
        b.addPage(s"0 g BT /T3 10 Tf 10 10 Td (A) Tj ET", (60, 40),
          s"/Font << /T3 $font 0 R >>")
      case 2 => // CCITT G4 image at exact pixel size
        val rowBytes = (w + 7) / 8
        val bitmap = Array.fill[Byte](h * rowBytes)(0) // all black
        val img = b.addStream(
          "/Type /XObject /Subtype /Image " +
            s"/Width $w /Height $h /ColorSpace /DeviceGray " +
            "/BitsPerComponent 1 /Filter /CCITTFaxDecode " +
            s"/DecodeParms << /K -1 /Columns $w /Rows $h >>",
          CcittFax.encode(bitmap, -1, w, h, blackIs1 = false,
            byteAlign = false))
        b.addPage(s"q $w 0 0 $h 10 10 cm /I Do Q", (60, 40),
          s"/XObject << /I $img 0 R >>")
      case 3 => // embedded CFF glyph: w x h units at Tf 1... scale 100
        val ff = b.addStream("/Subtype /Type1C",
          Cff.write(Seq("A" -> Cff.charstring(Seq(0, 0, "rmoveto",
            w * 10, "hlineto", h * 10, "vlineto", -(w * 10), "hlineto",
            "endchar"))), Seq(65)))
        val fd = b.addObj("<< /Type /FontDescriptor /FontName /Fx " +
          s"/FontFile3 $ff 0 R >>")
        val font = b.addObj(
          "<< /Type /Font /Subtype /Type1 /BaseFont /Fx " +
            "/Encoding << /Differences [65 /A] >> " +
            s"/FirstChar 65 /LastChar 65 /Widths [${w * 10}] " +
            s"/FontDescriptor $fd 0 R >>")
        b.addPage("0 g BT /F1 100 Tf 10 10 Td (A) Tj ET", (60, 40),
          s"/Font << /F1 $font 0 R >>")
    }
    b.build()
  }

  test("rendered pixel stats as a stored computed column: backfill, " +
      "insert, cascade, time travel, corrupt-row sentinel") {
    // total function: corrupt PDFs yield -1 instead of failing the commit
    spark.udf.register("pdf_black_px_r12", (pdf: Array[Byte]) =>
      try {
        val pages = PdfRender.renderPageImages(pdf)
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(pages.head.png))
        var n = 0L
        for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
          if ((im.getRGB(x, y) & 0xffffff) == 0) n += 1
        n
      } catch { case _: Exception => -1L })

    val cat = newCat()
    val t = GraftTable.create(spark, cat, "pdfstats", Seq(
      ColumnDef("id", "bigint"), ColumnDef("pdf", "binary")))
    // seed: all four render tiers, distinct closed-form areas
    t.insert(Seq(
      (0L, fixture(0, 12, 5)), // vector: 60
      (1L, fixture(1, 8, 6)), // Type3: 48
      (2L, fixture(2, 16, 4)), // CCITT: 64
      (3L, fixture(3, 10, 7)) // CFF: 70
    ).toDF("id", "pdf"))

    // addColumn backfills EXISTING rows through the renderer
    t.addColumn(ColumnDef("black_px", "bigint",
      computedExpr = Some("pdf_black_px_r12(pdf)")))
    def stats(): Map[Long, Long] =
      t.read().select("id", "black_px").as[(Long, Long)].collect().toMap
    assert(stats() == Map(0L -> 60L, 1L -> 48L, 2L -> 64L, 3L -> 70L))

    // insert computes for NEW rows (one healthy, one corrupt → sentinel)
    val v0 = t.currentVersion
    t.insert(Seq(
      (4L, fixture(2, 8, 8)), // CCITT: 64
      (5L, fixture(3, 10, 7).take(40)) // corrupt: -1, commit survives
    ).toDF("id", "pdf"))
    assert(stats() == Map(0L -> 60L, 1L -> 48L, 2L -> 64L, 3L -> 70L,
      4L -> 64L, 5L -> -1L))

    // update cascades the recompute (vector rect grows)
    t.batchUpdate(Seq((0L, fixture(0, 20, 6))).toDF("id", "pdf"),
      Seq("id"))
    assert(stats()(0L) == 120L)
    // MVCC time travel reads the OLD computed value
    val old = t.read(Some(v0)).filter("id = 0")
      .select("black_px").as[Long].head()
    assert(old == 60L)

    // repairing the corrupt row recomputes past the sentinel
    t.batchUpdate(Seq((5L, fixture(1, 8, 6))).toDF("id", "pdf"), Seq("id"))
    assert(stats()(5L) == 48L)
  }

  test("CCITT images inside stored PDFs survive extractImages after " +
      "a computed-column rewrite (no payload corruption through COW)") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "faxdocs", Seq(
      ColumnDef("id", "bigint"), ColumnDef("pdf", "binary")))
    t.insert(Seq(
      (0L, fixture(2, 16, 4)), (1L, fixture(2, 8, 8))).toDF("id", "pdf"))
    // a column rewrite (backfill) copies every row through parquet; the
    // binary payload must round-trip bit-exactly for the fax decode
    spark.udf.register("pdf_size_r12", (pdf: Array[Byte]) =>
      pdf.length.toLong)
    t.addColumn(ColumnDef("nbytes", "bigint",
      computedExpr = Some("pdf_size_r12(pdf)")))
    val out = t.read().select("id", "pdf").as[(Long, Array[Byte])]
      .collect().toMap
    // extractImages decodes the CCITT payload to PNG with exact dims
    val imgs0 = Pdf.extractImages(out(0L))
    assert(imgs0.length == 1 && imgs0.head.format == "png" &&
      imgs0.head.width == 16 && imgs0.head.height == 4)
    val png = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(imgs0.head.data))
    // all-black 1-bit image: every raster sample is 0
    val all0 = (0 until 4).forall(y => (0 until 16).forall(x =>
      png.getRaster.getSample(x, y, 0) == 0))
    assert(all0)
  }
}
