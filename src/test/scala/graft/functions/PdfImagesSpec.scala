package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Embedded-image extraction from PDFs (the reference document_splitter's
  * `elements=['image']` surface restricted to embedded rasters —
  * `functions/document.py:120-146`; page RASTERIZATION stays an explicit
  * adjudication). The writer twin embeds JPEG (DCTDecode passthrough)
  * and RGB-Flate XObjects.
  */
class PdfImagesSpec extends AnyFunSuite {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb & 0xffffff)); g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb & 0xffffff)); g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("flate-embedded png round-trips pixel-exact") {
    val pdf = Pdf.writePdfWithImages(Seq("page one", "page two", "page three"),
      Map(0 -> png(7, 5, 0xCC3311), 2 -> png(3, 9, 0x2288EE)))
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.page, i.width, i.height, i.format)) ==
      Seq((1, 7, 5, "png"), (3, 3, 9, "png")))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(imgs.head.data))
    assert((back.getRGB(3, 2) & 0xffffff) == 0xCC3311)
    assert((back.getRGB(6, 4) & 0xffffff) == 0xCC3311)
    val back2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(imgs(1).data))
    assert((back2.getRGB(0, 8) & 0xffffff) == 0x2288EE)
    // text extraction is undisturbed by the image content ops
    assert(Pdf.extractPages(pdf) == Seq("page one", "page two", "page three"))
  }

  test("jpeg embeds as DCTDecode passthrough: extracted bytes ARE the jpeg") {
    val j = jpeg(12, 8, 0x446688)
    val pdf = Pdf.writePdfWithImages(Seq("captioned"), Map(0 -> j))
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.page, i.width, i.height, i.format)) ==
      Seq((1, 12, 8, "jpeg")))
    assert(imgs.head.data.sameElements(j)) // bit-exact passthrough
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(imgs.head.data))
    assert(back.getWidth == 12 && back.getHeight == 8)
  }

  test("pages without images contribute nothing; imageless pdf is empty") {
    assert(Pdf.extractImages(Pdf.writePdf(Seq("plain", "text"))).isEmpty)
  }

  test("office embedded media: docx/pptx/xlsx round-trip bit-exact") {
    val p1 = png(5, 4, 0x112233)
    val j1 = jpeg(6, 3, 0x445566)
    val docx = Office.addMedia(
      Office.writeDocx(Seq((1, "Title"), (0, "body"))),
      Seq("fig1.png" -> p1, "photo.jpeg" -> j1))
    val m = Office.extractMedia(docx)
    assert(m.map(x => (x._1, x._2)) ==
      Seq("word/media/fig1.png" -> "png", "word/media/photo.jpeg" -> "jpeg"))
    assert(m.head._3.sameElements(p1) && m(1)._3.sameElements(j1))
    // markdown conversion is undisturbed by the media parts
    assert(Office.docxToMarkdown(docx).contains("# Title"))
    // pptx and xlsx prefixes
    val pptx = Office.addMedia(Office.writePptx(Seq(("s", Seq("l")))),
      Seq("img.png" -> p1))
    assert(Office.extractMedia(pptx).map(_._1) == Seq("ppt/media/img.png"))
    val minimalXlsx = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("xl/workbook.xml"))
      z.write("<workbook/>".getBytes("UTF-8")); z.closeEntry(); z.close()
      bos.toByteArray
    }
    val xlsx = Office.addMedia(minimalXlsx, Seq("chart.png" -> p1))
    assert(Office.extractMedia(xlsx).map(_._1) == Seq("xl/media/chart.png"))
    // no media → empty; non-office rejected
    assert(Office.extractMedia(Office.writeDocx(Seq((0, "x")))).isEmpty)
    intercept[IllegalArgumentException](
      Office.extractMedia("not a zip".getBytes))
  }

  test("hand-built gray and 1-bit images decode through the raster path") {
    def miniPdf(imgDict: String, samples: Array[Byte]): Array[Byte] = {
      val s = new StringBuilder("%PDF-1.4\n")
      s.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      s.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
      s.append("3 0 obj\n<< /Type /Page /MediaBox [0 0 100 100] " +
        "/Resources << /XObject << /Ig 4 0 R >> >> /Contents 5 0 R >>\nendobj\n")
      s.append(s"4 0 obj\n$imgDict\nstream\n")
      s.append(new String(samples, "ISO-8859-1"))
      s.append("\nendstream\nendobj\n")
      s.append("5 0 obj\n<< /Length 5 >>\nstream\nq Q\nn\nendstream\nendobj\n")
      s.append("trailer\n<< /Root 1 0 R /Size 6 >>\n%%EOF")
      s.toString.getBytes("ISO-8859-1")
    }
    // 8-bit gray 4x2: values 0,64,128,255 / 10,20,30,40
    val gray = miniPdf("<< /Type /XObject /Subtype /Image /Width 4 " +
      "/Height 2 /ColorSpace /DeviceGray /BitsPerComponent 8 /Length 8 >>",
      Array[Byte](0, 64, -128, -1, 10, 20, 30, 40))
    val gi = Pdf.extractImages(gray)
    assert(gi.map(i => (i.page, i.name, i.width, i.height, i.format)) ==
      Seq((1, "Ig", 4, 2, "png")))
    val gimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gi.head.data))
    assert(gimg.getRaster.getSample(0, 0, 0) == 0)
    assert(gimg.getRaster.getSample(3, 0, 0) == 255)
    assert(gimg.getRaster.getSample(2, 0, 0) == 128)
    assert(gimg.getRaster.getSample(1, 1, 0) == 20)
    // 1-bit gray 10x2: pattern rows 1010101010 / 0101010101
    val bits = Array[Byte](0xaa.toByte, 0x80.toByte, 0x55, 0x40)
    val bw = miniPdf("<< /Type /XObject /Subtype /Image /Width 10 " +
      "/Height 2 /ColorSpace /DeviceGray /BitsPerComponent 1 /Length 4 >>",
      bits)
    val bi = Pdf.extractImages(bw)
    assert(bi.head.width == 10 && bi.head.format == "png")
    val bimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bi.head.data))
    assert(bimg.getRaster.getSample(0, 0, 0) == 255) // leading 1 bit
    assert(bimg.getRaster.getSample(1, 0, 0) == 0)
    assert(bimg.getRaster.getSample(0, 1, 0) == 0)
    assert(bimg.getRaster.getSample(1, 1, 0) == 255)
  }
}
