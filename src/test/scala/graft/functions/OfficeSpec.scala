package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Office → markdown conversion (the reference's MarkItDown step for
  * DOCX/PPTX/XLSX documents): writer→parser round-trips with exact
  * markdown pins, format sniffing, and the handoff into the markdown
  * chunking pipeline (`Iterators.headingChunks`).
  */
class OfficeSpec extends AnyFunSuite {
  import Office._

  test("docx: headings, paragraphs, lists, tables render as markdown") {
    val docx = writeDocx(Seq(
      (1, "Annual Report"),
      (0, "The year went well."),
      (2, "Details"),
      (-1, "first item"),
      (-1, "second item"),
      (0, "Closing remarks & a <tag>.")))
    assert(sniff(docx).contains("docx"))
    val md = docxToMarkdown(docx)
    assert(md ==
      """# Annual Report
        |
        |The year went well.
        |
        |## Details
        |
        |- first item
        |- second item
        |Closing remarks & a <tag>.""".stripMargin)
  }

  test("docx tables become markdown tables") {
    // hand-build a document.xml with a 2x2 table
    val tbl =
      """<w:tbl><w:tr><w:tc><w:p><w:r><w:t>h1</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:t>h2</w:t></w:r></w:p></w:tc></w:tr>
        |<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr></w:tbl>""".stripMargin
    val doc =
      s"""<?xml version="1.0"?><w:document xmlns:w="http://x/w"><w:body>
         |<w:p><w:r><w:t>before</w:t></w:r></w:p>$tbl</w:body></w:document>""".stripMargin
    // wrap via the writer's zip layout by splicing our xml
    val base = writeDocx(Seq((0, "x")))
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    for ((n, b) <- Seq(
        "[Content_Types].xml" -> "<Types/>".getBytes,
        "word/document.xml" -> doc.getBytes("UTF-8"))) {
      z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(b); z.closeEntry()
    }
    z.close()
    val md = docxToMarkdown(out.toByteArray)
    assert(md ==
      """before
        |
        || h1 | h2 |
        || --- | --- |
        || a | b |""".stripMargin)
  }

  test("pptx: slide titles become headings, bodies lines; slide order numeric") {
    val pptx = writePptx(Seq(
      ("Intro", Seq("welcome", "agenda")),
      ("Results", Seq("q1 up")),
      ("End", Seq.empty)))
    assert(sniff(pptx).contains("pptx"))
    val md = pptxToMarkdown(pptx)
    assert(md ==
      """# Intro
        |
        |welcome
        |
        |agenda
        |
        |# Results
        |
        |q1 up
        |
        |# End""".stripMargin)
  }

  test("pptx with 10+ slides keeps numeric order (slide10 after slide9)") {
    val slides = (1 to 12).map(i => (s"S$i", Seq.empty[String]))
    val md = pptxToMarkdown(writePptx(slides))
    val titles = md.split("\n").filter(_.startsWith("# ")).map(_.drop(2)).toSeq
    assert(titles == (1 to 12).map(i => s"S$i"))
  }

  test("xlsx renders the first sheet as a markdown table") {
    // reuse the repo's xlsx exporter for a real fixture
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("office-xlsx")
      .resolve("t.xlsx").toString
    graft.io.Excel.exportExcel(
      Seq(("a", 1L), ("b", 2L)).toDF("name", "v"), path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(sniff(bytes).contains("xlsx"))
    val md = xlsxToMarkdown(bytes)
    assert(md.startsWith("| name | v |"), md)
    assert(md.contains("| a | 1 |"), md)
    assert(md.contains("| b | 2 |"), md)
  }

  test("office markdown rides the heading chunker like any .md document") {
    val docx = writeDocx(Seq(
      (1, "Title"), (0, "intro text"),
      (2, "Part A"), (0, "alpha body"),
      (2, "Part B"), (0, "beta body")))
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(Tuple1(docx)).toDF("doc")
      .select(explode(Iterators.headingChunks(
        Office.officeToMarkdown(col("doc")))).as("c"))
      .select(col("c.text"), col("c.title"), col("c.heading"))
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(1) == "Title"))
    assert(rows(1).getString(0) == "alpha body")
    assert(rows(1).getMap[String, String](2).get("h2").contains("Part A"))
  }

  test("documentToText dispatches by content like the reference's magic fallback") {
    // PDF → pages joined by form feeds
    val pdf = Pdf.writePdf(Seq("page one", "page two"))
    assert(documentToText(pdf) == "page one\fpage two")
    // office → markdown
    assert(documentToText(writeDocx(Seq((1, "T"), (0, "b")))) == "# T\n\nb")
    // html → text blocks
    val html = "<!DOCTYPE html><html><body><p>hello &amp; bye</p></body></html>"
    assert(documentToText(html.getBytes("UTF-8")).contains("hello & bye"))
    // plain text / markdown pass through
    assert(documentToText("# md\n\nbody".getBytes("UTF-8")) == "# md\n\nbody")
    assert(documentToText(null) == null)
  }

  test("sniff rejects non-office zips and non-zips") {
    assert(sniff("not a zip".getBytes).isEmpty)
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("random.txt"))
    z.write("x".getBytes); z.closeEntry(); z.close()
    assert(sniff(out.toByteArray).isEmpty)
    intercept[IllegalArgumentException](toMarkdown("plain".getBytes))
  }
}
