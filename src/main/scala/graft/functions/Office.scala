package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Office-document text extraction (DOCX / PPTX / XLSX → markdown), the
  * reference's MarkItDown conversion step (`utils/documents.py:60-64,
  * get_office_handle`: office formats convert to markdown and then ride
  * the markdown chunking pipeline). Pure JVM: the OOXML containers are
  * plain zips and the text model is simple XML — paragraphs, runs,
  * heading styles, list markers and tables for DOCX; slides, title
  * placeholders and text bodies for PPTX; rows as markdown tables for
  * XLSX. The markdown output feeds the same `Iterators.headingChunks` /
  * sentence / paragraph / token splitters as any .md document.
  *
  * Fixture writers (`writeDocx`/`writePptx`) emit minimal valid OOXML
  * zips with deterministic entries, so gates can synthesize documents
  * in-query and oracle the chunking with closed forms.
  */
object Office {

  private val xmlIn: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  // ---------------- container ----------------

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val in = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> in.readAllBytes()
      in.closeEntry()
      e = in.getNextEntry
    }
    out.result()
  }

  /** Which office format a zip payload is, if any. */
  def sniff(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 4 || bytes(0) != 'P' || bytes(1) != 'K') return None
    val names = {
      val in = new ZipInputStream(new ByteArrayInputStream(bytes))
      val b = Seq.newBuilder[String]
      var e = in.getNextEntry
      while (e != null) { b += e.getName; in.closeEntry(); e = in.getNextEntry }
      b.result().toSet
    }
    if (names.contains("word/document.xml")) Some("docx")
    else if (names.exists(_.startsWith("ppt/slides/slide"))) Some("pptx")
    else if (names.contains("xl/workbook.xml")) Some("xlsx")
    else None
  }

  /** Convert any supported office payload to markdown. */
  def toMarkdown(bytes: Array[Byte]): String = sniff(bytes) match {
    case Some("docx") => docxToMarkdown(bytes)
    case Some("pptx") => pptxToMarkdown(bytes)
    case Some("xlsx") => xlsxToMarkdown(bytes)
    case _ => throw new IllegalArgumentException("not an office document")
  }

  // ---------------- embedded media ----------------

  /** Embedded media parts (everything under `word/media`, `ppt/media`
    * or `xl/media`) as (path, extension, bytes), package order — figure
    * extraction from office documents, the DOCX/PPTX/XLSX counterpart
    * of `Pdf.extractImages` (payloads pass through bit-exact;
    * downstream image ops sniff the format by magic as usual).
    */
  def extractMedia(bytes: Array[Byte]): Seq[(String, String, Array[Byte])] = {
    require(sniff(bytes).isDefined, "not an office document")
    val in = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, String, Array[Byte])]
    var e = in.getNextEntry
    while (e != null) {
      val name = e.getName
      if (!e.isDirectory && MediaPart.pattern.matcher(name).matches()) {
        val ext = name.substring(name.lastIndexOf('.') + 1).toLowerCase match {
          case n if n == name.toLowerCase => "" // no extension
          case n => n
        }
        out += ((name, ext, in.readAllBytes()))
      }
      in.closeEntry(); e = in.getNextEntry
    }
    out.result()
  }

  private val MediaPart = "(word|ppt|xl)/media/.+".r

  /** Re-zip an office package with media parts added under its media
    * directory — the fixture twin `extractMedia` round-trips against.
    * `media` names are bare file names (e.g. `fig1.png`).
    */
  def addMedia(pkg: Array[Byte],
      media: Seq[(String, Array[Byte])]): Array[Byte] = {
    val prefix = sniff(pkg) match {
      case Some("docx") => "word/media/"
      case Some("pptx") => "ppt/media/"
      case Some("xlsx") => "xl/media/"
      case _ => throw new IllegalArgumentException("not an office document")
    }
    val in = new ZipInputStream(new ByteArrayInputStream(pkg))
    val existing = Seq.newBuilder[(String, Array[Byte])]
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) existing += ((e.getName, in.readAllBytes()))
      in.closeEntry(); e = in.getNextEntry
    }
    zip(existing.result() ++ media.map { case (n, d) => (prefix + n, d) })
  }

  /** Embedded media as (path, ext, data) structs. */
  val embeddedMedia = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) =>
      if (bytes == null) null else extractMedia(bytes)
  }

  // ---------------- DOCX ----------------

  /** word/document.xml → markdown: Heading<N> styles become `#`-headings,
    * numPr paragraphs become list items, tables become markdown tables,
    * everything else a paragraph separated by blank lines.
    */
  def docxToMarkdown(bytes: Array[Byte]): String = {
    val doc = zipEntries(bytes).getOrElse("word/document.xml",
      throw new IllegalArgumentException("docx without word/document.xml"))
    val r = xmlIn.createXMLStreamReader(new ByteArrayInputStream(doc))
    val out = new StringBuilder
    var para = new StringBuilder
    var headingLevel = 0
    var isList = false
    var inTable = false
    var tableRowIdx = 0
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cell: StringBuilder = null
    def flushPara(): Unit = {
      val t = para.toString.trim
      if (t.nonEmpty) {
        if (headingLevel > 0) out.append("#" * headingLevel).append(' ')
          .append(t).append("\n\n")
        else if (isList) out.append("- ").append(t).append('\n')
        else out.append(t).append("\n\n")
      }
      para = new StringBuilder; headingLevel = 0; isList = false
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "tbl" => inTable = true; tableRowIdx = 0
            case "tr" if inTable =>
              row = scala.collection.mutable.ArrayBuffer.empty[String]
            case "tc" if inTable => cell = new StringBuilder
            case "pStyle" =>
              val v = attr(r, "val")
              if (v != null && v.toLowerCase.startsWith("heading"))
                headingLevel = math.min(6,
                  math.max(1, v.drop(7).takeWhile(_.isDigit) match {
                    case "" => 1
                    case d => d.toInt
                  }))
            case "numPr" => isList = true
            case "t" =>
              val text = readText(r)
              if (cell != null) cell.append(text) else para.append(text)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "p" if cell == null && !inTable => flushPara()
            case "tc" if inTable =>
              row += cell.toString.trim; cell = null
            case "tr" if inTable =>
              out.append(row.mkString("| ", " | ", " |")).append('\n')
              if (tableRowIdx == 0)
                out.append(row.map(_ => "---")
                  .mkString("| ", " | ", " |")).append('\n')
              tableRowIdx += 1
            case "tbl" => inTable = false; out.append('\n')
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    flushPara()
    out.toString.replaceAll("\n{3,}", "\n\n").trim
  }

  // ---------------- PPTX ----------------

  /** ppt/slides/slideN.xml (numeric order) → markdown: a slide's title
    * placeholder becomes an `#`-heading, each text paragraph a line.
    */
  def pptxToMarkdown(bytes: Array[Byte]): String = {
    val entries = zipEntries(bytes)
    val slideNames = entries.keys
      .filter(n => n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
      .toSeq.sortBy(n =>
        n.stripPrefix("ppt/slides/slide").stripSuffix(".xml").toInt)
    val out = new StringBuilder
    slideNames.foreach { name =>
      val r = xmlIn.createXMLStreamReader(new ByteArrayInputStream(entries(name)))
      var inTitleShape = false
      var shapeIsTitle = false
      var para = new StringBuilder
      val body = scala.collection.mutable.ArrayBuffer.empty[String]
      var title: String = null
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "sp" => shapeIsTitle = false
              case "ph" =>
                val t = attr(r, "type")
                if (t == "title" || t == "ctrTitle") shapeIsTitle = true
              case "t" => para.append(readText(r))
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "p" if para.nonEmpty =>
                val t = para.toString.trim
                if (t.nonEmpty) {
                  if (shapeIsTitle && title == null) title = t else body += t
                }
                para = new StringBuilder
              case _ =>
            }
          case _ =>
        }
      }
      r.close()
      if (title != null) out.append("# ").append(title).append("\n\n")
      body.foreach(l => out.append(l).append("\n\n"))
    }
    out.toString.trim
  }

  // ---------------- XLSX ----------------

  /** First worksheet → one markdown table (shared + inline strings and
    * raw numeric values; the MarkItDown sheet-as-table shape).
    */
  def xlsxToMarkdown(bytes: Array[Byte]): String = {
    val entries = zipEntries(bytes)
    val shared: IndexedSeq[String] = entries.get("xl/sharedStrings.xml").map { b =>
      val r = xmlIn.createXMLStreamReader(new ByteArrayInputStream(b))
      val out = IndexedSeq.newBuilder[String]
      var cur: StringBuilder = null
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
            cur = new StringBuilder
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" =>
            if (cur != null) cur.append(readText(r))
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            out += cur.toString; cur = null
          case _ =>
        }
      }
      r.close(); out.result()
    }.getOrElse(IndexedSeq.empty)
    val sheetName = entries.keys
      .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
      .toSeq.sorted.headOption.getOrElse(
        throw new IllegalArgumentException("xlsx without worksheets"))
    val r = xmlIn.createXMLStreamReader(
      new ByteArrayInputStream(entries(sheetName)))
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellKind: String = null
    var cellVal: String = null
    var inIs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" => cellKind = Option(attr(r, "t")).getOrElse("n"); cellVal = null
            case "is" => inIs = true
            case "v" => cellVal = readText(r)
            case "t" if inIs => cellVal = readText(r)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "c" if row != null =>
              val s = (cellKind, cellVal) match {
                case (_, null) => ""
                case ("s", v) => shared(v.trim.toInt)
                case (_, v) => v
              }
              row += s
            case "is" => inIs = false
            case "row" if row != null =>
              rows += row.toSeq; row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    if (rows.isEmpty) return ""
    val out = new StringBuilder
    out.append(rows.head.mkString("| ", " | ", " |")).append('\n')
    out.append(rows.head.map(_ => "---").mkString("| ", " | ", " |")).append('\n')
    rows.tail.foreach(rw => out.append(rw.mkString("| ", " | ", " |")).append('\n'))
    out.toString.trim
  }

  private def readText(r: XMLStreamReader): String = {
    val sb = new StringBuilder
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => done = true
        case XMLStreamConstants.START_ELEMENT => // nested — ignore
        case _ =>
      }
    }
    sb.toString
  }

  private def attr(r: XMLStreamReader, local: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  // ---------------- fixture writers ----------------

  private def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      val e = new ZipEntry(name)
      e.setTime(0L) // deterministic fixtures
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal valid DOCX: `paras` are (headingLevel, text) with level 0 =
    * body paragraph, -1 = list item.
    */
  def writeDocx(paras: Seq[(Int, String)]): Array[Byte] = {
    val body = paras.map { case (lvl, text) =>
      val props =
        if (lvl > 0)
          s"""<w:pPr><w:pStyle w:val="Heading$lvl"/></w:pPr>"""
        else if (lvl < 0)
          """<w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr>"""
        else ""
      s"""<w:p>$props<w:r><w:t xml:space="preserve">${xmlEscape(text)}</w:t></w:r></w:p>"""
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body>$body</w:body></w:document>""".stripMargin
    val ct =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
        |</Relationships>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" -> ct.getBytes("UTF-8"),
      "_rels/.rels" -> rels.getBytes("UTF-8"),
      "word/document.xml" -> doc.getBytes("UTF-8")))
  }

  /** Minimal valid PPTX: slides are (title, bodyLines). */
  def writePptx(slides: Seq[(String, Seq[String])]): Array[Byte] = {
    val slideEntries = slides.zipWithIndex.map { case ((title, lines), i) =>
      val titleSp =
        s"""<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
           |<p:txBody><a:p><a:r><a:t>${xmlEscape(title)}</a:t></a:r></a:p></p:txBody></p:sp>""".stripMargin
      val bodySp =
        s"""<p:sp><p:nvSpPr><p:nvPr><p:ph type="body"/></p:nvPr></p:nvSpPr>
           |<p:txBody>${lines.map(l =>
          s"<a:p><a:r><a:t>${xmlEscape(l)}</a:t></a:r></a:p>").mkString}</p:txBody></p:sp>""".stripMargin
      val xml =
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
           | xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
           |<p:cSld><p:spTree>$titleSp$bodySp</p:spTree></p:cSld></p:sld>""".stripMargin
      s"ppt/slides/slide${i + 1}.xml" -> xml.getBytes("UTF-8")
    }
    val ct =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |</Types>""".stripMargin
    zip(("[Content_Types].xml" -> ct.getBytes("UTF-8")) +: slideEntries)
  }

  // ---------------- Spark surface ----------------

  /** binary office payload → markdown (null-safe) */
  val officeToMarkdown = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) =>
      if (bytes == null) null else toMarkdown(bytes)
  }

  /** Content-sniffed document → chunkable text, the reference's
    * `get_document_handle` magic fallback (`utils/documents.py:30-44`:
    * extension first, then puremagic): %PDF → page texts joined by form
    * feeds (the page-chunker convention), OOXML zips → markdown, HTML →
    * tag-soup text blocks, anything else UTF-8 text (md/txt/xml are
    * already what the chunkers eat).
    */
  def documentToText(bytes0: Array[Byte]): String = {
    if (bytes0 == null) return null
    val bytes = Compress.decompressAuto(bytes0) // .md.gz / .json.zst / ...
    if (bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
        bytes(2) == 'D' && bytes(3) == 'F')
      return Pdf.extractPages(bytes).mkString("\f")
    if (sniff(bytes).isDefined) return toMarkdown(bytes)
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val head = text.take(2048).toLowerCase
    if (head.contains("<html") || head.contains("<!doctype html"))
      Html.htmlToText(text)
    else if (isSubtitle(text))
      // captions → transcript: cue text with presentation markup
      // stripped, one line per cue (the caption-as-document shape the
      // curation pipeline consumes)
      Subtitles.parse(text)
        .map(c => Subtitles.stripMarkup(c.text)).filter(_.nonEmpty)
        .mkString("\n")
    else text
  }

  /** WebVTT (header magic) or SRT (cue number + clock line shape). */
  private def isSubtitle(text: String): Boolean = {
    val head = text.stripPrefix("﻿").linesIterator
      .map(_.trim).filter(_.nonEmpty).take(2).toSeq
    head.headOption.exists(_.startsWith("WEBVTT")) ||
      (head.length == 2 && head.head.forall(_.isDigit) &&
        SrtClockLine.findFirstIn(head(1)).isDefined)
  }
  private val SrtClockLine =
    """^\d{1,3}:\d{2}:\d{2},\d{3}\s*-->\s*\d{1,3}:\d{2}:\d{2},\d{3}""".r

  val documentText = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) => documentToText(bytes)
  }

  /** fixture: build a DOCX from (level, text) pairs packed as
    * `level:text` strings — gate surface for in-query synthesis.
    */
  val makeDocx = org.apache.spark.sql.functions.udf { (paras: Seq[String]) =>
    writeDocx(paras.map { s =>
      val i = s.indexOf(':')
      (s.take(i).toInt, s.drop(i + 1))
    })
  }

  /** fixture: build a PPTX from `title:line1|line2` slide strings. */
  val makePptx = org.apache.spark.sql.functions.udf { (slides: Seq[String]) =>
    writePptx(slides.map { s =>
      val i = s.indexOf(':')
      val lines = s.drop(i + 1)
      (s.take(i), if (lines.isEmpty) Seq.empty else lines.split('|').toSeq)
    })
  }
}
