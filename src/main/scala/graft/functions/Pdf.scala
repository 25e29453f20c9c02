package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Minimal pure-JVM PDF text extraction (and a matching writer for
  * synthesis/fixtures) backing `document_splitter`'s PDF `page` mode — the
  * reference parses PDFs with per-page metadata via pypdfium2
  * (`/root/reference/pixeltable/functions/document.py:12,180-205`); this
  * covers the uncompressed / FlateDecode subset a JVM-only build can:
  *
  *  - objects located by scanning `N G obj`, stream payloads sized by the
  *    dict's /Length (direct or indirect), so binary stream bytes that
  *    happen to contain keywords can't derail parsing;
  *  - page order from the real page tree (trailer /Root → /Pages → /Kids,
  *    nested inner nodes supported), not file order;
  *  - text from the content-stream operators Tj, TJ, ' and " with literal
  *    strings (nested parens, \-escapes, octal, line continuations) and
  *    hex strings; Td/TD/T* after text on a page break lines;
  *  - no font/ToUnicode machinery: string bytes are taken as UTF-8 (exact
  *    for this writer's output; the common-case approximation for simple
  *    Latin PDFs). Content-stream filters cover the text-bearing set:
  *    FlateDecode, LZWDecode (variable-width MSB-first codes with
  *    /EarlyChange per the spec's TIFF variant), ASCIIHexDecode,
  *    ASCII85Decode, RunLengthDecode — singly or as a /Filter chain.
  *    Encrypted PDFs, object streams (/ObjStm), and predictor-coded
  *    streams are out of scope and raise cleanly (the raise is captured
  *    per-cell by `pdfPagesSafe`).
  */
object Pdf {

  // ---------------- writer ----------------

  /** Escape one UTF-8 byte for a PDF literal string. */
  private def escByte(b: Byte): String = (b & 0xff) match {
    case 0x28 => "\\("
    case 0x29 => "\\)"
    case 0x5c => "\\\\"
    case 0x0a => "\\n"
    case 0x0d => "\\r"
    case 0x09 => "\\t"
    case x if x >= 32 && x <= 126 => x.toChar.toString
    case x => f"\\$x%03o"
  }

  private def literal(s: String): String =
    "(" + s.getBytes(UTF_8).map(escByte).mkString + ")"

  /** Build a PDF whose page i shows pages(i): one Tj per line, Flate-
    * compressed content streams, a balanced (grouped) page tree. The
    * extractor below round-trips it byte-exactly at the text level.
    */
  def writePdf(pages: Seq[String]): Array[Byte] = {
    val objs = mutable.ArrayBuffer.empty[String] // 1-based object bodies
    def add(body: String): Int = { objs += body; objs.length }

    val fontId = add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val pageIds = pages.map { text =>
      val lines = text.split("\n", -1)
      val content = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) content.append("0 -14 Td\n")
        content.append(literal(l)).append(" Tj\n")
      }
      content.append("ET")
      val raw = content.toString.getBytes(UTF_8)
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val bos = new ByteArrayOutputStream()
      while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val z = bos.toByteArray
      val cId = add(s"<< /Length ${z.length} /Filter /FlateDecode >>" +
        "\nstream\n" + new String(z, ISO_8859_1) + "\nendstream")
      add("<< /Type /Page /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontId 0 R >> >> /Contents $cId 0 R >>")
    }
    // group pages under inner /Pages nodes (exercises nested-tree walking)
    val groups = pageIds.grouped(8).toSeq
    val kidIds = groups.map { g =>
      add(s"<< /Type /Pages /Kids [${g.map(i => s"$i 0 R").mkString(" ")}] " +
        s"/Count ${g.length} >>")
    }
    val rootPagesId = add(s"<< /Type /Pages /Kids [${
      kidIds.map(i => s"$i 0 R").mkString(" ")}] /Count ${pages.length} >>")
    val catId = add(s"<< /Type /Catalog /Pages $rootPagesId 0 R >>")

    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = out.length
      out.append(s"${i + 1} 0 obj\n").append(body).append("\nendobj\n")
    }
    val xref = out.length
    out.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    (1 to objs.length).foreach(i => out.append(f"${offsets(i)}%010d 00000 n \n"))
    out.append(s"trailer\n<< /Size ${objs.length + 1} /Root $catId 0 R >>\n")
      .append(s"startxref\n$xref\n%%EOF")
    out.toString.getBytes(ISO_8859_1)
  }

  // ---------------- parser ----------------

  private final case class Obj(dict: String, stream: Option[Array[Byte]])

  private val objStart = """(\d+)\s+(\d+)\s+obj""".r
  private val lengthDirect = """/Length\s+(\d+)(?!\s+\d+\s+R)""".r
  private val lengthRef = """/Length\s+(\d+)\s+\d+\s+R""".r

  /** Balanced `<< ... >>` starting at `i` (which must point at `<<`). */
  private def dictEnd(s: String, i: Int): Int = {
    var depth = 0
    var j = i
    while (j < s.length - 1) {
      if (s.charAt(j) == '<' && s.charAt(j + 1) == '<') { depth += 1; j += 2 }
      else if (s.charAt(j) == '>' && s.charAt(j + 1) == '>') {
        depth -= 1; j += 2
        if (depth == 0) return j
      }
      else if (s.charAt(j) == '(') { // skip strings so )>> inside can't confuse
        var k = j + 1; var d = 1
        while (k < s.length && d > 0) {
          s.charAt(k) match {
            case '\\' => k += 1
            case '('  => d += 1
            case ')'  => d -= 1
            case _    =>
          }
          k += 1
        }
        j = k
      }
      else j += 1
    }
    s.length
  }

  private def parseObjects(bytes: Array[Byte]): Map[Int, Obj] = {
    val s = new String(bytes, ISO_8859_1)
    require(s.startsWith("%PDF"), "not a PDF (missing %PDF header)")
    require(!s.contains("/Encrypt"), "encrypted PDFs not supported")
    val out = mutable.Map.empty[Int, Obj]
    // pass 1: dict-only objects, so indirect /Length refs resolve in pass 2
    val starts = objStart.findAllMatchIn(s).toVector
    def parseAt(m: scala.util.matching.Regex.Match): (Int, String, Int) = {
      val num = m.group(1).toInt
      var i = m.end
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i + 1 < s.length && s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
        val e = dictEnd(s, i)
        (num, s.substring(i, e), e)
      } else (num, "", i)
    }
    val parsed = starts.map(parseAt)
    val dictOf = parsed.map { case (n, d, _) => n -> d }.toMap
    parsed.foreach { case (num, dict, dEnd) =>
      var i = dEnd
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      val stream =
        if (!s.startsWith("stream", i)) None
        else {
          var d = i + "stream".length
          if (d < s.length && s.charAt(d) == '\r') d += 1
          if (d < s.length && s.charAt(d) == '\n') d += 1
          val len = lengthDirect.findFirstMatchIn(dict).map(_.group(1).toInt)
            .orElse(lengthRef.findFirstMatchIn(dict).flatMap(m =>
              dictOf.get(m.group(1).toInt).flatMap(body =>
                """(\d+)""".r.findFirstIn(body).map(_.toInt))))
            .getOrElse { // damaged /Length: fall back to endstream scan
              val e = s.indexOf("endstream", d)
              math.max(0, e - d)
            }
          Some(java.util.Arrays.copyOfRange(bytes, d, math.min(d + len, bytes.length)))
        }
      out(num) = Obj(dict, stream)
    }
    out.toMap
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) return bos.toByteArray // truncated
      bos.write(buf, 0, n)
    }
    inf.end()
    bos.toByteArray
  }

  private def decodedStream(o: Obj): Array[Byte] = {
    val raw = o.stream.getOrElse(Array.emptyByteArray)
    if (o.dict.contains("/FlateDecode")) inflate(raw)
    else if (""" /Filter\s*/""".r.findFirstIn(o.dict.replace("/Filter", " /Filter")).isDefined
      && !o.dict.contains("/FlateDecode"))
      throw new IllegalArgumentException(s"unsupported stream filter in ${o.dict.take(80)}")
    else raw
  }

  private val refPat = """(\d+)\s+\d+\s+R""".r

  /** page object numbers in document order, via the page tree */
  private def pageOrder(objs: Map[Int, Obj]): Seq[Int] = {
    def typeOf(d: String) =
      """/Type\s*/(\w+)""".r.findFirstMatchIn(d).map(_.group(1)).getOrElse("")
    val root = objs.values.find(o => typeOf(o.dict) == "Catalog")
      .getOrElse(throw new IllegalArgumentException("no /Catalog object"))
    val pagesRef = """/Pages\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(root.dict)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException("catalog has no /Pages"))
    val out = mutable.ArrayBuffer.empty[Int]
    def walk(num: Int, depth: Int): Unit = {
      require(depth < 64, "page tree too deep / cyclic")
      objs.get(num).foreach { o =>
        typeOf(o.dict) match {
          case "Page" => out += num
          case _ => // Pages (or untyped inner node): recurse over Kids
            val kids = """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(o.dict)
              .map(_.group(1)).getOrElse("")
            refPat.findAllMatchIn(kids).foreach(m => walk(m.group(1).toInt, depth + 1))
        }
      }
    }
    walk(pagesRef, 0)
    out.toSeq
  }

  /** Chunk bounding box in PDF user space (origin bottom-left, points) —
    * the reference's BoundingBox metadata (`document.py` x1/y1/x2/y2).
    */
  final case class PdfBox(x1: Double, y1: Double, x2: Double, y2: Double) {
    def union(o: PdfBox): PdfBox = PdfBox(math.min(x1, o.x1),
      math.min(y1, o.y1), math.max(x2, o.x2), math.max(y2, o.y2))
  }

  /** Advance width of `t` at font size `size`, Adobe core Helvetica AFM
    * metrics (published character widths, /1000 em) — exact for this
    * writer's output; the documented approximation for foreign fonts
    * (resolving embedded font programs is out of the subset). Non-ASCII
    * falls back to the Helvetica average 556.
    */
  private val helveticaWidths: Array[Int] = Array(
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584)
  private def textWidth(t: CharSequence, size: Double): Double = {
    var w = 0.0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      w += (if (c >= 32 && c <= 126) helveticaWidths(c - 32) else 556)
      i += 1
    }
    w * size / 1000.0
  }

  // Helvetica vertical metrics (ascender 718, descender -207, /1000 em)
  private val Ascent = 0.718
  private val Descent = 0.207

  /** Text-showing operators of one page's (concatenated) content streams. */
  private[functions] def extractContentText(content: Array[Byte]): String =
    extractContentRuns(content)._1

  /** Text plus the union bounding box of the page's shown text, tracking
    * the positioning operators (BT, Tm, Td, TD, T-star, TL, Tf and the
    * quote shortcuts) with Helvetica advance widths. Rotation/scale in Tm
    * and TJ kerning are ignored for the box (translation only) — PDFs from
    * `writePdf` are measured exactly.
    */
  private[functions] def extractContentRuns(
      content: Array[Byte]): (String, Option[PdfBox]) = {
    val s = new String(content, ISO_8859_1)
    val text = new StringBuilder // latin1 chars = raw bytes
    val pending = new StringBuilder
    var havePending = false
    var seenText = false
    var i = 0
    // text-position state (translation components only)
    var lineX = 0.0; var lineY = 0.0 // start of the current line
    var curX = 0.0; var curY = 0.0   // current show position
    var size = 12.0                  // last Tf size
    var leading = 0.0                // TL / TD-set leading for T* and '/"
    val nums = new scala.collection.mutable.ArrayBuffer[Double](8)
    var box: Option[PdfBox] = None
    def flushShow(): Unit = {
      if (pending.nonEmpty) {
        val w = textWidth(pending, size)
        val b = PdfBox(curX, curY - Descent * size, curX + w, curY + Ascent * size)
        box = Some(box.fold(b)(_.union(b)))
        curX += w
      }
      text.append(pending); pending.clear(); havePending = false; seenText = true
    }
    def nextLine(): Unit = {
      lineY -= leading; curX = lineX; curY = lineY
    }
    def newline(): Unit = if (seenText) text.append('\n')
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '%' => // comment to end of line
          while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
        case '(' => // literal string
          i += 1
          var depth = 1
          while (i < s.length && depth > 0) {
            s.charAt(i) match {
              case '\\' if i + 1 < s.length =>
                s.charAt(i + 1) match {
                  case 'n' => pending.append('\n'); i += 2
                  case 'r' => pending.append('\r'); i += 2
                  case 't' => pending.append('\t'); i += 2
                  case 'b' => pending.append('\b'); i += 2
                  case 'f' => pending.append('\f'); i += 2
                  case '\n' => i += 2 // line continuation
                  case '\r' =>
                    i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
                  case d if d >= '0' && d <= '7' =>
                    var v = 0; var n = 0; i += 1
                    while (n < 3 && i < s.length &&
                        s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                      v = v * 8 + (s.charAt(i) - '0'); i += 1; n += 1
                    }
                    pending.append((v & 0xff).toChar)
                  case other => pending.append(other); i += 2
                }
              case '(' => depth += 1; pending.append('('); i += 1
              case ')' =>
                depth -= 1
                if (depth > 0) pending.append(')')
                i += 1
              case ch => pending.append(ch); i += 1
            }
          }
          havePending = true
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' => // hex string
          i += 1
          val hex = new StringBuilder
          while (i < s.length && s.charAt(i) != '>') {
            val h = s.charAt(i)
            if (!h.isWhitespace) hex.append(h)
            i += 1
          }
          i += 1
          if (hex.length % 2 == 1) hex.append('0')
          hex.toString.grouped(2).foreach(h =>
            pending.append(Integer.parseInt(h, 16).toChar))
          havePending = true
        case '<' => i += 2 // '<<' inline dict (BDC etc.): names/nums skip below
        case '[' | ']' | '{' | '}' | '>' => i += 1
        case w if w.isWhitespace => i += 1
        case '/' => // name token
          i += 1
          while (i < s.length && !isDelim(s.charAt(i))) i += 1
        case _ => // number or operator token
          val start = i
          while (i < s.length && !isDelim(s.charAt(i))) i += 1
          s.substring(start, i) match {
            case "Tj" | "TJ" if havePending => flushShow(); nums.clear()
            case "'" =>
              newline(); nextLine()
              if (havePending) flushShow() else seenText = true
              nums.clear()
            case "\"" =>
              newline(); nextLine()
              if (havePending) flushShow() else seenText = true
              nums.clear()
            case op @ ("Td" | "TD") =>
              pending.clear(); havePending = false; newline()
              if (nums.length >= 2) {
                val (tx, ty) = (nums(nums.length - 2), nums(nums.length - 1))
                lineX += tx; lineY += ty
                if (op == "TD") leading = -ty
              }
              curX = lineX; curY = lineY
              nums.clear()
            case "T*" =>
              pending.clear(); havePending = false; newline()
              nextLine()
              nums.clear()
            case "TL" =>
              if (nums.nonEmpty) leading = nums.last
              pending.clear(); havePending = false; nums.clear()
            case "Tf" =>
              if (nums.nonEmpty) size = nums.last
              pending.clear(); havePending = false; nums.clear()
            case "Tm" =>
              pending.clear(); havePending = false
              if (nums.length >= 6) { // translation components only
                lineX = nums(nums.length - 2); lineY = nums(nums.length - 1)
                curX = lineX; curY = lineY
              }
              nums.clear()
            case "BT" =>
              pending.clear(); havePending = false
              lineX = 0; lineY = 0; curX = 0; curY = 0
              nums.clear()
            case "ET" => pending.clear(); havePending = false; nums.clear()
            case t if t.nonEmpty && !t.head.isDigit && t.head != '-' && t.head != '.' =>
              // any other operator consumes its (non-string) operands
              pending.clear(); havePending = false; nums.clear()
            case n => // number operand: keep pending strings (e.g. TJ kerning)
              try nums += n.toDouble catch { case _: NumberFormatException => () }
          }
      }
    }
    (new String(text.toString.getBytes(ISO_8859_1), UTF_8), box)
  }

  private def isDelim(c: Char): Boolean =
    c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

  private def pageContents(pdf: Array[Byte]): Seq[Array[Byte]] = {
    val objs = parseObjects(pdf)
    pageOrder(objs).map { p =>
      val dict = objs(p).dict
      val contentRefs =
        """/Contents\s*\[([^\]]*)\]""".r.findFirstMatchIn(dict)
          .map(m => refPat.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq)
          .orElse("""/Contents\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(dict)
            .map(m => Seq(m.group(1).toInt)))
          .getOrElse(Seq.empty)
      contentRefs.flatMap(objs.get).map(decodedStream)
        .foldLeft(Array.emptyByteArray)(_ ++ _)
    }
  }

  /** Per-page extracted text, document order. */
  def extractPages(pdf: Array[Byte]): Seq[String] =
    pageContents(pdf).map(extractContentText)

  /** Per-page text + bounding box of the page's shown text (None for a
    * textless page) — the reference's PDF `bounding_box` chunk metadata for
    * page mode (`document.py` BoundingBox x1/y1/x2/y2, PDF user space).
    */
  def extractPagesWithBoxes(pdf: Array[Byte]): Seq[(String, Option[PdfBox])] =
    pageContents(pdf).map(extractContentRuns)

  // ---------------- Spark surface ----------------

  /** text → single-column PDF, `charsPerPage` characters per page (the
    * SQL-reproducible pagination q96's oracle mirrors with substr()).
    * Empty text yields a one-page PDF of the empty string, matching
    * `sequence(1, greatest(length, 1), n)` chunking semantics.
    */
  def textToPdf(text: Column, charsPerPage: Int): Column = {
    require(charsPerPage > 0)
    val f = udf { (t: String) =>
      if (t == null) null
      else {
        // code-point slicing, matching Spark's/DuckDB's substr character
        // semantics (String.grouped would miscount on surrogate pairs)
        val pages =
          if (t.isEmpty) Seq("")
          else {
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < t.length) {
              val remaining = t.codePointCount(i, t.length)
              val end = t.offsetByCodePoints(i, math.min(charsPerPage, remaining))
              out += t.substring(i, end)
              i = end
            }
            out.toSeq
          }
        writePdf(pages)
      }
    }
    f(text)
  }

  /** PDF bytes → array of per-page text (document_splitter separator='page'
    * over a real PDF; pair with posexplode for 1-based page numbers).
    */
  val pdfPages = udf { (bytes: Array[Byte]) =>
    if (bytes == null) Seq.empty[String] else extractPages(bytes)
  }

  /** Cell result for the error-capturing page split: pages, or a per-cell
    * error marker (`errortype`/`errormsg`, the reference's cellmd shape).
    */
  final case class PdfPagesCell(pages: Seq[String], errortype: String,
      errormsg: String)

  /** PDF bytes → pages with PER-CELL error capture (reference
    * `on_error='ignore'`, `exec/exec_context.py:15`): a rejected document —
    * encrypted (`errortype='encrypted'`), LZW, malformed — carries its
    * error in the cell instead of failing the whole task, so one bad file
    * in a 100 TB corpus doesn't kill the batch. The raising variant
    * `pdfPages` stays for oracle-gated pipelines where an error must be
    * loud.
    */
  val pdfPagesSafe = udf { (bytes: Array[Byte]) =>
    if (bytes == null) PdfPagesCell(Seq.empty, null, null)
    else
      try PdfPagesCell(extractPages(bytes), null, null)
      catch {
        case e: Exception =>
          val msg = Option(e.getMessage).getOrElse("")
          val et =
            if (msg.contains("encrypted")) "encrypted"
            else e.getClass.getSimpleName
          PdfPagesCell(null, et, msg)
      }
  }

  /** One page chunk with its bounding box (null coords for textless pages) —
    * the chunk-metadata row shape of the reference's
    * `document_splitter(..., metadata='page,bounding_box')` on PDFs.
    */
  final case class PageChunk(text: String, x1: Option[Double],
      y1: Option[Double], x2: Option[Double], y2: Option[Double])

  /** PDF bytes → array of (text, x1, y1, x2, y2) page chunks. */
  val pdfPageBoxes = udf { (bytes: Array[Byte]) =>
    if (bytes == null) Seq.empty[PageChunk]
    else extractPagesWithBoxes(bytes).map {
      case (t, Some(b)) => PageChunk(t, Some(b.x1), Some(b.y1), Some(b.x2), Some(b.y2))
      case (t, None) => PageChunk(t, None, None, None, None)
    }
  }
}
