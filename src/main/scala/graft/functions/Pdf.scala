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
  def writePdf(pages: Seq[String]): Array[Byte] =
    writePdfFiltered(pages, Seq("FlateDecode"))

  /** `writePdf` with an explicit content-stream filter chain, named in
    * DECODE order exactly as a `/Filter` array lists them (so
    * `Seq("ASCII85Decode", "LZWDecode")` stores a85(lzw(content))).
    * Fixture surface for the non-Flate filter paths.
    */
  private[functions] def writePdfFiltered(pages: Seq[String],
      filters: Seq[String]): Array[Byte] = {
    val objs = mutable.ArrayBuffer.empty[String] // 1-based object bodies
    def add(body: String): Int = { objs += body; objs.length }
    val filterEntry = filters match {
      case Seq() => ""
      case Seq(one) => s" /Filter /$one"
      case many => many.map("/" + _).mkString(" /Filter [", " ", "]")
    }

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
      val z = encodeFilters(raw, filters)
      val cId = add(s"<< /Length ${z.length}$filterEntry >>" +
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

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val bos = new ByteArrayOutputStream()
    while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    bos.toByteArray
  }

  // ---------------- stream filters (PDF 32000-1:2008 §7.4) ----------------

  /** LZWDecode — the spec's TIFF variant: MSB-first variable-width codes
    * (9→12 bits), Clear=256, EOD=257, width growth one code early under
    * `/EarlyChange 1` (the default). A truncated stream decodes what it
    * has rather than raising (matching `inflate` above).
    */
  private[functions] def lzwDecode(data: Array[Byte],
      earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val table = mutable.ArrayBuffer.empty[Array[Byte]]
    def reset(): Unit = {
      table.clear()
      var b = 0
      while (b < 256) { table += Array(b.toByte); b += 1 }
      table += null; table += null // 256 = Clear, 257 = EOD
    }
    reset()
    var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    def read(): Int = {
      while (bitCnt < width) {
        if (pos >= data.length) return 257 // truncated: treat as EOD
        bitBuf = (bitBuf << 8) | (data(pos) & 0xff); pos += 1; bitCnt += 8
      }
      bitCnt -= width
      ((bitBuf >>> bitCnt) & ((1 << width) - 1)).toInt
    }
    var code = read()
    while (code != 257) {
      if (code == 256) { reset(); width = 9; prev = null }
      else {
        val entry =
          if (code < table.length && table(code) != null) table(code)
          else if (prev != null && code == table.length) prev :+ prev(0)
          else throw new IllegalArgumentException(s"bad LZW code $code")
        out.write(entry, 0, entry.length)
        if (prev != null && table.length < 4096) {
          table += prev :+ entry(0)
          // decoder is one entry behind the encoder, so the same literal
          // comparison lands on the same position in the code stream
          if (table.length + earlyChange >= (1 << width) && width < 12)
            width += 1
        }
        prev = entry
      }
      code = read()
    }
    out.toByteArray
  }

  /** LZW encoder (fixture twin of `lzwDecode`): dictionary keyed by
    * (prefix code, next byte) — the classic trie-as-pairs shape — with a
    * conservative Clear well before the 12-bit table fills.
    */
  private[functions] def lzwEncode(data: Array[Byte],
      earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        bitCnt -= 8; out.write(((bitBuf >>> bitCnt) & 0xff).toInt)
      }
    }
    val dict = mutable.HashMap.empty[(Int, Byte), Int]
    var nextCode = 258
    emit(256) // leading Clear, as the spec's example streams do
    var w = -1
    var i = 0
    while (i < data.length) {
      val b = data(i)
      if (w < 0) w = b & 0xff
      else dict.get((w, b)) match {
        case Some(c) => w = c
        case None =>
          emit(w)
          val assigned = nextCode
          dict((w, b)) = assigned
          nextCode += 1
          if (assigned + earlyChange >= (1 << width) && width < 12) width += 1
          if (nextCode >= 4093) { // table nearly full: Clear (current width!)
            emit(256); dict.clear(); nextCode = 258; width = 9
          }
          w = b & 0xff
      }
      i += 1
    }
    if (w >= 0) emit(w)
    emit(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  private[functions] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        require(v >= 0, s"bad ASCIIHex char '$c'")
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit: low nibble 0
    out.toByteArray
  }

  private[functions] def asciiHexEncode(data: Array[Byte]): Array[Byte] =
    (data.map(b => f"${b & 0xff}%02x").mkString + ">").getBytes(ISO_8859_1)

  private[functions] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var n = 0
    def flush(count: Int): Unit = { // count = chars present (2..5)
      var j = count
      while (j < 5) { grp(j) = 84; j += 1 } // pad with 'u'
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + grp(k); k += 1 }
      val bytes = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(bytes, 0, count - 1)
      n = 0
    }
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true // '~>' terminator
      else if (c == 'z' && n == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (!c.isWhitespace) {
        require(c >= '!' && c <= 'u', s"bad ASCII85 char '$c'")
        grp(n) = c - '!'; n += 1
        if (n == 5) flush(5)
      }
      i += 1
    }
    if (n > 0) { require(n >= 2, "truncated ASCII85 group"); flush(n) }
    out.toByteArray
  }

  private[functions] def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val rem = math.min(4, data.length - i)
      var v = 0L
      var k = 0
      while (k < 4) {
        v = (v << 8) | (if (k < rem) data(i + k) & 0xff else 0); k += 1
      }
      if (rem == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var j = 4
        while (j >= 0) { cs(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
        sb.appendAll(cs, 0, rem + 1)
      }
      i += rem
    }
    sb.append("~>")
    sb.toString.getBytes(ISO_8859_1)
  }

  private[functions] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      if (l == 128) done = true // EOD
      else if (l < 128) { // literal run of l+1 bytes
        out.write(data, i + 1, math.min(l + 1, data.length - i - 1))
        i += l + 1
      } else { // repeat next byte 257-l times
        if (i + 1 < data.length) {
          var k = 257 - l
          while (k > 0) { out.write(data(i + 1)); k -= 1 }
        }
        i += 1
      }
      i += 1
    }
    out.toByteArray
  }

  private[functions] def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 128)
        run += 1
      if (run >= 3) { out.write(257 - run); out.write(data(i)); i += run }
      else { // literal run up to the next ≥3 repeat (or 128 bytes)
        var j = i + 1
        while (j < data.length && j - i < 128 &&
            !(j + 2 < data.length && data(j) == data(j + 1) &&
              data(j) == data(j + 2))) j += 1
        out.write(j - i - 1)
        out.write(data, i, j - i)
        i = j
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  /** Apply `filters` (DECODE-order names, as a `/Filter` array lists
    * them) in ENCODE order — the writer-side twin of `decodedStream`.
    */
  private[functions] def encodeFilters(raw: Array[Byte],
      filters: Seq[String]): Array[Byte] =
    filters.reverse.foldLeft(raw) { (d, f) =>
      f match {
        case "FlateDecode" => deflate(d)
        case "LZWDecode" => lzwEncode(d)
        case "ASCIIHexDecode" => asciiHexEncode(d)
        case "ASCII85Decode" => ascii85Encode(d)
        case "RunLengthDecode" => runLengthEncode(d)
        case other =>
          throw new IllegalArgumentException(s"no encoder for /$other")
      }
    }

  private val filterArrayPat = """/Filter\s*\[([^\]]*)\]""".r
  private val filterSinglePat = """/Filter\s*/(\w+)""".r

  /** `/Filter` names in decode order (empty = unfiltered). */
  private def streamFilters(dict: String): Seq[String] =
    filterArrayPat.findFirstMatchIn(dict) match {
      case Some(m) =>
        """/(\w+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      case None => filterSinglePat.findFirstMatchIn(dict).map(_.group(1)).toSeq
    }

  private def decodedStream(o: Obj): Array[Byte] = {
    val raw = o.stream.getOrElse(Array.emptyByteArray)
    // predictor-coded Flate/LZW (PNG/TIFF row predictors) would decode to
    // garbage if ignored — raise loudly instead (captured per-cell by
    // pdfPagesSafe); content streams in the wild are predictor-free.
    val predictor = """/Predictor\s+(\d+)""".r.findFirstMatchIn(o.dict)
      .map(_.group(1).toInt).getOrElse(1)
    require(predictor <= 1,
      s"predictor-coded streams unsupported (/Predictor $predictor)")
    val earlyChange = """/EarlyChange\s+(\d+)""".r.findFirstMatchIn(o.dict)
      .map(_.group(1).toInt).getOrElse(1)
    streamFilters(o.dict).foldLeft(raw) { (data, f) =>
      f match {
        case "FlateDecode" | "Fl" => inflate(data)
        case "LZWDecode" | "LZW" => lzwDecode(data, earlyChange)
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
        case "ASCII85Decode" | "A85" => ascii85Decode(data)
        case "RunLengthDecode" | "RL" => runLengthDecode(data)
        case other => throw new IllegalArgumentException(
          s"unsupported stream filter /$other")
      }
    }
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
