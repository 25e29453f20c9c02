package graft.functions

import java.awt.{BasicStroke, Color, Graphics2D, RenderingHints}
import java.awt.geom.{AffineTransform, Area, Path2D}
import java.awt.image.BufferedImage
import java.nio.charset.StandardCharsets.ISO_8859_1

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, udf}

/** PDF page rasterization — the reference's `document_splitter`
  * `elements=['image']` page-render surface
  * (`/root/reference/pixeltable/functions/document.py:120-146,488`:
  * `page.render().to_pil()` via pdfium, default scale 1.0 = 72 dpi).
  *
  * This is a from-scratch content-stream interpreter per ISO 32000-1
  * chapter 8/9 semantics: a PDF value lexer, a graphics-state machine
  * (CTM, colors, clip, text state), path construction/painting with both
  * winding rules, stroking, image/form XObjects, inline images, and text
  * rendering. The raster backend is headless Java2D (public JDK, the same
  * stance as `javax.imageio` decode elsewhere in this package); all
  * PDF-specific semantics — operator dispatch, coordinate systems, color
  * spaces, fonts, resource resolution — are implemented here.
  *
  * Text rendering tiers (documented, not silent):
  *  - Type3 fonts: EXACT — glyph procedures are content streams and run
  *    through this same interpreter (the oracle-gated path).
  *  - Embedded TrueType (FontFile2, incl. Type0/Identity-H by glyph id)
  *    and Type1 (FontFile, re-wrapped as PFB): loaded via
  *    `java.awt.Font.createFont`; positioning always uses the PDF
  *    /Widths//W arrays (authoritative), not the font's own metrics.
  *  - Embedded CFF (FontFile3: Type1C / CIDFontType0C): EXACT — Type 2
  *    charstrings interpret directly to `Path2D` via `Cff`, the same
  *    interpreter-exact tier as Type3.
  *  - Non-embedded fonts: substituted with a JDK logical family chosen
  *    from the BaseFont name (the poppler/pdfium substitution
  *    strategy); recorded in `unsupported`.
  *
  * Scanned/compressed images decode for real: CCITT G3/G4 via
  * `CcittFax`, JBIG2 generic + symbol/text regions (incl. /JBIG2Globals
  * dictionaries) via `Jbig2`, JPEG 2000 lossless via `Jpeg2000`
  * (irreversible 9/7 and other out-of-scope codestream features render
  * as a named `jpx-...` skip in the page's `unsupported` list, never a
  * page failure). Tiling patterns tile under ARBITRARY matrices
  * (rotation/shear via `TiledPatternPaint`); axial and radial shadings
  * solve exactly in shading space under any affine base transform.
  */
object PdfRender {

  // ===================== PDF values =====================

  sealed trait PVal
  final case class PNum(v: Double) extends PVal
  final case class PName(v: String) extends PVal
  final case class PStr(bytes: Array[Byte]) extends PVal
  final case class PArr(items: Vector[PVal]) extends PVal
  final case class PDict(m: Map[String, PVal]) extends PVal
  final case class PRef(num: Int) extends PVal
  final case class PBool(v: Boolean) extends PVal
  case object PNull extends PVal
  /** A content-stream operator token (also `obj`/`R`-less bare words). */
  final case class POp(name: String) extends PVal

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** One-pass lexer over an ISO-8859-1 view of PDF syntax (dict bodies or
    * content streams). Numbers followed by `int R` lex as [[PRef]].
    */
  final class Lexer(val s: String) {
    var i = 0

    def skipWs(): Unit = {
      while (i < s.length) {
        val c = s.charAt(i)
        if (isWs(c)) i += 1
        else if (c == '%') { // comment to EOL
          while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r')
            i += 1
        } else return
      }
    }

    def atEnd: Boolean = { skipWs(); i >= s.length }

    private def name(): PName = { // i at '/'
      i += 1
      val b = new StringBuilder
      while (i < s.length && !isWs(s.charAt(i)) && !isDelim(s.charAt(i))) {
        val c = s.charAt(i)
        if (c == '#' && i + 2 < s.length) {
          val h = Integer.parseInt(s.substring(i + 1, i + 3), 16)
          b.append(h.toChar); i += 3
        } else { b.append(c); i += 1 }
      }
      PName(b.toString)
    }

    private def literalString(): PStr = { // i at '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      i += 1
      while (i < s.length && depth > 0) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          val n = s.charAt(i + 1)
          n match {
            case 'n' => out.write('\n'); i += 2
            case 'r' => out.write('\r'); i += 2
            case 't' => out.write('\t'); i += 2
            case 'b' => out.write('\b'); i += 2
            case 'f' => out.write('\f'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' =>
              i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < s.length && s.charAt(i) >= '0' &&
                s.charAt(i) <= '7') { v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1 }
              out.write(v & 0xff)
            case other => out.write(other.toInt & 0xff); i += 2
          }
        } else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) out.write(c.toInt & 0xff)
          i += 1
        }
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PStr = { // i at '<', not '<<'
      i += 1
      val b = new StringBuilder
      while (i < s.length && s.charAt(i) != '>') {
        val c = s.charAt(i)
        if (!isWs(c)) b.append(c)
        i += 1
      }
      i += 1 // '>'
      if (b.length % 2 == 1) b.append('0')
      val out = new Array[Byte](b.length / 2)
      var k = 0
      while (k < out.length) {
        out(k) = Integer.parseInt(b.substring(k * 2, k * 2 + 2), 16).toByte
        k += 1
      }
      PStr(out)
    }

    private def numberOrRef(): PVal = {
      val st = i
      if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
      var digits = false
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) {
        if (s.charAt(i).isDigit) digits = true
        i += 1
      }
      val txt = s.substring(st, i)
      if (!digits) return POp(txt) // stray '-' etc.
      val v = txt.toDouble
      // int WS int WS 'R' → reference
      if (v >= 0 && v == v.floor && !txt.contains('.')) {
        val save = i
        skipWs()
        val g0 = i
        while (i < s.length && s.charAt(i).isDigit) i += 1
        if (i > g0) {
          skipWs()
          if (i < s.length && s.charAt(i) == 'R' &&
            (i + 1 >= s.length || isWs(s.charAt(i + 1)) ||
              isDelim(s.charAt(i + 1)))) {
            i += 1
            return PRef(v.toInt)
          }
        }
        i = save
      }
      PNum(v)
    }

    /** Next value or operator. Call `atEnd` first. */
    def next(): PVal = {
      skipWs()
      val c = s.charAt(i)
      if (c == '/') name()
      else if (c == '(') literalString()
      else if (c == '<') {
        if (i + 1 < s.length && s.charAt(i + 1) == '<') { i += 2; dict() }
        else hexString()
      } else if (c == '[') {
        i += 1
        val items = Vector.newBuilder[PVal]
        skipWs()
        while (i < s.length && s.charAt(i) != ']') {
          items += next(); skipWs()
        }
        i += 1
        PArr(items.result())
      } else if (c == ']' || c == '>' || c == '}' || c == ')') {
        i += 1 // stray closer: skip defensively
        if (atEnd) PNull else next()
      } else if (c == '{') { // PostScript-calc braces: skip
        i += 1
        if (atEnd) PNull else next()
      }
      else if (c.isDigit || c == '+' || c == '-' || c == '.') numberOrRef()
      else { // bare word: operator / true / false / null
        val st = i
        while (i < s.length && !isWs(s.charAt(i)) && !isDelim(s.charAt(i)))
          i += 1
        s.substring(st, i) match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case w => POp(w)
        }
      }
    }

    private def dict(): PDict = { // after '<<'
      val m = Map.newBuilder[String, PVal]
      skipWs()
      while (i + 1 < s.length && !(s.charAt(i) == '>' && s.charAt(i + 1) == '>')) {
        next() match {
          case PName(k) =>
            skipWs()
            if (i + 1 < s.length &&
              !(s.charAt(i) == '>' && s.charAt(i + 1) == '>'))
              m += k -> next()
          case _ => // stray token inside dict: skip
        }
        skipWs()
      }
      i += 2
      PDict(m.result())
    }

    /** Inline-image payload: after the `ID` operator, one whitespace byte,
      * then raw bytes up to (whitespace +) `EI` at a token boundary.
      * `len` (from /L) short-circuits the scan.
      */
    def inlineImageData(len: Option[Int]): Array[Byte] = {
      if (i < s.length && isWs(s.charAt(i))) i += 1
      val start = i
      len match {
        case Some(n) if n >= 0 && start + n <= s.length =>
          i = start + n
          skipWs()
          if (s.startsWith("EI", i)) i += 2
          s.substring(start, start + n).getBytes(ISO_8859_1)
        case _ =>
          var j = start
          var end = -1
          while (end < 0 && j < s.length - 1) {
            if (s.charAt(j) == 'E' && s.charAt(j + 1) == 'I' &&
              (j == start || isWs(s.charAt(j - 1))) &&
              (j + 2 >= s.length || isWs(s.charAt(j + 2)) ||
                isDelim(s.charAt(j + 2)))) end = j
            j += 1
          }
          require(end >= 0, "inline image: no EI terminator")
          i = end + 2
          val stop = if (end > start && isWs(s.charAt(end - 1))) end - 1 else end
          s.substring(start, stop).getBytes(ISO_8859_1)
      }
    }
  }

  /** Parse a standalone PDF value from a string (object body). */
  private[functions] def parseValue(body: String): PVal = {
    val lx = new Lexer(body)
    if (lx.atEnd) PNull else lx.next()
  }

  // ===================== document resolver =====================

  private[functions] final class Doc(val objs: Map[Int, Pdf.Obj]) {
    private val cache = mutable.Map.empty[Int, PVal]

    def objVal(n: Int): PVal = cache.getOrElseUpdate(n,
      objs.get(n).map(o => parseValue(o.dict)).getOrElse(PNull))

    @annotation.tailrec
    def resolve(v: PVal): PVal = v match {
      case PRef(n) => resolve(objVal(n))
      case other => other
    }

    /** Decoded stream of an indirect stream object. */
    def streamOf(v: PVal): Option[Array[Byte]] = v match {
      case PRef(n) =>
        objs.get(n).filter(_.stream.isDefined).map(Pdf.decodedStream)
      case _ => None
    }

    /** Raw (undecoded beyond non-DCT prefix filters) stream — for
      * DCTDecode passthrough to ImageIO.
      */
    def rawObj(v: PVal): Option[Pdf.Obj] = v match {
      case PRef(n) => objs.get(n)
      case _ => None
    }
  }

  private def dGet(doc: Doc, d: PDict, k: String): Option[PVal] =
    d.m.get(k).map(doc.resolve)
  private def dNum(doc: Doc, d: PDict, k: String, dflt: Double): Double =
    dGet(doc, d, k) match { case Some(PNum(v)) => v; case _ => dflt }
  private def dName(doc: Doc, d: PDict, k: String): Option[String] =
    dGet(doc, d, k) match { case Some(PName(n)) => Some(n); case _ => None }
  private def dDict(doc: Doc, d: PDict, k: String): Option[PDict] =
    dGet(doc, d, k) match { case Some(x: PDict) => Some(x); case _ => None }
  private def dArr(doc: Doc, d: PDict, k: String): Option[Vector[PVal]] =
    dGet(doc, d, k) match { case Some(PArr(a)) => Some(a); case _ => None }
  private def num(v: PVal): Double = v match {
    case PNum(x) => x
    case _ => 0.0
  }

  // ===================== fonts =====================

  private sealed trait FontRec {
    def widths: Map[Int, Double] // code → advance in text units (/1000 ≡ 1 em)
    def defaultWidth: Double
    def twoByte: Boolean
  }

  private final case class Type3Font(
      matrix: AffineTransform,
      charProcs: Map[String, PVal], // glyph name → stream ref
      encoding: Map[Int, String],
      widths: Map[Int, Double], // GLYPH-space widths (per spec for Type3)
      resources: Option[PDict],
      defaultWidth: Double) extends FontRec {
    val twoByte = false
  }

  private final case class OutlineFont(
      awt: Option[java.awt.Font], // size-1000 font, None → skip shapes
      byGlyphId: Boolean, // Type0/Identity-H: codes are glyph indices
      widths: Map[Int, Double],
      defaultWidth: Double,
      twoByte: Boolean,
      toUnicode: Map[Int, Int],
      diffNames: Map[Int, String],
      symbolic: Boolean,
      cff: Option[Cff.Font] = None // FontFile3: interpreter-exact path
  ) extends FontRec

  /** Small Adobe-Glyph-List subset: the names /Differences arrays use in
    * practice for Latin text (letters map to themselves; the rest is the
    * ASCII punctuation/digit block).
    */
  private val glyphNameToChar: Map[String, Int] = {
    val punct = Map(
      "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"',
      "numbersign" -> '#', "dollar" -> '$', "percent" -> '%',
      "ampersand" -> '&', "quotesingle" -> '\'', "parenleft" -> '(',
      "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
      "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
      "colon" -> ':', "semicolon" -> ';', "less" -> '<', "equal" -> '=',
      "greater" -> '>', "question" -> '?', "at" -> '@',
      "bracketleft" -> '[', "backslash" -> '\\', "bracketright" -> ']',
      "asciicircum" -> '^', "underscore" -> '_', "grave" -> '`',
      "braceleft" -> '{', "bar" -> '|', "braceright" -> '}',
      "asciitilde" -> '~')
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine").zipWithIndex.map { case (n, i) => n -> ('0' + i) }
    val letters = (('a' to 'z') ++ ('A' to 'Z')).map(c => c.toString -> c.toInt)
    (punct.view.mapValues(_.toInt) ++ digits.map { case (k, v) => k -> v } ++
      letters).toMap
  }

  private def glyphNameCp(n: String): Option[Int] =
    glyphNameToChar.get(n).orElse {
      if (n.startsWith("uni") && n.length >= 7)
        scala.util.Try(Integer.parseInt(n.substring(3, 7), 16)).toOption
      else None
    }

  /** /Encoding /Differences → code → glyph name. */
  private def differences(doc: Doc, enc: PDict): Map[Int, String] =
    dArr(doc, enc, "Differences").map { arr =>
      val out = Map.newBuilder[Int, String]
      var code = 0
      arr.foreach {
        case PNum(v) => code = v.toInt
        case PName(n) => out += code -> n; code += 1
        case _ =>
      }
      out.result()
    }.getOrElse(Map.empty)

  /** ToUnicode CMap: bfchar/bfrange src → first UTF-16 code unit. */
  private def parseToUnicode(bytes: Array[Byte]): Map[Int, Int] = {
    val s = new String(bytes, ISO_8859_1)
    val out = Map.newBuilder[Int, Int]
    def hexAt(h: String): Int = Integer.parseInt(h, 16)
    val bfchar = """beginbfchar(.*?)endbfchar""".r
    val pair = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
    bfchar.findAllMatchIn(s.replace("\n", " ")).foreach { m =>
      pair.findAllMatchIn(m.group(1)).foreach { p =>
        out += hexAt(p.group(1)) -> hexAt(p.group(2).take(4))
      }
    }
    val bfrange = """beginbfrange(.*?)endbfrange""".r
    val triple = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
    bfrange.findAllMatchIn(s.replace("\n", " ")).foreach { m =>
      triple.findAllMatchIn(m.group(1)).foreach { t =>
        val lo = hexAt(t.group(1)); val hi = hexAt(t.group(2))
        val dst = hexAt(t.group(3).take(4))
        var c = lo
        while (c <= hi && c - lo < 65536) { out += c -> (dst + c - lo); c += 1 }
      }
    }
    out.result()
  }

  /** CIDFont /W array: [ c [w1 w2 ...] | cFirst cLast w ]* → code → /1000. */
  private def cidWidths(doc: Doc, arr: Vector[PVal]): Map[Int, Double] = {
    val out = Map.newBuilder[Int, Double]
    var i = 0
    while (i < arr.length) {
      doc.resolve(arr(i)) match {
        case PNum(c0) if i + 1 < arr.length =>
          doc.resolve(arr(i + 1)) match {
            case PArr(ws) =>
              ws.zipWithIndex.foreach { case (w, k) =>
                out += (c0.toInt + k) -> num(doc.resolve(w)) / 1000.0
              }
              i += 2
            case PNum(c1) if i + 2 < arr.length =>
              val w = num(doc.resolve(arr(i + 2))) / 1000.0
              var c = c0.toInt
              while (c <= c1.toInt && c - c0.toInt < 65536) { out += c -> w; c += 1 }
              i += 3
            case _ => i += 2
          }
        case _ => i += 1
      }
    }
    out.result()
  }

  /** Wrap a PDF /FontFile (raw Type1: Length1 cleartext + Length2 binary +
    * Length3 trailer) into the PFB segment format `Font.createFont` reads.
    */
  private def type1ToPfb(data: Array[Byte], l1: Int, l2: Int): Array[Byte] = {
    require(l1 > 0 && l2 > 0 && l1 + l2 <= data.length, "bad Type1 lengths")
    val out = new java.io.ByteArrayOutputStream()
    def seg(t: Int, b: Array[Byte]): Unit = {
      out.write(0x80); out.write(t)
      out.write(b.length & 0xff); out.write((b.length >> 8) & 0xff)
      out.write((b.length >> 16) & 0xff); out.write((b.length >> 24) & 0xff)
      out.write(b)
    }
    seg(1, java.util.Arrays.copyOfRange(data, 0, l1))
    seg(2, java.util.Arrays.copyOfRange(data, l1, l1 + l2))
    val trailer =
      ("0" * 64 + "\n").*(8) + "cleartomark\n"
    seg(1, trailer.getBytes(ISO_8859_1))
    out.write(0x80); out.write(3)
    out.toByteArray
  }

  /** BaseFont-name → substituted JDK logical font (size 1000). */
  private def substituteFont(baseName: String): java.awt.Font = {
    val n = baseName.toLowerCase
    val family =
      if (n.contains("courier") || n.contains("mono")) java.awt.Font.MONOSPACED
      else if (n.contains("times") || n.contains("serif") ||
        n.contains("roman") || n.contains("georgia") ||
        n.contains("garamond") || n.contains("book")) java.awt.Font.SERIF
      else java.awt.Font.SANS_SERIF
    var style = java.awt.Font.PLAIN
    if (n.contains("bold")) style |= java.awt.Font.BOLD
    if (n.contains("italic") || n.contains("oblique"))
      style |= java.awt.Font.ITALIC
    new java.awt.Font(family, style, 1000)
  }

  private def loadFont(doc: Doc, fd: PDict,
      notes: mutable.Set[String]): FontRec = {
    val subtype = dName(doc, fd, "Subtype").getOrElse("")
    if (subtype == "Type3") {
      val fm = dArr(doc, fd, "FontMatrix") match {
        case Some(a) if a.length == 6 =>
          new AffineTransform(num(a(0)), num(a(1)), num(a(2)), num(a(3)),
            num(a(4)), num(a(5)))
        case _ => new AffineTransform(0.001, 0, 0, 0.001, 0, 0)
      }
      val procs = dDict(doc, fd, "CharProcs")
        .map(_.m) // keep refs unresolved: streams
        .getOrElse(Map.empty)
      val enc = dDict(doc, fd, "Encoding").map(differences(doc, _))
        .getOrElse(Map.empty)
      val first = dNum(doc, fd, "FirstChar", 0).toInt
      val widths = dArr(doc, fd, "Widths").map { a =>
        a.zipWithIndex.map { case (w, i) =>
          (first + i) -> num(doc.resolve(w)) // GLYPH space (FontMatrix maps)
        }.toMap
      }.getOrElse(Map.empty)
      Type3Font(fm, procs, enc, widths, dDict(doc, fd, "Resources"), 0.0)
    } else if (subtype == "Type0") {
      val desc = dArr(doc, fd, "DescendantFonts")
        .flatMap(_.headOption).map(doc.resolve) match {
        case Some(d: PDict) => d
        case _ => PDict(Map.empty)
      }
      val dw = dNum(doc, desc, "DW", 1000.0) / 1000.0
      val w = dArr(doc, desc, "W").map(cidWidths(doc, _)).getOrElse(Map.empty)
      val toUni = fd.m.get("ToUnicode").flatMap(doc.streamOf)
        .map(parseToUnicode).getOrElse(Map.empty)
      val fontDesc = dDict(doc, desc, "FontDescriptor")
      val cff = fontDesc.flatMap(loadCff(doc, _, notes))
      val awt =
        if (cff.isDefined) None else fontDesc.flatMap(loadEmbedded(doc, _, notes))
      val sub = cff.isEmpty && awt.isEmpty
      if (sub) notes += "font-substituted"
      OutlineFont(
        awt.orElse(Some(substituteFont(
          dName(doc, fd, "BaseFont").getOrElse("")))),
        byGlyphId = !sub, // Identity-H codes are glyph ids in the embedded file
        widths = w, defaultWidth = dw, twoByte = true,
        toUnicode = toUni, diffNames = Map.empty, symbolic = false,
        cff = cff)
    } else { // Type1 / TrueType / MMType1
      val first = dNum(doc, fd, "FirstChar", 0).toInt
      val widths = dArr(doc, fd, "Widths").map { a =>
        a.zipWithIndex.map { case (w, i) =>
          (first + i) -> num(doc.resolve(w)) / 1000.0
        }.toMap
      }.getOrElse(Map.empty)
      val fontDesc = dDict(doc, fd, "FontDescriptor")
      val mw = fontDesc.map(d => dNum(doc, d, "MissingWidth", 0.0) / 1000.0)
        .getOrElse(0.0)
      val flags = fontDesc.map(d => dNum(doc, d, "Flags", 0).toInt).getOrElse(0)
      val diffs = dGet(doc, fd, "Encoding") match {
        case Some(e: PDict) => differences(doc, e)
        case _ => Map.empty[Int, String]
      }
      val toUni = fd.m.get("ToUnicode").flatMap(doc.streamOf)
        .map(parseToUnicode).getOrElse(Map.empty)
      val cff = fontDesc.flatMap(loadCff(doc, _, notes))
      val awt =
        if (cff.isDefined) None else fontDesc.flatMap(loadEmbedded(doc, _, notes))
      if (cff.isEmpty && awt.isEmpty) notes += "font-substituted"
      OutlineFont(
        awt.orElse(Some(substituteFont(
          dName(doc, fd, "BaseFont").getOrElse("")))),
        byGlyphId = false, widths = widths, defaultWidth = mw,
        twoByte = false, toUnicode = toUni, diffNames = diffs,
        symbolic = (flags & 4) != 0 && awt.nonEmpty, cff = cff)
    }
  }

  private def loadEmbedded(doc: Doc, fontDesc: PDict,
      notes: mutable.Set[String]): Option[java.awt.Font] = {
    def mk(kind: Int, bytes: Array[Byte]): Option[java.awt.Font] =
      try Some(java.awt.Font.createFont(kind,
        new java.io.ByteArrayInputStream(bytes)).deriveFont(1000f))
      catch { case _: Exception => notes += "font-load-failed"; None }
    fontDesc.m.get("FontFile2").flatMap { ref =>
      doc.streamOf(ref).flatMap(b => mk(java.awt.Font.TRUETYPE_FONT, b))
    }.orElse(fontDesc.m.get("FontFile").flatMap { ref =>
      doc.rawObj(ref).flatMap { o =>
        val d = parseValue(o.dict) match { case x: PDict => x; case _ => PDict(Map.empty) }
        val data = Pdf.decodedStream(o)
        val l1 = dNum(doc, d, "Length1", 0).toInt
        val l2 = dNum(doc, d, "Length2", 0).toInt
        try mk(java.awt.Font.TYPE1_FONT, type1ToPfb(data, l1, l2))
        catch { case _: Exception => notes += "font-load-failed"; None }
      }
    }).orElse {
      if (fontDesc.m.contains("FontFile3")) notes += "cff-load-failed"
      None
    }
  }

  /** `/FontFile3` (bare CFF: Type1C / CIDFontType0C) via the direct
    * Type 2 interpreter in `Cff` — the interpreter-exact glyph tier.
    */
  private def loadCff(doc: Doc, fontDesc: PDict,
      notes: mutable.Set[String]): Option[Cff.Font] =
    fontDesc.m.get("FontFile3").flatMap { ref =>
      doc.streamOf(ref).flatMap { bytes =>
        try Some(Cff.parse(bytes))
        catch {
          case _: Exception => notes += "cff-load-failed"; None
        }
      }
    }

  // ===================== images =====================

  private def cmykToRgb(c: Double, m: Double, y: Double, k: Double): Int = {
    def ch(v: Double) = math.max(0, math.min(255, math.round(255 * v))).toInt
    (ch((1 - c) * (1 - k)) << 16) | (ch((1 - m) * (1 - k)) << 8) |
      ch((1 - y) * (1 - k))
  }

  /** Color-space descriptor for image sample interpretation. */
  private sealed trait Cs { def comps: Int }
  private case object CsGray extends Cs { val comps = 1 }
  private case object CsRgb extends Cs { val comps = 3 }
  private case object CsCmyk extends Cs { val comps = 4 }
  private final case class CsIndexed(base: Cs, palette: Array[Byte])
      extends Cs { val comps = 1 }
  /** Separation/DeviceN: tint components map through the tint-transform
    * function (types 0/2/3/4) into the alternate space.
    */
  private final case class CsTint(nIn: Int,
      fn: Seq[Double] => Seq[Double], alt: Cs) extends Cs {
    val comps: Int = nIn
  }

  private def colorSpaceOf(doc: Doc, v: PVal, res: PDict,
      notes: mutable.Set[String]): Cs = doc.resolve(v) match {
    case PName(n) => n match {
      case "DeviceRGB" | "CalRGB" | "RGB" => CsRgb
      case "DeviceGray" | "CalGray" | "G" => CsGray
      case "DeviceCMYK" | "CMYK" => CsCmyk
      case "I" | "Indexed" => CsGray // abbreviation misuse guard
      case other =>
        // named space: look up in resources /ColorSpace
        dDict(doc, res, "ColorSpace").flatMap(_.m.get(other)) match {
          case Some(x) => colorSpaceOf(doc, x, PDict(Map.empty), notes)
          case None => notes += s"colorspace-$other"; CsRgb
        }
    }
    case PArr(items) if items.nonEmpty =>
      doc.resolve(items.head) match {
        case PName("ICCBased") =>
          val n = items.lift(1).flatMap(r => doc.rawObj(r)).map { o =>
            parseValue(o.dict) match {
              case d: PDict => dNum(doc, d, "N", 3).toInt
              case _ => 3
            }
          }.getOrElse(3)
          if (n == 1) CsGray else if (n == 4) CsCmyk else CsRgb
        case PName("Indexed") | PName("I") if items.length >= 4 =>
          val base = colorSpaceOf(doc, items(1), res, notes)
          val lookup = doc.resolve(items(3)) match {
            case PStr(b) => b
            case _ => doc.streamOf(items(3)).getOrElse(Array.emptyByteArray)
          }
          CsIndexed(base, lookup)
        case PName("Separation") | PName("DeviceN") if items.length >= 4 =>
          // [/Separation name alt fn] | [/DeviceN [names] alt fn]
          val nIn = doc.resolve(items(1)) match {
            case PArr(names) => names.length
            case _ => 1
          }
          val alt = colorSpaceOf(doc, items(2), res, notes)
          pdfFunctionN(doc, items(3)) match {
            case Some(fn) => CsTint(nIn, fn, alt)
            case None =>
              notes += "tint-transform-skipped"
              CsGray
          }
        case PName("Separation") | PName("DeviceN") => CsGray
        case _ => notes += "colorspace-exotic"; CsRgb
      }
    case _ => CsRgb
  }

  private def bitAt(data: Array[Byte], bit: Int): Int =
    if ((bit >> 3) < data.length) (data(bit >> 3) >> (7 - (bit & 7))) & 1 else 0

  private def sampleAt(data: Array[Byte], rowBits: Int, x: Int, y: Int,
      bpc: Int, comp: Int, nComp: Int): Int = {
    val bitPos = y * rowBits + (x * nComp + comp) * bpc
    bpc match {
      case 8 =>
        val at = bitPos >> 3
        if (at < data.length) data(at) & 0xff else 0
      case 1 => bitAt(data, bitPos) * 255
      case 2 =>
        val v = (bitAt(data, bitPos) << 1) | bitAt(data, bitPos + 1)
        v * 85
      case 4 =>
        val v = (bitAt(data, bitPos) << 3) | (bitAt(data, bitPos + 1) << 2) |
          (bitAt(data, bitPos + 2) << 1) | bitAt(data, bitPos + 3)
        v * 17
      case 16 =>
        val at = bitPos >> 3
        if (at < data.length) data(at) & 0xff else 0 // high byte
      case _ => 0
    }
  }

  /** Raw (pre-scale) sample for Indexed palettes. */
  private def rawSampleAt(data: Array[Byte], rowBits: Int, x: Int, y: Int,
      bpc: Int): Int = {
    val bitPos = y * rowBits + x * bpc
    bpc match {
      case 8 => val at = bitPos >> 3; if (at < data.length) data(at) & 0xff else 0
      case 1 => bitAt(data, bitPos)
      case 2 => (bitAt(data, bitPos) << 1) | bitAt(data, bitPos + 1)
      case 4 => (bitAt(data, bitPos) << 3) | (bitAt(data, bitPos + 1) << 2) |
        (bitAt(data, bitPos + 2) << 1) | bitAt(data, bitPos + 3)
      case _ => 0
    }
  }

  private val MaxImagePixels = 1 << 26

  /** JPEG 2000 component planes → ARGB (gray for 1 component, RGB for
    * 3+; a 2nd/4th component is ignored — alpha channels in PDF ride
    * /SMask, not the JPX opacity box, which is a named non-goal).
    */
  private def jpxToArgb(img: Jpeg2000.JpxImage): BufferedImage = {
    val out = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_ARGB)
    val shift = math.max(img.depth - 8, 0)
    val scale = if (img.depth < 8) 255.0 / ((1 << img.depth) - 1) else 1.0
    def to8(v: Int): Int =
      if (img.depth == 8) v
      else if (img.depth > 8) v >> shift
      else math.round(v * scale).toInt
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val i = y * img.width + x
        val rgb =
          if (img.comps.length >= 3)
            (to8(img.comps(0)(i)) << 16) | (to8(img.comps(1)(i)) << 8) |
              to8(img.comps(2)(i))
          else {
            val v = to8(img.comps(0)(i))
            (v << 16) | (v << 8) | v
          }
        out.setRGB(x, y, 0xff000000 | rgb)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode an image XObject (or inline image dict + payload) to ARGB.
    * `obj` (for XObjects) routes sample decoding through
    * `Pdf.decodedStream` so /DecodeParms predictors apply; inline images
    * (no obj) decode their abbreviated filter chain directly.
    */
  private def decodeImage(doc: Doc, dict: PDict, raw: Array[Byte],
      obj: Option[Pdf.Obj], res: PDict, fillColor: Color,
      notes: mutable.Set[String]): Option[BufferedImage] = {
    def ik(long: String, short: String): Option[PVal] =
      dict.m.get(long).orElse(dict.m.get(short)).map(doc.resolve)
    val w = ik("Width", "W").map(num).getOrElse(0.0).toInt
    val h = ik("Height", "H").map(num).getOrElse(0.0).toInt
    require(w > 0 && h > 0 && w.toLong * h <= MaxImagePixels,
      s"image dims out of range: ${w}x$h")
    val bpc = ik("BitsPerComponent", "BPC").map(num).getOrElse(8.0).toInt
    val isMask = ik("ImageMask", "IM").contains(PBool(true))
    val filters: Seq[String] = ik("Filter", "F") match {
      case Some(PName(f)) => Seq(f)
      case Some(PArr(fs)) => fs.collect { case PName(f) => f }
      case _ => Seq.empty
    }
    val full = filters.map {
      case "AHx" => "ASCIIHexDecode"
      case "A85" => "ASCII85Decode"
      case "LZW" => "LZWDecode"
      case "Fl" => "FlateDecode"
      case "RL" => "RunLengthDecode"
      case "CCF" => "CCITTFaxDecode"
      case "DCT" => "DCTDecode"
      case other => other
    }
    if (full.lastOption.contains("JPXDecode")) {
      // JPEG 2000: the codestream self-describes geometry, depth and
      // component count (PDF 32000-1 §7.4.9 says the dict entries are
      // advisory for JPX) — decode via the in-repo T.800 baseline
      val cs = Pdf.applyStreamFilters(raw, full.dropRight(1), "")
      try {
        val img = Jpeg2000.decode(cs)
        return Some(jpxToArgb(img))
      } catch {
        case e: IllegalArgumentException =>
          notes += (if (e.getMessage != null && e.getMessage.startsWith("jpx-"))
            e.getMessage else "jpx-decode-failed")
          return None
        case _: IndexOutOfBoundsException =>
          notes += "jpx-decode-failed"
          return None
      }
    }
    if (full.contains("JPXDecode")) {
      notes += "image-codec-skipped" // JPX under a suffix filter: unseen
      return None
    }
    // /JBIG2Globals (shared symbol dictionaries) resolve to bytes here —
    // the filter layer only sees strings and can't chase the indirect ref
    val jbGlobals =
      if (full.contains("JBIG2Decode"))
        obj.map(o => Pdf.jbig2Globals(o.dict, doc.objs))
          .getOrElse(Array.emptyByteArray)
      else Array.emptyByteArray
    if (full.lastOption.contains("DCTDecode")) {
      // passthrough: strip prefix filters, let ImageIO decode the JPEG
      val jpeg = Pdf.applyStreamFilters(raw, full.dropRight(1), "")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      if (img == null) { notes += "jpeg-decode-failed"; return None }
      val out = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_ARGB)
      val g = out.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
      return Some(out)
    }
    val data = obj match {
      case Some(o) => // handles /DecodeParms predictors
        Pdf.decodedStream(o, jbGlobals)
      case None =>
        // inline image: re-serialize /DP params (plus /Height as the
        // /Rows fallback) so the CCITT branch sees its K/Columns/etc.
        val parmStr = (ik("DecodeParms", "DP") match {
          case Some(PDict(m)) => m.toSeq.map { case (key, v) =>
            "/" + key + " " + (doc.resolve(v) match {
              case PNum(n) =>
                if (n == n.floor) n.toLong.toString else n.toString
              case PBool(b) => b.toString
              case PName(nm) => "/" + nm
              case _ => "0"
            })
          }.mkString(" ")
          case _ => ""
        }) + s" /Height $h"
        Pdf.applyStreamFilters(raw, full, parmStr)
    }
    val decodeArr = ik("Decode", "D") match {
      case Some(PArr(a)) => a.map(num)
      case _ => Vector.empty[Double]
    }
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    if (isMask) {
      // stencil: after /Decode, sample 0 paints with current fill color
      val invert = decodeArr.headOption.contains(1.0)
      val rowBits = ((w * 1 + 7) / 8) * 8
      val fc = fillColor.getRGB | 0xff000000
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bit = bitAt(data, y * rowBits + x)
          val painted = (bit == 0) != invert
          out.setRGB(x, y, if (painted) fc else 0)
          x += 1
        }
        y += 1
      }
      return Some(out)
    }
    val cs = ik("ColorSpace", "CS").map(colorSpaceOf(doc, _, res, notes))
      .getOrElse(CsGray)
    val nComp = cs match { case CsIndexed(_, _) => 1; case c => c.comps }
    val rowBits = ((w * nComp * bpc + 7) / 8) * 8
    val invertGray = cs == CsGray && decodeArr.headOption.contains(1.0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = cs match {
          case CsGray =>
            var v = sampleAt(data, rowBits, x, y, bpc, 0, 1)
            if (invertGray) v = 255 - v
            (v << 16) | (v << 8) | v
          case CsRgb =>
            (sampleAt(data, rowBits, x, y, bpc, 0, 3) << 16) |
              (sampleAt(data, rowBits, x, y, bpc, 1, 3) << 8) |
              sampleAt(data, rowBits, x, y, bpc, 2, 3)
          case CsCmyk =>
            cmykToRgb(
              sampleAt(data, rowBits, x, y, bpc, 0, 4) / 255.0,
              sampleAt(data, rowBits, x, y, bpc, 1, 4) / 255.0,
              sampleAt(data, rowBits, x, y, bpc, 2, 4) / 255.0,
              sampleAt(data, rowBits, x, y, bpc, 3, 4) / 255.0)
          case CsIndexed(base, pal) =>
            val idx = rawSampleAt(data, rowBits, x, y, bpc)
            base match {
              case CsRgb =>
                val at = idx * 3
                if (at + 2 < pal.length)
                  ((pal(at) & 0xff) << 16) | ((pal(at + 1) & 0xff) << 8) |
                    (pal(at + 2) & 0xff)
                else 0
              case CsGray =>
                val v = if (idx < pal.length) pal(idx) & 0xff else 0
                (v << 16) | (v << 8) | v
              case CsCmyk =>
                val at = idx * 4
                if (at + 3 < pal.length)
                  cmykToRgb((pal(at) & 0xff) / 255.0, (pal(at + 1) & 0xff) / 255.0,
                    (pal(at + 2) & 0xff) / 255.0, (pal(at + 3) & 0xff) / 255.0)
                else 0
              case _ => 0
            }
        }
        out.setRGB(x, y, 0xff000000 | rgb)
        x += 1
      }
      y += 1
    }
    // soft mask → alpha channel
    dict.m.get("SMask").foreach { ref =>
      doc.rawObj(ref).foreach { o =>
        val md = parseValue(o.dict) match { case d: PDict => d; case _ => PDict(Map.empty) }
        val mw = dNum(doc, md, "Width", 0).toInt
        val mh = dNum(doc, md, "Height", 0).toInt
        if (mw > 0 && mh > 0 && mw.toLong * mh <= MaxImagePixels) {
          val mdata = Pdf.decodedStream(o)
          val mBpc = math.max(1, dNum(doc, md, "BitsPerComponent", 8).toInt)
          val mBits = ((mw * mBpc + 7) / 8) * 8
          var yy = 0
          while (yy < h) {
            var xx = 0
            val sy = math.min(mh - 1, yy * mh / h)
            while (xx < w) {
              val sx = math.min(mw - 1, xx * mw / w)
              val a = sampleAt(mdata, mBits, sx, sy, mBpc, 0, 1)
              out.setRGB(xx, yy, (out.getRGB(xx, yy) & 0xffffff) | (a << 24))
              xx += 1
            }
            yy += 1
          }
        }
      }
    }
    Some(out)
  }

  /** Custom Paint tiling a PATTERN-SPACE cell raster under an ARBITRARY
    * pattern→device transform: each device pixel inverse-maps into
    * pattern space, wraps modulo (XStep, YStep) and samples the cell
    * (rendered y-up at `res` device px per pattern unit). TexturePaint
    * only tiles axis-aligned rectangles; this closes rotated/sheared
    * tiling matrices.
    */
  private final class TiledPatternPaint(tile: BufferedImage, xs: Double,
      ys: Double, res: Double, patToDev: AffineTransform)
      extends java.awt.Paint {
    def getTransparency: Int = java.awt.Transparency.TRANSLUCENT
    def createContext(cm: java.awt.image.ColorModel,
        deviceBounds: java.awt.Rectangle,
        userBounds: java.awt.geom.Rectangle2D,
        xform: AffineTransform,
        hints: RenderingHints): java.awt.PaintContext = {
      val full = new AffineTransform(xform)
      full.concatenate(patToDev)
      val inv =
        try full.createInverse()
        catch {
          case _: java.awt.geom.NoninvertibleTransformException =>
            new AffineTransform()
        }
      new java.awt.PaintContext {
        private val model = java.awt.image.ColorModel.getRGBdefault
        def dispose(): Unit = ()
        def getColorModel: java.awt.image.ColorModel = model
        def getRaster(x: Int, y: Int, w: Int,
            h: Int): java.awt.image.Raster = {
          val out = model.createCompatibleWritableRaster(w, h)
          val data = new Array[Int](w * h)
          val p = new java.awt.geom.Point2D.Double()
          var j = 0
          while (j < h) {
            var i = 0
            while (i < w) {
              p.setLocation(x + i + 0.5, y + j + 0.5)
              inv.transform(p, p)
              var u = p.getX % xs; if (u < 0) u += xs
              var v = p.getY % ys; if (v < 0) v += ys
              val tx = math.min(tile.getWidth - 1, (u * res).toInt)
              val ty = math.max(0, math.min(tile.getHeight - 1,
                tile.getHeight - 1 - (v * res).toInt))
              data(j * w + i) = tile.getRGB(tx, ty)
              i += 1
            }
            j += 1
          }
          out.setDataElements(0, 0, w, h, data)
          out
        }
      }
    }
  }

  /** Exact PDF type-2 (axial) shading paint solved in SHADING space:
    * each device pixel inverse-maps through xform∘shadeToDev, then
    * s = (p−p0)·d / d·d (ISO 32000-1 §8.7.4.5.3) — exact under ANY
    * affine base transform (AWT's LinearGradientPaint keeps iso-lines
    * perpendicular in DEVICE space, which shear breaks) and honoring
    * /Extend (transparent when not extended, where NO_CYCLE clamps).
    */
  private final class AxialShadingPaint(x0: Double, y0: Double,
      x1: Double, y1: Double, lut: Array[Int],
      extend0: Boolean, extend1: Boolean, shadeToDev: AffineTransform)
      extends java.awt.Paint {
    def getTransparency: Int = java.awt.Transparency.TRANSLUCENT
    def createContext(cm: java.awt.image.ColorModel,
        deviceBounds: java.awt.Rectangle,
        userBounds: java.awt.geom.Rectangle2D,
        xform: AffineTransform,
        hints: RenderingHints): java.awt.PaintContext = {
      val full = new AffineTransform(xform)
      full.concatenate(shadeToDev)
      val inv =
        try full.createInverse()
        catch {
          case _: java.awt.geom.NoninvertibleTransformException =>
            new AffineTransform()
        }
      val dx = x1 - x0
      val dy = y1 - y0
      val dd = dx * dx + dy * dy
      new java.awt.PaintContext {
        private val model = java.awt.image.ColorModel.getRGBdefault
        def dispose(): Unit = ()
        def getColorModel: java.awt.image.ColorModel = model
        def getRaster(x: Int, y: Int, w: Int,
            h: Int): java.awt.image.Raster = {
          val out = model.createCompatibleWritableRaster(w, h)
          val data = new Array[Int](w * h)
          val p = new java.awt.geom.Point2D.Double()
          var j = 0
          while (j < h) {
            var i = 0
            while (i < w) {
              p.setLocation(x + i + 0.5, y + j + 0.5)
              inv.transform(p, p)
              val s = ((p.getX - x0) * dx + (p.getY - y0) * dy) / dd
              data(j * w + i) =
                if (s < 0) { if (extend0) lut(0) else 0 }
                else if (s > 1) { if (extend1) lut(255) else 0 }
                else lut(math.min(255, (s * 255).round.toInt))
              i += 1
            }
            j += 1
          }
          out.setDataElements(0, 0, w, h, data)
          out
        }
      }
    }
  }

  /** Exact PDF type-3 (radial) shading paint solved in SHADING space:
    * each device pixel inverse-maps through xform∘shadeToDev (so
    * anisotropic/rotated/sheared base transforms — circle → ellipse in
    * device space — stay exact), then the largest s with |p − c(s)| =
    * r(s), c(s) = c0 + s·(c1−c0), r(s) = r0 + s·(r1−r0) — the
    * closed-form quadratic of ISO 32000-1 §8.7.4.5.4. s outside [0,1]
    * honors /Extend (transparent when not extended); circles with
    * r(s) < 0 never paint.
    */
  private final class RadialShadingPaint(c0x: Double, c0y: Double,
      r0: Double, c1x: Double, c1y: Double, r1: Double,
      lut: Array[Int], extend0: Boolean, extend1: Boolean,
      shadeToDev: AffineTransform)
      extends java.awt.Paint {
    def getTransparency: Int = java.awt.Transparency.TRANSLUCENT
    def createContext(cm: java.awt.image.ColorModel,
        deviceBounds: java.awt.Rectangle,
        userBounds: java.awt.geom.Rectangle2D,
        xform: AffineTransform,
        hints: RenderingHints): java.awt.PaintContext = {
      val full = new AffineTransform(xform)
      full.concatenate(shadeToDev)
      val inv =
        try full.createInverse()
        catch {
          case _: java.awt.geom.NoninvertibleTransformException =>
            new AffineTransform()
        }
      val dcx = c1x - c0x
      val dcy = c1y - c0y
      val dr = r1 - r0
      val a = dcx * dcx + dcy * dcy - dr * dr
      new java.awt.PaintContext {
        private val model = java.awt.image.ColorModel.getRGBdefault
        def dispose(): Unit = ()
        def getColorModel: java.awt.image.ColorModel = model
        def getRaster(x: Int, y: Int, w: Int,
            h: Int): java.awt.image.Raster = {
          val out = model.createCompatibleWritableRaster(w, h)
          val data = new Array[Int](w * h)
          val p = new java.awt.geom.Point2D.Double()
          var j = 0
          while (j < h) {
            var i = 0
            while (i < w) {
              p.setLocation(x + i + 0.5, y + j + 0.5)
              inv.transform(p, p)
              val dx = p.getX - c0x
              val dy = p.getY - c0y
              val b = -2.0 * (dx * dcx + dy * dcy + r0 * dr)
              val c = dx * dx + dy * dy - r0 * r0
              // largest root with r(s) >= 0
              var s = Double.NaN
              if (math.abs(a) < 1e-12) {
                if (math.abs(b) > 1e-12) {
                  val cand = -c / b
                  if (r0 + cand * dr >= 0) s = cand
                }
              } else {
                val disc = b * b - 4 * a * c
                if (disc >= 0) {
                  val sq = math.sqrt(disc)
                  val s1 = (-b + sq) / (2 * a)
                  val s2 = (-b - sq) / (2 * a)
                  val hi = math.max(s1, s2)
                  val lo = math.min(s1, s2)
                  if (r0 + hi * dr >= 0) s = hi
                  else if (r0 + lo * dr >= 0) s = lo
                }
              }
              data(j * w + i) =
                if (s.isNaN) 0 // outside the circle family: transparent
                else if (s < 0) { if (extend0) lut(0) else 0 }
                else if (s > 1) { if (extend1) lut(255) else 0 }
                else lut(math.min(255, (s * 255).round.toInt))
              i += 1
            }
            j += 1
          }
          out.setDataElements(0, 0, w, h, data)
          out
        }
      }
    }
  }

  // ===================== graphics state =====================

  private final class GState {
    var ctm = new AffineTransform()
    var baseCtm = new AffineTransform() // page device←default space (patterns)
    var fill: Color = Color.BLACK
    var stroke: Color = Color.BLACK
    var fillPaint: Option[java.awt.Paint] = None // pattern paint overrides
    var strokePaint: Option[java.awt.Paint] = None
    var fillCs: Cs = CsGray
    var strokeCs: Cs = CsGray
    var fillAlpha = 1.0f
    var strokeAlpha = 1.0f
    var lineWidth = 1.0
    var cap = BasicStroke.CAP_BUTT
    var join = BasicStroke.JOIN_MITER
    var miter = 10.0f
    var dash: Option[(Array[Float], Float)] = None
    var clip: Option[Area] = None // device space
    // text state (persists across BT/ET per spec)
    var font: FontRec = null
    var fontSize = 0.0
    var charSp = 0.0
    var wordSp = 0.0
    var hscale = 1.0
    var leading = 0.0
    var rise = 0.0
    var renderMode = 0

    def copyState(): GState = {
      val g = new GState
      g.ctm = new AffineTransform(ctm)
      g.baseCtm = new AffineTransform(baseCtm)
      g.fill = fill; g.stroke = stroke
      g.fillPaint = fillPaint; g.strokePaint = strokePaint
      g.fillCs = fillCs; g.strokeCs = strokeCs
      g.fillAlpha = fillAlpha; g.strokeAlpha = strokeAlpha
      g.lineWidth = lineWidth; g.cap = cap; g.join = join; g.miter = miter
      g.dash = dash.map { case (a, p) => (a.clone(), p) }
      g.clip = clip.map(c => new Area(c))
      g.font = font; g.fontSize = fontSize; g.charSp = charSp
      g.wordSp = wordSp; g.hscale = hscale; g.leading = leading
      g.rise = rise; g.renderMode = renderMode
      g
    }
  }

  private final class Budget(var ops: Int, var segs: Int) {
    def op(): Unit = { ops -= 1; require(ops > 0, "content op budget exceeded") }
    def seg(): Unit = { segs -= 1; require(segs > 0, "path segment budget exceeded") }
  }

  // ===================== functions & shading =====================

  /** Type 0 (sampled) function, m-D input: MULTILINEAR interpolation
    * over the big-endian bit-packed sample grid (§7.10.2 — first input
    * dimension varies fastest), /Encode to sample space per dimension,
    * /Decode to range.
    */
  private def sampledFunction(doc: Doc, d: PDict,
      data: Array[Byte]): Option[Seq[Double] => Seq[Double]] = {
    val sizes = dArr(doc, d, "Size").map(_.map(x =>
      num(doc.resolve(x)).toInt)).getOrElse(return None)
    val mIn = sizes.length
    if (mIn < 1 || mIn > 4 || sizes.exists(_ < 1)) return None
    val bps = dNum(doc, d, "BitsPerSample", 8).toInt
    if (!Seq(1, 2, 4, 8, 16, 24, 32).contains(bps)) return None
    val range = dArr(doc, d, "Range").map(_.map(x => num(doc.resolve(x))))
      .getOrElse(return None)
    val nOut = range.length / 2
    val totalSamples = sizes.map(_.toLong).product
    if (nOut < 1 || totalSamples > (1L << 24) ||
      data.length.toLong * 8 < totalSamples * nOut * bps) return None
    val dom = dArr(doc, d, "Domain").map(_.map(x => num(doc.resolve(x))))
      .filter(_.length == 2 * mIn)
      .getOrElse(Vector.fill(mIn)(Vector(0.0, 1.0)).flatten)
    val enc = dArr(doc, d, "Encode").map(_.map(x => num(doc.resolve(x))))
      .filter(_.length == 2 * mIn)
      .getOrElse(sizes.flatMap(s => Vector(0.0, (s - 1).toDouble)))
    val dec = dArr(doc, d, "Decode").map(_.map(x => num(doc.resolve(x))))
      .filter(_.length == range.length).getOrElse(range)
    val maxV = (1L << bps) - 1
    // grid index (first dim fastest) → raw sample j, normalized [0,1]
    def rawSample(idx: Array[Int], j: Int): Double = {
      var flat = 0L
      var k = mIn - 1
      while (k >= 0) { flat = flat * sizes(k) + idx(k); k -= 1 }
      val bit = (flat * nOut + j) * bps
      var v = 0L
      var b = bit
      while (b < bit + bps) {
        v = (v << 1) | ((data((b >> 3).toInt) >> (7 - (b & 7))) & 1)
        b += 1
      }
      v.toDouble / maxV
    }
    Some { xs0 =>
      val base = new Array[Int](mIn)
      val frac = new Array[Double](mIn)
      var k = 0
      while (k < mIn) {
        val x0 = if (k < xs0.length) xs0(k) else dom(2 * k)
        val x = math.max(dom(2 * k), math.min(dom(2 * k + 1), x0))
        val span = math.max(dom(2 * k + 1) - dom(2 * k), 1e-12)
        val e0 = enc(2 * k) +
          (x - dom(2 * k)) / span * (enc(2 * k + 1) - enc(2 * k))
        val e = math.max(0.0, math.min((sizes(k) - 1).toDouble, e0))
        base(k) = math.min(math.max(sizes(k) - 2, 0), e.toInt)
        frac(k) = if (sizes(k) > 1) e - base(k) else 0.0
        k += 1
      }
      (0 until nOut).map { j =>
        // multilinear blend over the 2^m hypercube corners
        var acc = 0.0
        var corner = 0
        val idx = new Array[Int](mIn)
        while (corner < (1 << mIn)) {
          var w = 1.0
          var k2 = 0
          while (k2 < mIn) {
            val hi = (corner >> k2) & 1
            idx(k2) = math.min(sizes(k2) - 1, base(k2) + hi)
            w *= (if (hi == 1) frac(k2) else 1 - frac(k2))
            k2 += 1
          }
          if (w > 0) acc += w * rawSample(idx, j)
          corner += 1
        }
        dec(2 * j) + acc * (dec(2 * j + 1) - dec(2 * j))
      }
    }
  }

  /** PDF function object → m-in/n-out evaluator. Types 0 (sampled,
    * multilinear), 2 (exponential), 3 (stitching), 4 (PostScript
    * calculator via `PsCalc`) and arrays of functions acting
    * component-wise.
    */
  private def pdfFunctionN(doc: Doc,
      v: PVal): Option[Seq[Double] => Seq[Double]] = (v match {
    case ref: PRef => doc.rawObj(ref) match {
      case Some(o) if o.stream.isDefined => // sampled or calculator stream
        val d = parseValue(o.dict) match {
          case x: PDict => x
          case _ => PDict(Map.empty)
        }
        val data =
          try Pdf.decodedStream(o)
          catch { case _: Exception => return None }
        dNum(doc, d, "FunctionType", -1).toInt match {
          case 0 => return sampledFunction(doc, d, data)
          case 4 =>
            val range = dArr(doc, d, "Range")
              .map(_.map(x => num(doc.resolve(x)))).getOrElse(return None)
            val dom = dArr(doc, d, "Domain")
              .map(_.map(x => num(doc.resolve(x)))).getOrElse(Vector.empty)
            val nOut = range.length / 2
            val inner = PsCalc.compile(
              new String(data, java.nio.charset.StandardCharsets.ISO_8859_1),
              nOut).getOrElse(return None)
            return Some { xs =>
              val clamped = xs.zipWithIndex.map { case (x, i) =>
                if (dom.length >= 2 * i + 2)
                  math.max(dom(2 * i), math.min(dom(2 * i + 1), x))
                else x
              }
              inner(clamped).zipWithIndex.map { case (y, j) =>
                math.max(range(2 * j), math.min(range(2 * j + 1), y))
              }
            }
          case _ => ()
        }
        doc.resolve(ref)
      case _ => doc.resolve(ref)
    }
    case other => other
  }) match {
    case PArr(fs) =>
      val evals = fs.map(pdfFunctionN(doc, _))
      if (evals.nonEmpty && evals.forall(_.isDefined))
        Some(xs => evals.flatMap(_.get(xs)))
      else None
    case d: PDict => pdfFunction1Dict(doc, d).map(f => xs =>
      f(xs.headOption.getOrElse(0.0)))
    case _ => None
  }

  /** 1-D-input view (shading/transfer functions). */
  private def pdfFunction(doc: Doc,
      v: PVal): Option[Double => Seq[Double]] =
    pdfFunctionN(doc, v).map(f => (t: Double) => f(Seq(t)))

  private def pdfFunction1Dict(doc: Doc,
      d: PDict): Option[Double => Seq[Double]] =
    dNum(doc, d, "FunctionType", -1).toInt match {
      case 2 => // exponential interpolation: C0 + t^N (C1 − C0)
        val c0 = dArr(doc, d, "C0").map(_.map(x => num(doc.resolve(x))))
          .getOrElse(Vector(0.0))
        val c1 = dArr(doc, d, "C1").map(_.map(x => num(doc.resolve(x))))
          .getOrElse(Vector(1.0))
        val n = dNum(doc, d, "N", 1.0)
        Some { t0 =>
          val t = math.max(0.0, math.min(1.0, t0))
          c0.zip(c1).map { case (a, b) => a + math.pow(t, n) * (b - a) }
        }
      case 3 => // stitching
        val dom = dArr(doc, d, "Domain").map(_.map(x => num(doc.resolve(x))))
          .filter(_.length == 2).getOrElse(Vector(0.0, 1.0))
        val bounds = dArr(doc, d, "Bounds")
          .map(_.map(x => num(doc.resolve(x)))).getOrElse(Vector.empty)
        val enc = dArr(doc, d, "Encode")
          .map(_.map(x => num(doc.resolve(x)))).getOrElse(Vector.empty)
        val subs = dArr(doc, d, "Functions")
          .map(_.map(pdfFunction(doc, _))).getOrElse(Vector.empty)
        if (subs.isEmpty || subs.exists(_.isEmpty) ||
          bounds.length != subs.length - 1) None
        else Some { t0 =>
          val t = math.max(dom(0), math.min(dom(1), t0))
          val cuts = dom(0) +: bounds :+ dom(1)
          var i = bounds.indexWhere(t < _)
          if (i < 0) i = subs.length - 1
          val (lo, hi) = (cuts(i), cuts(i + 1))
          val (e0, e1) =
            if (enc.length >= 2 * i + 2) (enc(2 * i), enc(2 * i + 1))
            else (0.0, 1.0)
          val tt =
            if (hi > lo) e0 + (t - lo) / (hi - lo) * (e1 - e0) else e0
          subs(i).get(tt)
        }
      case _ => None
    }

  /** Gradient stop positions for the /Function: a linear (N = 1) type-2
    * function needs only its endpoints; stitching contributes its bound
    * positions (normalized); anything non-linear is sampled.
    */
  private def fnStops(doc: Doc, v: PVal): Seq[Double] = doc.resolve(v) match {
    case PArr(fs) => fs.flatMap(fnStops(doc, _))
    case d: PDict => dNum(doc, d, "FunctionType", -1).toInt match {
      case 0 => // sampled: stops at the sample grid → exact piecewise-
        // linear reproduction through the gradient paint
        val n = dArr(doc, d, "Size")
          .flatMap(_.headOption).map(x => num(doc.resolve(x)).toInt)
          .getOrElse(0)
        if (n >= 2 && n <= 256) (0 until n).map(_ / (n - 1).toDouble)
        else (0 to 16).map(_ / 16.0)
      case 2 =>
        if (dNum(doc, d, "N", 1.0) == 1.0) Seq(0.0, 1.0)
        else (0 to 16).map(_ / 16.0)
      case 3 =>
        val dom = dArr(doc, d, "Domain").map(_.map(x => num(doc.resolve(x))))
          .filter(_.length == 2).getOrElse(Vector(0.0, 1.0))
        val bounds = dArr(doc, d, "Bounds")
          .map(_.map(x => num(doc.resolve(x)))).getOrElse(Vector.empty)
        val span = math.max(dom(1) - dom(0), 1e-12)
        val cuts = (dom(0) +: bounds :+ dom(1)).map(c =>
          math.max(0.0, math.min(1.0, (c - dom(0)) / span)))
        // sample inside each piece too (sub-functions may be non-linear)
        cuts.sliding(2).flatMap { p =>
          (0 to 8).map(k => p(0) + (p(1) - p(0)) * k / 8.0)
        }.toSeq
      case _ => (0 to 16).map(_ / 16.0)
    }
    case _ => Seq(0.0, 1.0)
  }

  /** One Gouraud triangle in SHADING space with per-vertex ARGB. */
  private final case class MeshTri(ax: Double, ay: Double, bx: Double,
      by: Double, cx: Double, cy: Double, ca: Int, cb: Int, cc: Int)

  /** Per-pixel Gouraud paint for mesh shadings (types 4-7): each
    * device pixel inverse-maps to shading space, a uniform grid index
    * narrows the candidate triangles, barycentric interpolation mixes
    * the vertex colors. Pixels outside every triangle stay transparent
    * (mesh shadings paint only their own area); when triangles overlap
    * the LATER one in data order wins (§8.7.4.5.5 paint order).
    */
  private final class MeshShadingPaint(tris: Array[MeshTri],
      shadeToDev: AffineTransform) extends java.awt.Paint {
    private val minX = tris.iterator.map(t =>
      math.min(t.ax, math.min(t.bx, t.cx))).min
    private val minY = tris.iterator.map(t =>
      math.min(t.ay, math.min(t.by, t.cy))).min
    private val maxX = tris.iterator.map(t =>
      math.max(t.ax, math.max(t.bx, t.cx))).max
    private val maxY = tris.iterator.map(t =>
      math.max(t.ay, math.max(t.by, t.cy))).max
    private val gridN = 32
    private val spanX = math.max(maxX - minX, 1e-12)
    private val spanY = math.max(maxY - minY, 1e-12)
    private val bins: Array[Array[Int]] = {
      val b = Array.fill(gridN * gridN)(
        new scala.collection.mutable.ArrayBuffer[Int])
      def binOf(v: Double, lo: Double, span: Double): Int =
        math.max(0, math.min(gridN - 1, ((v - lo) / span * gridN).toInt))
      tris.indices.foreach { i =>
        val t = tris(i)
        val x0 = binOf(math.min(t.ax, math.min(t.bx, t.cx)), minX, spanX)
        val x1 = binOf(math.max(t.ax, math.max(t.bx, t.cx)), minX, spanX)
        val y0 = binOf(math.min(t.ay, math.min(t.by, t.cy)), minY, spanY)
        val y1 = binOf(math.max(t.ay, math.max(t.by, t.cy)), minY, spanY)
        for (gy <- y0 to y1; gx <- x0 to x1) b(gy * gridN + gx) += i
      }
      b.map(_.toArray)
    }
    def getTransparency: Int = java.awt.Transparency.TRANSLUCENT
    def createContext(cm: java.awt.image.ColorModel,
        deviceBounds: java.awt.Rectangle,
        userBounds: java.awt.geom.Rectangle2D,
        xform: AffineTransform,
        hints: RenderingHints): java.awt.PaintContext = {
      val full = new AffineTransform(xform)
      full.concatenate(shadeToDev)
      val inv =
        try full.createInverse()
        catch {
          case _: java.awt.geom.NoninvertibleTransformException =>
            new AffineTransform()
        }
      new java.awt.PaintContext {
        private val model = java.awt.image.ColorModel.getRGBdefault
        def dispose(): Unit = ()
        def getColorModel: java.awt.image.ColorModel = model
        def getRaster(x: Int, y: Int, w: Int,
            h: Int): java.awt.image.Raster = {
          val out = model.createCompatibleWritableRaster(w, h)
          val data = new Array[Int](w * h)
          val p = new java.awt.geom.Point2D.Double()
          var j = 0
          while (j < h) {
            var i = 0
            while (i < w) {
              p.setLocation(x + i + 0.5, y + j + 0.5)
              inv.transform(p, p)
              val px = p.getX; val py = p.getY
              var argb = 0
              if (px >= minX && px <= maxX && py >= minY && py <= maxY) {
                val gx = math.max(0, math.min(gridN - 1,
                  ((px - minX) / spanX * gridN).toInt))
                val gy = math.max(0, math.min(gridN - 1,
                  ((py - minY) / spanY * gridN).toInt))
                val cand = bins(gy * gridN + gx)
                var k = cand.length - 1 // later triangles paint on top
                while (k >= 0 && argb == 0) {
                  val t = tris(cand(k))
                  val den = (t.by - t.cy) * (t.ax - t.cx) +
                    (t.cx - t.bx) * (t.ay - t.cy)
                  if (math.abs(den) > 1e-12) {
                    val l1 = ((t.by - t.cy) * (px - t.cx) +
                      (t.cx - t.bx) * (py - t.cy)) / den
                    val l2 = ((t.cy - t.ay) * (px - t.cx) +
                      (t.ax - t.cx) * (py - t.cy)) / den
                    val l3 = 1.0 - l1 - l2
                    val eps = -1e-9
                    if (l1 >= eps && l2 >= eps && l3 >= eps) {
                      def ch(sh: Int): Int = {
                        val v = l1 * ((t.ca >> sh) & 0xff) +
                          l2 * ((t.cb >> sh) & 0xff) +
                          l3 * ((t.cc >> sh) & 0xff)
                        math.max(0, math.min(255, v.round.toInt))
                      }
                      argb = (0xff << 24) | (ch(16) << 16) |
                        (ch(8) << 8) | ch(0)
                    }
                  }
                  k -= 1
                }
              }
              data(j * w + i) = argb
              i += 1
            }
            j += 1
          }
          out.setDataElements(0, 0, w, h, data)
          out
        }
      }
    }
  }

  /** Type 1 (function-based) shading: color(s, t) = fn over /Domain in
    * the space mapped by /Matrix; outside the domain is unpainted.
    */
  private final class FunctionShadingPaint(
      fn: Seq[Double] => Seq[Double], cs: Cs, dom: Array[Double],
      mtx: AffineTransform, shadeToDev: AffineTransform)
      extends java.awt.Paint {
    def getTransparency: Int = java.awt.Transparency.TRANSLUCENT
    def createContext(cm: java.awt.image.ColorModel,
        deviceBounds: java.awt.Rectangle,
        userBounds: java.awt.geom.Rectangle2D,
        xform: AffineTransform,
        hints: RenderingHints): java.awt.PaintContext = {
      val full = new AffineTransform(xform)
      full.concatenate(shadeToDev)
      full.concatenate(mtx) // device → shading → function space
      val inv =
        try full.createInverse()
        catch {
          case _: java.awt.geom.NoninvertibleTransformException =>
            new AffineTransform()
        }
      new java.awt.PaintContext {
        private val model = java.awt.image.ColorModel.getRGBdefault
        def dispose(): Unit = ()
        def getColorModel: java.awt.image.ColorModel = model
        def getRaster(x: Int, y: Int, w: Int,
            h: Int): java.awt.image.Raster = {
          val out = model.createCompatibleWritableRaster(w, h)
          val data = new Array[Int](w * h)
          val p = new java.awt.geom.Point2D.Double()
          var j = 0
          while (j < h) {
            var i = 0
            while (i < w) {
              p.setLocation(x + i + 0.5, y + j + 0.5)
              inv.transform(p, p)
              val s = p.getX; val t = p.getY
              data(j * w + i) =
                if (s < dom(0) || s > dom(1) || t < dom(2) || t > dom(3)) 0
                else {
                  val c =
                    try colorFrom(cs, fn(Seq(s, t)))
                    catch { case _: Exception => Color.BLACK }
                  c.getRGB | 0xff000000
                }
              i += 1
            }
            j += 1
          }
          out.setDataElements(0, 0, w, h, data)
          out
        }
      }
    }
  }

  /** Big-endian bit reader for mesh vertex/patch streams (§8.7.4.5.5:
    * each vertex/patch row is padded to a byte boundary).
    */
  private final class MeshBitReader(data: Array[Byte]) {
    private var pos = 0L
    def bits(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) {
        val byteAt = (pos >> 3).toInt
        val bit =
          if (byteAt < data.length)
            (data(byteAt) >> (7 - (pos & 7).toInt)) & 1
          else 0
        v = (v << 1) | bit
        pos += 1
        k += 1
      }
      v
    }
    def align(): Unit = pos = (pos + 7) & ~7L
    def hasBits(n: Long): Boolean = pos + n <= data.length.toLong * 8
  }

  /** Parse a mesh shading stream (types 4-7) into Gouraud triangles in
    * shading space. Free-form (4) honors strip/fan edge flags; lattice
    * (5) triangulates consecutive rows; Coons (6) and tensor (7)
    * patches honor edge-sharing flags, convert Coons to tensor via the
    * §8.7.4.5.7 internal-point formulas, and tessellate the bicubic
    * surface on an 8×8 parameter grid (colors interpolate BILINEARLY
    * in (u,v) per spec, so patch colors are exact at every grid
    * point; only the geometry of curved edges is approximated).
    */
  private def parseMeshTriangles(doc: Doc, sh: PDict, shType: Int,
      data: Array[Byte], cs: Cs, notes: mutable.Set[String])
      : Option[Array[MeshTri]] = {
    val bpc = dNum(doc, sh, "BitsPerCoordinate", 16).toInt
    val bpcomp = dNum(doc, sh, "BitsPerComponent", 8).toInt
    val bpf = dNum(doc, sh, "BitsPerFlag", 8).toInt
    if (!Set(1, 2, 4, 8, 12, 16, 24, 32).contains(bpc) ||
      !Set(1, 2, 4, 8, 12, 16).contains(bpcomp) ||
      !Set(2, 4, 8).contains(bpf)) {
      notes += "shading-mesh-bits"; return None
    }
    val fn = sh.m.get("Function").map { v =>
      pdfFunctionN(doc, v).getOrElse {
        notes += "shading-function-skipped"; return None
      }
    }
    val nc = if (fn.isDefined) 1 else cs.comps
    val dec = dArr(doc, sh, "Decode").map(_.map(x => num(doc.resolve(x))))
      .getOrElse(Vector.empty)
    if (dec.length < 4 + 2 * nc) {
      notes += "shading-mesh-decode"; return None
    }
    val r = new MeshBitReader(data)
    val coordMax = ((1L << bpc) - 1).toDouble
    val compMax = ((1L << bpcomp) - 1).toDouble
    def readPt(): (Double, Double) = {
      val xr = r.bits(bpc); val yr = r.bits(bpc)
      (dec(0) + xr * (dec(1) - dec(0)) / coordMax,
        dec(2) + yr * (dec(3) - dec(2)) / coordMax)
    }
    def readColor(): Int = {
      val comps = (0 until nc).map { i =>
        val v = r.bits(bpcomp)
        dec(4 + 2 * i) + v * (dec(5 + 2 * i) - dec(4 + 2 * i)) / compMax
      }
      val c =
        try fn.map(f => colorFrom(cs, f(comps)))
          .getOrElse(colorFrom(cs, comps))
        catch { case _: Exception => Color.BLACK }
      c.getRGB | 0xff000000
    }
    val tris = scala.collection.mutable.ArrayBuffer.empty[MeshTri]
    val MaxTris = 1 << 18
    def tri(a: ((Double, Double), Int), b: ((Double, Double), Int),
        c: ((Double, Double), Int)): Unit =
      tris += MeshTri(a._1._1, a._1._2, b._1._1, b._1._2,
        c._1._1, c._1._2, a._2, b._2, c._2)
    shType match {
      case 4 =>
        val vBits = 2L * bpc + nc.toLong * bpcomp
        def readVertex(): ((Double, Double), Int) = {
          val p = readPt(); val c = readColor(); r.align(); (p, c)
        }
        var va: ((Double, Double), Int) = null
        var vb: ((Double, Double), Int) = null
        var vc: ((Double, Double), Int) = null
        var bad = false
        while (!bad && r.hasBits(bpf + vBits) && tris.length < MaxTris) {
          val flag = r.bits(bpf).toInt
          val v = readVertex()
          flag match {
            case 0 =>
              if (!r.hasBits(2 * (bpf + vBits))) bad = true
              else {
                r.bits(bpf); val v2 = readVertex() // flags of the 2nd and
                r.bits(bpf); val v3 = readVertex() // 3rd vertex are 0
                va = v; vb = v2; vc = v3
                tri(va, vb, vc)
              }
            case 1 if va != null =>
              va = vb; vb = vc; vc = v; tri(va, vb, vc)
            case 2 if va != null =>
              vb = vc; vc = v; tri(va, vb, vc)
            case _ =>
              notes += "shading-mesh-flag"; bad = true
          }
        }
      case 5 =>
        val k = dNum(doc, sh, "VerticesPerRow", 0).toInt
        if (k < 2 || k > (1 << 16)) {
          notes += "shading-mesh-vpr"; return None
        }
        val vBits = 2L * bpc + nc.toLong * bpcomp
        var prev: Array[((Double, Double), Int)] = null
        // hasBits is re-checked before EVERY vertex, not once per row:
        // each vertex is byte-aligned after reading, so a row's true bit
        // cost exceeds k*vBits and a k*vBits row-size check would let a
        // truncated stream fabricate a final row of zero-filled vertices.
        // A partially-readable row is discarded, not emitted.
        var truncated = false
        while (!truncated && r.hasBits(k * vBits) && tris.length < MaxTris) {
          val row = new Array[((Double, Double), Int)](k)
          var vi = 0
          while (vi < k && !truncated) {
            if (!r.hasBits(vBits)) truncated = true
            else {
              val p = readPt(); val c = readColor(); r.align()
              row(vi) = (p, c); vi += 1
            }
          }
          if (!truncated && prev != null) {
            var i = 0
            while (i < k - 1) {
              tri(prev(i), prev(i + 1), row(i))
              tri(prev(i + 1), row(i + 1), row(i))
              i += 1
            }
          }
          prev = row
        }
      case _ => // 6 = Coons, 7 = tensor
        val newPts = if (shType == 6) 12 else 16
        val contPts = if (shType == 6) 8 else 12
        // canonical state: boundary p1..p12 (indices 0-11) and corner
        // colors c1..c4; type 7 appends internals p13..p16 (12-15)
        var prevP: Array[(Double, Double)] = null
        var prevC: Array[Int] = null
        var bad = false
        while (!bad && r.hasBits(bpf + contPts * 2L * bpc +
          2L * nc * bpcomp) && tris.length < MaxTris) {
          val flag = r.bits(bpf).toInt
          val (pts, cols): (Array[(Double, Double)], Array[Int]) =
            if (flag == 0) {
              if (!r.hasBits(newPts * 2L * bpc + 4L * nc * bpcomp)) {
                bad = true; (null, null)
              } else {
                val ps = Array.fill(newPts)(readPt())
                val csr = Array.fill(4)(readColor())
                (ps, csr)
              }
            } else if (prevP == null || flag > 3) {
              notes += "shading-mesh-flag"; bad = true; (null, null)
            } else {
              // shared edge of the PREVIOUS patch becomes p1..p4
              val (e, c01) = flag match {
                case 1 => (Array(prevP(3), prevP(4), prevP(5), prevP(6)),
                  Array(prevC(1), prevC(2)))
                case 2 => (Array(prevP(6), prevP(7), prevP(8), prevP(9)),
                  Array(prevC(2), prevC(3)))
                case _ => (Array(prevP(9), prevP(10), prevP(11), prevP(0)),
                  Array(prevC(3), prevC(0)))
              }
              val rest = Array.fill(contPts)(readPt())
              val c23 = Array.fill(2)(readColor())
              (e ++ rest, c01 ++ c23)
            }
          if (!bad) {
            r.align()
            // tensor control grid P(i)(j): i advances toward corner c4
            // (p10), j toward c2 (p4); boundary mapping per Figure 46/47
            val P = Array.ofDim[(Double, Double)](4, 4)
            P(0)(0) = pts(0); P(0)(1) = pts(1); P(0)(2) = pts(2)
            P(0)(3) = pts(3); P(1)(3) = pts(4); P(2)(3) = pts(5)
            P(3)(3) = pts(6); P(3)(2) = pts(7); P(3)(1) = pts(8)
            P(3)(0) = pts(9); P(2)(0) = pts(10); P(1)(0) = pts(11)
            if (shType == 7) {
              P(1)(1) = pts(12); P(1)(2) = pts(13)
              P(2)(2) = pts(14); P(2)(1) = pts(15)
            } else {
              // §8.7.4.5.7 Coons → tensor internal points
              def lc(terms: ((Double, Double), Double)*): (Double, Double) =
                (terms.map(t => t._1._1 * t._2).sum / 9.0,
                  terms.map(t => t._1._2 * t._2).sum / 9.0)
              P(1)(1) = lc((P(0)(0), -4), (P(0)(1), 6), (P(1)(0), 6),
                (P(0)(3), -2), (P(3)(0), -2), (P(3)(1), 3), (P(1)(3), 3),
                (P(3)(3), -1))
              P(1)(2) = lc((P(0)(3), -4), (P(0)(2), 6), (P(1)(3), 6),
                (P(0)(0), -2), (P(3)(3), -2), (P(3)(2), 3), (P(1)(0), 3),
                (P(3)(0), -1))
              P(2)(1) = lc((P(3)(0), -4), (P(3)(1), 6), (P(2)(0), 6),
                (P(3)(3), -2), (P(0)(0), -2), (P(0)(1), 3), (P(2)(3), 3),
                (P(0)(3), -1))
              P(2)(2) = lc((P(3)(3), -4), (P(3)(2), 6), (P(2)(3), 6),
                (P(3)(0), -2), (P(0)(3), -2), (P(0)(2), 3), (P(2)(0), 3),
                (P(0)(0), -1))
            }
            def bez(t: Double, a: Double, b: Double, c: Double,
                d: Double): Double = {
              val m = 1 - t
              m * m * m * a + 3 * m * m * t * b + 3 * m * t * t * c +
                t * t * t * d
            }
            def surf(u: Double, v: Double): (Double, Double) = {
              val rx = (0 to 3).map(i => bez(v, P(i)(0)._1, P(i)(1)._1,
                P(i)(2)._1, P(i)(3)._1))
              val ry = (0 to 3).map(i => bez(v, P(i)(0)._2, P(i)(1)._2,
                P(i)(2)._2, P(i)(3)._2))
              (bez(u, rx(0), rx(1), rx(2), rx(3)),
                bez(u, ry(0), ry(1), ry(2), ry(3)))
            }
            def mix(a: Int, b: Int, t: Double): Int = {
              def ch(sh: Int): Int = {
                val v = ((a >> sh) & 0xff) +
                  (((b >> sh) & 0xff) - ((a >> sh) & 0xff)) * t
                math.max(0, math.min(255, v.round.toInt))
              }
              (0xff << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
            }
            // bilinear corner colors: c1 at (u,v)=(0,0), c2 at (0,1),
            // c3 at (1,1), c4 at (1,0)
            def colAt(u: Double, v: Double): Int =
              mix(mix(cols(0), cols(1), v), mix(cols(3), cols(2), v), u)
            val n = 8
            var a = 0
            while (a < n) {
              var b = 0
              while (b < n) {
                val u0 = a.toDouble / n; val u1 = (a + 1).toDouble / n
                val v0 = b.toDouble / n; val v1 = (b + 1).toDouble / n
                val q00 = (surf(u0, v0), colAt(u0, v0))
                val q01 = (surf(u0, v1), colAt(u0, v1))
                val q10 = (surf(u1, v0), colAt(u1, v0))
                val q11 = (surf(u1, v1), colAt(u1, v1))
                tri(q00, q01, q10)
                tri(q01, q11, q10)
                b += 1
              }
              a += 1
            }
            prevP = pts; prevC = cols
          }
        }
    }
    if (tris.isEmpty) { notes += "shading-mesh-empty"; None }
    else Some(tris.toArray)
  }

  /** Fixture twin: big-endian bit packer for mesh shading streams
    * (tests and oracle gates synthesize vertex/patch data with it).
    */
  final class MeshBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nb = 0
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1L)
        nb += 1
        if (nb == 8) { out.write(acc.toInt & 0xff); acc = 0; nb = 0 }
        k -= 1
      }
    }
    def align(): Unit = if (nb > 0) bits(0L, 8 - nb)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** Shading-dict area semantics over any shading paint: /BBox clips
    * in SHADING space (nothing paints outside it, §8.7.4.3), and
    * /Background fills pixels the shading itself leaves unpainted —
    * pattern fills only; ignored for `sh` (spec).
    */
  private final class ShadingAreaPaint(inner: java.awt.Paint,
      bbox: Option[Vector[Double]], bgArgb: Int,
      shadeToDev: AffineTransform) extends java.awt.Paint {
    def getTransparency: Int = java.awt.Transparency.TRANSLUCENT
    def createContext(cm: java.awt.image.ColorModel,
        deviceBounds: java.awt.Rectangle,
        userBounds: java.awt.geom.Rectangle2D,
        xform: AffineTransform,
        hints: RenderingHints): java.awt.PaintContext = {
      val ic = inner.createContext(cm, deviceBounds, userBounds, xform,
        hints)
      val full = new AffineTransform(xform)
      full.concatenate(shadeToDev)
      val inv =
        try full.createInverse()
        catch {
          case _: java.awt.geom.NoninvertibleTransformException =>
            new AffineTransform()
        }
      new java.awt.PaintContext {
        private val model = java.awt.image.ColorModel.getRGBdefault
        def dispose(): Unit = ic.dispose()
        def getColorModel: java.awt.image.ColorModel = model
        def getRaster(x: Int, y: Int, w: Int,
            h: Int): java.awt.image.Raster = {
          val src = ic.getRaster(x, y, w, h)
          val data = new Array[Int](w * h)
          src.getDataElements(src.getMinX, src.getMinY, w, h, data)
          val out = model.createCompatibleWritableRaster(w, h)
          val p = new java.awt.geom.Point2D.Double()
          var j = 0
          while (j < h) {
            var i = 0
            while (i < w) {
              p.setLocation(x + i + 0.5, y + j + 0.5)
              inv.transform(p, p)
              val in = bbox.forall(b => p.getX >= b(0) && p.getX <= b(2)
                && p.getY >= b(1) && p.getY <= b(3))
              val v = data(j * w + i)
              data(j * w + i) =
                if (!in) 0
                else if (v == 0) bgArgb // 0 = no background
                else v
              i += 1
            }
            j += 1
          }
          out.setDataElements(0, 0, w, h, data)
          out
        }
      }
    }
  }

  /** Shading → AWT paint in DEVICE space (`base` maps shading space to
    * device). Type 1 evaluates its 2-in function per inverse-mapped
    * pixel (unpainted outside /Domain); types 2/3 are the exact
    * axial/radial paints with stops from the function's natural
    * breakpoints; types 4-7 parse the mesh vertex/patch STREAM
    * (`shRaw` must be the un-resolved reference so the stream data is
    * reachable) into Gouraud triangles — Coons/tensor patches
    * tessellate the bicubic surface on a parameter grid with the
    * spec's exact bilinear corner-color interpolation.
    */
  private def shadingPaint(doc: Doc, shRaw: PVal, base: AffineTransform,
      notes: mutable.Set[String], isPattern: Boolean = false)
      : Option[java.awt.Paint] = {
    val shd = doc.resolve(shRaw) match {
      case d: PDict => d
      case _ => return None
    }
    shadingPaintInner(doc, shRaw, shd, base, notes).map { inner =>
      val bbox = dArr(doc, shd, "BBox").filter(_.length == 4)
        .map(_.map(x => num(doc.resolve(x))))
        .map(b => Vector(math.min(b(0), b(2)), math.min(b(1), b(3)),
          math.max(b(0), b(2)), math.max(b(1), b(3))))
      // /Background applies to pattern fills only, never to `sh`
      val bg =
        if (!isPattern) 0
        else dArr(doc, shd, "Background") match {
          case Some(comps) =>
            val cs = dGet(doc, shd, "ColorSpace")
              .map(colorSpaceOf(doc, _, PDict(Map.empty), notes))
              .getOrElse(CsRgb)
            colorFrom(cs, comps.map(x => num(doc.resolve(x)))).getRGB |
              0xff000000
          case None => 0
        }
      if (bbox.isEmpty && bg == 0) inner
      else new ShadingAreaPaint(inner, bbox, bg, new AffineTransform(base))
    }
  }

  private def shadingPaintInner(doc: Doc, shRaw: PVal, sh: PDict,
      base: AffineTransform,
      notes: mutable.Set[String]): Option[java.awt.Paint] = {
    val cs = dGet(doc, sh, "ColorSpace")
      .map(colorSpaceOf(doc, _, PDict(Map.empty), notes)).getOrElse(CsRgb)
    dNum(doc, sh, "ShadingType", 0).toInt match {
      case 1 =>
        // function-based shading: color(s, t) over /Domain via /Matrix
        val fn = sh.m.get("Function").flatMap(pdfFunctionN(doc, _))
          .getOrElse { notes += "shading-function-skipped"; return None }
        val dom = dArr(doc, sh, "Domain").filter(_.length == 4)
          .map(_.map(x => num(doc.resolve(x))))
          .getOrElse(Vector(0.0, 1.0, 0.0, 1.0))
        val mtx = dArr(doc, sh, "Matrix").filter(_.length == 6)
          .map(_.map(x => num(doc.resolve(x))))
          .map(m => new AffineTransform(m(0), m(1), m(2), m(3), m(4), m(5)))
          .getOrElse(new AffineTransform())
        return Some(new FunctionShadingPaint(fn, cs, dom.toArray, mtx,
          new AffineTransform(base)))
      case t if t >= 4 && t <= 7 =>
        val bytes = doc.streamOf(shRaw).getOrElse {
          notes += "shading-mesh-data-missing"; return None
        }
        return parseMeshTriangles(doc, sh, t, bytes, cs, notes)
          .map(tris =>
            new MeshShadingPaint(tris, new AffineTransform(base)))
      case _ => // types 2/3 fall through to the gradient machinery
    }
    val fnV = sh.m.get("Function").getOrElse(return None)
    val fn = pdfFunction(doc, fnV).getOrElse {
      notes += "shading-function-skipped"; return None
    }
    val stops0 = fnStops(doc, fnV).map(t => math.max(0.0, math.min(1.0, t)))
      .distinct.sorted
    // strictly increasing floats for MultipleGradientPaint
    val stops = stops0.foldLeft(Vector.empty[Double]) { (acc, t) =>
      if (acc.nonEmpty && t - acc.last < 1e-6) acc else acc :+ t
    } match {
      case v if v.length >= 2 => v
      case _ => Vector(0.0, 1.0)
    }
    val fracs = stops.map(_.toFloat).toArray
    val colors = stops.map(t => colorFrom(cs, fn(t))).toArray
    val coords = dArr(doc, sh, "Coords")
      .map(_.map(x => num(doc.resolve(x)))).getOrElse(return None)
    def devPt(x: Double, y: Double): java.awt.geom.Point2D.Double = {
      val p = new java.awt.geom.Point2D.Double(x, y)
      base.transform(p, p)
      p
    }
    val ext = dArr(doc, sh, "Extend").map(_.map(doc.resolve))
      .getOrElse(Vector.empty)
    def extAt(i: Int): Boolean = ext.lift(i).contains(PBool(true))
    // 256-entry color LUT over t∈[0,1] via the gradient stops
    lazy val lut = Array.tabulate(256) { i =>
      val t = i / 255.0
      var k = 0
      while (k < fracs.length - 1 && t > fracs(k + 1)) k += 1
      val f0 = fracs(k); val f1 = fracs(math.min(k + 1, fracs.length - 1))
      val c0 = colors(k)
      val c1 = colors(math.min(k + 1, colors.length - 1))
      val u = if (f1 > f0) ((t - f0) / (f1 - f0)).min(1.0).max(0.0)
        else 0.0
      def mix(a: Int, b: Int) = (a + (b - a) * u).round.toInt
      (0xff << 24) | (mix(c0.getRed, c1.getRed) << 16) |
        (mix(c0.getGreen, c1.getGreen) << 8) |
        mix(c0.getBlue, c1.getBlue)
    }
    dNum(doc, sh, "ShadingType", 0).toInt match {
      case 2 if coords.length >= 4 =>
        // EXACT axial blend solved in shading space — exact under shear
        // (AWT LinearGradientPaint keeps iso-lines perpendicular in
        // device space) and honoring /Extend false as unpainted (AWT
        // NO_CYCLE clamps to the end colors)
        val p0 = devPt(coords(0), coords(1))
        val p1 = devPt(coords(2), coords(3))
        if (p0.distance(p1) < 1e-9) None
        else Some(new AxialShadingPaint(coords(0), coords(1),
          coords(2), coords(3), lut, extAt(0), extAt(1),
          new AffineTransform(base)))
      case 3 if coords.length >= 6 =>
        // EXACT two-circle blend (ISO 32000-1 §8.7.4.5.4) solved in
        // shading space: per inverse-mapped pixel, the largest s with
        // |p − c(s)| = r(s) solves a quadratic in closed form — r0 > 0
        // included (no AWT focus approximation), and anisotropic /
        // rotated / sheared base transforms (circle → ellipse in device
        // space) exact by construction.
        if (coords(5) <= 0 && coords(2) <= 0) None
        else Some(new RadialShadingPaint(coords(0), coords(1), coords(2),
          coords(3), coords(4), coords(5), lut, extAt(0), extAt(1),
          new AffineTransform(base)))
      case other =>
        notes += s"shading-type-$other-skipped"
        None
    }
  }

  // ===================== interpreter =====================

  private def csByArity(n: Int): Cs = n match {
    case 1 => CsGray
    case 4 => CsCmyk
    case _ => CsRgb
  }

  private def colorFrom(cs: Cs, comps: Seq[Double]): Color = {
    def c(v: Double) = math.max(0f, math.min(1f, v.toFloat))
    cs match {
      case CsRgb if comps.length >= 3 =>
        new Color(c(comps(0)), c(comps(1)), c(comps(2)))
      case CsGray if comps.nonEmpty =>
        new Color(c(comps(0)), c(comps(0)), c(comps(0)))
      case CsCmyk if comps.length >= 4 =>
        new Color(cmykToRgb(comps(0), comps(1), comps(2), comps(3)))
      case CsIndexed(base, pal) if comps.nonEmpty =>
        val idx = comps(0).toInt
        base match {
          case CsRgb if idx * 3 + 2 < pal.length =>
            new Color(pal(idx * 3) & 0xff, pal(idx * 3 + 1) & 0xff,
              pal(idx * 3 + 2) & 0xff)
          case CsGray if idx < pal.length =>
            val v = pal(idx) & 0xff; new Color(v, v, v)
          case _ => Color.BLACK
        }
      case CsTint(_, fn, alt) if comps.nonEmpty =>
        // real tint transform (type 0/2/3/4) into the alternate space;
        // a failing program falls back to the 1−tint gray convention
        try colorFrom(alt, fn(comps))
        catch {
          case _: IllegalArgumentException | _: IndexOutOfBoundsException =>
            val v = c(1.0 - comps(0)); new Color(v, v, v)
        }
      case _ if comps.nonEmpty => // Separation without transform: 1 - tint
        val v = c(1.0 - comps(0)); new Color(v, v, v)
      case _ => Color.BLACK
    }
  }

  /** Device-space stroke for a device-space path: width scaled by the
    * CTM's isotropic scale factor (exact for uniform scales — the norm;
    * the anisotropic residual is the documented approximation).
    */
  private def strokeFor(st: GState): BasicStroke = {
    val det = math.abs(st.ctm.getDeterminant)
    val k = math.sqrt(det)
    val w = math.max(st.lineWidth * k, 0.0).toFloat
    st.dash match {
      case Some((pattern, phase)) if pattern.nonEmpty &&
          pattern.exists(_ > 0) =>
        new BasicStroke(w, st.cap, st.join, math.max(st.miter, 1f),
          pattern.map(d => math.max(d * k.toFloat, 0.01f)), phase * k.toFloat)
      case _ =>
        new BasicStroke(w, st.cap, st.join, math.max(st.miter, 1f))
    }
  }

  private def applyClip(g: Graphics2D, st: GState): Unit =
    g.setClip(st.clip.orNull)

  private def alphaComposite(a: Float): java.awt.AlphaComposite =
    java.awt.AlphaComposite.getInstance(
      java.awt.AlphaComposite.SRC_OVER, math.max(0f, math.min(1f, a)))

  // Execute one content stream against graphics target `g`.
  // `res` is the active resource dict; `depth` bounds Form/Type3 recursion.
  private def execContent(content: Array[Byte], res: PDict, g: Graphics2D,
      st0: GState, doc: Doc, depth: Int, budget: Budget,
      notes: mutable.Set[String]): GState = {
    require(depth < 12, "content recursion too deep")
    var st = st0
    val stack = mutable.ArrayDeque.empty[GState]
    val lx = new Lexer(new String(content, ISO_8859_1))
    val operands = mutable.ArrayBuffer.empty[PVal]
    // missing operands pad with 0.0 so corrupt streams degrade, not crash
    def popN(n: Int): Seq[Double] = {
      val vals = operands.takeRight(n).map(num).toSeq
      if (vals.length >= n) vals
      else Seq.fill(n - vals.length)(0.0) ++ vals
    }
    // current path, DEVICE space (points transformed by CTM on append)
    var path = new Path2D.Double()
    var haveCurrent = false
    var curUX, curUY = 0.0 // last point in USER space (for v/y/c controls)
    var startUX, startUY = 0.0
    var pendingClip = 0 // 0 none, 1 nonzero, 2 evenodd
    // text
    var tm = new AffineTransform()
    var tlm = new AffineTransform()

    def dev(x: Double, y: Double): (Double, Double) = {
      val p = new java.awt.geom.Point2D.Double(x, y)
      st.ctm.transform(p, p)
      (p.getX, p.getY)
    }
    def moveTo(x: Double, y: Double): Unit = {
      val (dx, dy) = dev(x, y)
      path.moveTo(dx, dy); haveCurrent = true
      curUX = x; curUY = y; startUX = x; startUY = y
      budget.seg()
    }
    def lineTo(x: Double, y: Double): Unit = {
      if (!haveCurrent) moveTo(x, y)
      else {
        val (dx, dy) = dev(x, y)
        path.lineTo(dx, dy); curUX = x; curUY = y
        budget.seg()
      }
    }
    def curveTo(x1: Double, y1: Double, x2: Double, y2: Double,
        x3: Double, y3: Double): Unit = {
      if (!haveCurrent) moveTo(x3, y3)
      else {
        val (d1x, d1y) = dev(x1, y1); val (d2x, d2y) = dev(x2, y2)
        val (d3x, d3y) = dev(x3, y3)
        path.curveTo(d1x, d1y, d2x, d2y, d3x, d3y)
        curUX = x3; curUY = y3
        budget.seg()
      }
    }
    def closePath(): Unit =
      if (haveCurrent) { path.closePath(); curUX = startUX; curUY = startUY }

    def paintPath(doFill: Boolean, doStroke: Boolean, evenOdd: Boolean,
        close: Boolean): Unit = {
      if (close) closePath()
      applyClip(g, st)
      if (doFill) {
        path.setWindingRule(
          if (evenOdd) Path2D.WIND_EVEN_ODD else Path2D.WIND_NON_ZERO)
        g.setComposite(alphaComposite(st.fillAlpha))
        g.setPaint(st.fillPaint.getOrElse(st.fill))
        g.fill(path)
      }
      if (doStroke) {
        g.setComposite(alphaComposite(st.strokeAlpha))
        g.setPaint(st.strokePaint.getOrElse(st.stroke))
        g.setStroke(strokeFor(st))
        g.draw(path)
      }
      if (pendingClip != 0) {
        path.setWindingRule(
          if (pendingClip == 2) Path2D.WIND_EVEN_ODD else Path2D.WIND_NON_ZERO)
        val area = new Area(path)
        st.clip = Some(st.clip.map { c =>
          val n = new Area(c); n.intersect(area); n
        }.getOrElse(area))
        pendingClip = 0
      }
      path = new Path2D.Double()
      haveCurrent = false
    }

    def resDict(cls: String, nm: String): Option[PVal] =
      dDict(doc, res, cls).flatMap(_.m.get(nm))

    val fontCache = mutable.Map.empty[String, FontRec]
    def setFont(nm: String, size: Double): Unit = {
      st.fontSize = size
      st.font = fontCache.getOrElseUpdate(nm,
        resDict("Font", nm).map(doc.resolve) match {
          case Some(fd: PDict) => loadFont(doc, fd, notes)
          case _ =>
            notes += s"font-missing-$nm"
            OutlineFont(Some(substituteFont("Helvetica")), byGlyphId = false,
              Map.empty, 0.5, twoByte = false, Map.empty, Map.empty,
              symbolic = false)
        })
    }

    val frc = new java.awt.font.FontRenderContext(null, true, true)

    /** `/Pattern` entry → AWT paint. Tiling (PatternType 1): the cell
      * content renders through THIS interpreter into an offscreen tile.
      * Axis-aligned pattern matrices use a device-anchored TexturePaint
      * (fast path); ROTATED/SHEARED matrices use `TiledPatternPaint`, a
      * custom java.awt.Paint whose context inverse-maps every device
      * pixel into pattern space and samples a pattern-space cell raster
      * with modular wraparound — closing the former
      * "pattern-rotated-skipped" render skip. Shading (PatternType 2):
      * gradient paint via shadingPaint. Pattern space anchors to the
      * PAGE's default space (st.baseCtm), independent of the current
      * CTM, per the spec.
      */
    def resolvePattern(nm: String): Option[java.awt.Paint] = {
      val (pd, cellBytes): (PDict, Option[Array[Byte]]) =
        resDict("Pattern", nm) match {
          case Some(PRef(n)) => doc.objs.get(n) match {
            case Some(o) =>
              val d = parseValue(o.dict) match {
                case x: PDict => x
                case _ => PDict(Map.empty)
              }
              (d, if (o.stream.isDefined) Some(Pdf.decodedStream(o))
              else None)
            case None => return None
          }
          case Some(d: PDict) => (d, None)
          case _ => return None
        }
      val mat = dArr(doc, pd, "Matrix").filter(_.length == 6).map { a =>
        new AffineTransform(num(a(0)), num(a(1)), num(a(2)), num(a(3)),
          num(a(4)), num(a(5)))
      }.getOrElse(new AffineTransform())
      val dTrans = new AffineTransform(st.baseCtm)
      dTrans.concatenate(mat)
      def recolorStencil(tile: BufferedImage): Unit =
        if (dNum(doc, pd, "PaintType", 1).toInt == 2) {
          val rgb = st.fill.getRGB & 0xffffff
          var y = 0
          while (y < tile.getHeight) {
            var x = 0
            while (x < tile.getWidth) {
              val a = tile.getRGB(x, y) >>> 24
              tile.setRGB(x, y, (a << 24) | rgb)
              x += 1
            }
            y += 1
          }
        }
      def rotatedTilingPaint(content: Array[Byte]): Option[java.awt.Paint] = {
        val bbox = dArr(doc, pd, "BBox").filter(_.length == 4)
          .map(_.map(x => num(doc.resolve(x)))).getOrElse(return None)
        val xs = dNum(doc, pd, "XStep", bbox(2) - bbox(0))
        val ys = dNum(doc, pd, "YStep", bbox(3) - bbox(1))
        // device px per pattern unit: the isotropic scale of dTrans
        val s = math.sqrt(math.abs(dTrans.getDeterminant))
        if (xs <= 0 || ys <= 0 || s <= 0) {
          notes += "pattern-cell-skipped"
          return None
        }
        val cellW = math.max(1, math.ceil(xs * s).toInt)
        val cellH = math.max(1, math.ceil(ys * s).toInt)
        if (cellW.toLong * cellH > (1 << 22)) {
          notes += "pattern-cell-skipped"
          return None
        }
        val tile = new BufferedImage(cellW, cellH,
          BufferedImage.TYPE_INT_ARGB)
        val cg = tile.createGraphics()
        try {
          cg.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
            RenderingHints.VALUE_ANTIALIAS_ON)
          cg.setRenderingHint(RenderingHints.KEY_STROKE_CONTROL,
            RenderingHints.VALUE_STROKE_PURE)
          val cst = new GState
          // pattern-space raster: (u,v) → (u·s, cellH − v·s), y-up → y-down
          val cm2 = new AffineTransform()
          cm2.translate(0, cellH)
          cm2.scale(s, -s)
          cst.ctm = cm2
          cst.baseCtm = new AffineTransform(cm2)
          val pres = dDict(doc, pd, "Resources").getOrElse(res)
          execContent(content, pres, cg, cst, doc, depth + 1, budget,
            notes)
        } finally cg.dispose()
        recolorStencil(tile)
        Some(new TiledPatternPaint(tile, xs, ys, s,
          new AffineTransform(dTrans)))
      }
      dNum(doc, pd, "PatternType", 1).toInt match {
        case 2 =>
          // pass the RAW value: mesh shadings (4-7) are stream objects
          // and the paint needs their data, not just the dict
          pd.m.get("Shading") match {
            case Some(sv) =>
              shadingPaint(doc, sv, dTrans, notes, isPattern = true)
            case _ => None
          }
        case 1 =>
          val content = cellBytes.getOrElse(return None)
          if (math.abs(dTrans.getShearX) > 1e-9 ||
            math.abs(dTrans.getShearY) > 1e-9) {
            // rotated/sheared matrix: pattern-space cell raster sampled
            // through the inverse device→pattern map per pixel
            return rotatedTilingPaint(content)
          }
          val bbox = dArr(doc, pd, "BBox").filter(_.length == 4)
            .map(_.map(x => num(doc.resolve(x)))).getOrElse(return None)
          val xs = dNum(doc, pd, "XStep", bbox(2) - bbox(0))
          val ys = dNum(doc, pd, "YStep", bbox(3) - bbox(1))
          val cellW = math.round(math.abs(xs * dTrans.getScaleX)).toInt
          val cellH = math.round(math.abs(ys * dTrans.getScaleY)).toInt
          if (cellW < 1 || cellH < 1 || cellW.toLong * cellH > (1 << 22)) {
            notes += "pattern-cell-skipped"
            return None
          }
          // device anchor rect of the pattern-space tile [0,xs)x[0,ys)
          val c0 = new java.awt.geom.Point2D.Double(0, 0)
          val c1 = new java.awt.geom.Point2D.Double(xs, ys)
          dTrans.transform(c0, c0); dTrans.transform(c1, c1)
          val ax = math.min(c0.getX, c1.getX)
          val ay = math.min(c0.getY, c1.getY)
          val tile = new BufferedImage(cellW, cellH,
            BufferedImage.TYPE_INT_ARGB)
          val cg = tile.createGraphics()
          try {
            cg.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
              RenderingHints.VALUE_ANTIALIAS_ON)
            cg.setRenderingHint(RenderingHints.KEY_STROKE_CONTROL,
              RenderingHints.VALUE_STROKE_PURE)
            val cst = new GState
            cst.baseCtm = new AffineTransform(dTrans)
            val cm = new AffineTransform()
            cm.translate(-ax, -ay)
            cm.concatenate(dTrans)
            cst.ctm = cm
            val pres = dDict(doc, pd, "Resources").getOrElse(res)
            execContent(content, pres, cg, cst, doc, depth + 1, budget,
              notes)
          } finally cg.dispose()
          // PaintType 2 (uncolored): the cell is a stencil in the
          // CURRENT fill color; keep coverage, replace color
          recolorStencil(tile)
          Some(new java.awt.TexturePaint(tile,
            new java.awt.geom.Rectangle2D.Double(ax, ay, cellW, cellH)))
        case other =>
          notes += s"pattern-type-$other-skipped"
          None
      }
    }

    def showText(bytes: Array[Byte]): Unit = {
      if (st.font == null || st.fontSize == 0) {
        if (st.font == null) notes += "text-before-Tf"
        return
      }
      val codes: Seq[Int] =
        if (st.font.twoByte)
          bytes.grouped(2).map { p =>
            if (p.length == 2) ((p(0) & 0xff) << 8) | (p(1) & 0xff)
            else p(0) & 0xff
          }.toSeq
        else bytes.map(_ & 0xff).toSeq
      codes.foreach { code =>
        val isSpace = !st.font.twoByte && code == 32
        st.font match {
          case t3: Type3Font =>
            val w0glyph = t3.widths.getOrElse(code, 0.0)
            // run the glyph procedure through the interpreter
            if (st.renderMode != 3) {
              t3.encoding.get(code).flatMap(t3.charProcs.get) match {
                case Some(procRef) =>
                  doc.streamOf(procRef).foreach { proc =>
                    val gs = st.copyState()
                    val m = new AffineTransform(st.ctm)
                    m.concatenate(tm)
                    m.concatenate(new AffineTransform(
                      st.fontSize * st.hscale, 0, 0, st.fontSize, 0, st.rise))
                    m.concatenate(t3.matrix)
                    gs.ctm = m
                    val glyphRes = t3.resources.getOrElse(res)
                    execContent(proc, glyphRes, g, gs, doc, depth + 1,
                      budget, notes)
                  }
                case None => // unmapped code: no glyph
              }
            }
            // advance: glyph-space width vector through the FontMatrix
            val wText = t3.matrix.deltaTransform(
              new java.awt.geom.Point2D.Double(w0glyph, 0), null).getX
            val adv = (wText * st.fontSize + st.charSp +
              (if (isSpace) st.wordSp else 0.0)) * st.hscale
            tm.translate(adv, 0)
          case of: OutlineFont =>
            val w0 = of.widths.getOrElse(code,
              if (of.defaultWidth > 0) of.defaultWidth
              else of.awt.map(f =>
                f.getStringBounds(" ", frc).getWidth / 1000.0).getOrElse(0.5))
            if (st.renderMode != 3 && st.renderMode != 7) {
              val textM = new AffineTransform(st.ctm)
              textM.concatenate(tm)
              textM.concatenate(new AffineTransform(
                st.fontSize * st.hscale, 0, 0, st.fontSize, 0, st.rise))
              val shapeOpt: Option[java.awt.Shape] = of.cff match {
                case Some(cf) =>
                  // FontFile3: interpreter-exact Type 2 outlines (y-UP
                  // in charstring units; FontMatrix maps to text space)
                  val gid: Option[Int] =
                    if (of.byGlyphId) {
                      // Type0/Identity-H code = CID; CID-keyed charset
                      // maps CID → GID, plain CFF uses GID directly
                      if (cf.isCid) cf.cidToGid.get(code) else Some(code)
                    } else {
                      of.diffNames.get(code).flatMap(cf.nameToGid.get)
                        .orElse(cf.codeToGid.get(code))
                    }
                  gid.filter(gd => gd >= 0 && gd < cf.nGlyphs).map { gd =>
                    val m = new AffineTransform(textM)
                    val fm = cf.fontMatrix
                    m.concatenate(new AffineTransform(
                      fm(0), fm(1), fm(2), fm(3), fm(4), fm(5)))
                    m.createTransformedShape(cf.outline(gd))
                  }
                case None => of.awt.map { f =>
                  val gv =
                    if (of.byGlyphId)
                      f.createGlyphVector(frc, Array(code))
                    else {
                      val cp = of.toUnicode.get(code)
                        .orElse(of.diffNames.get(code).flatMap(glyphNameCp))
                        .getOrElse(
                          if (of.symbolic && f.canDisplay(0xF000 + code))
                            0xF000 + code
                          else code)
                      f.createGlyphVector(frc,
                        new String(Character.toChars(
                          if (Character.isValidCodePoint(cp)) cp else 0x20)))
                    }
                  val outline = gv.getOutline(0f, 0f) // y-down, 1000 upem
                  val m = new AffineTransform(textM)
                  m.concatenate(AffineTransform.getScaleInstance(
                    1 / 1000.0, -1 / 1000.0))
                  m.createTransformedShape(outline)
                }
              }
              shapeOpt.foreach { shape =>
                applyClip(g, st)
                if (st.renderMode == 0 || st.renderMode == 2 ||
                  st.renderMode == 4 || st.renderMode == 6) {
                  g.setComposite(alphaComposite(st.fillAlpha))
                  g.setPaint(st.fillPaint.getOrElse(st.fill))
                  g.fill(shape)
                }
                if (st.renderMode == 1 || st.renderMode == 2 ||
                  st.renderMode == 5 || st.renderMode == 6) {
                  g.setComposite(alphaComposite(st.strokeAlpha))
                  g.setPaint(st.strokePaint.getOrElse(st.stroke))
                  g.setStroke(strokeFor(st))
                  g.draw(shape)
                }
              }
            }
            val adv = (w0 * st.fontSize + st.charSp +
              (if (isSpace) st.wordSp else 0.0)) * st.hscale
            tm.translate(adv, 0)
          case _ =>
        }
      }
    }

    def drawXObject(nm: String): Unit = {
      resDict("XObject", nm) match {
        case Some(PRef(n)) =>
          doc.objs.get(n) match {
            case Some(o) =>
              val d = parseValue(o.dict) match {
                case x: PDict => x
                case _ => PDict(Map.empty)
              }
              dName(doc, d, "Subtype") match {
                case Some("Image") =>
                  decodeImage(doc, d, o.stream.getOrElse(Array.emptyByteArray),
                    Some(o), res, st.fill, notes).foreach { img =>
                    // unit square in user space ← image space
                    val t = new AffineTransform(st.ctm)
                    t.concatenate(new AffineTransform(
                      1.0 / img.getWidth, 0, 0, -1.0 / img.getHeight, 0, 1))
                    applyClip(g, st)
                    g.setComposite(alphaComposite(st.fillAlpha))
                    g.drawImage(img, t, null)
                  }
                case Some("Form") =>
                  val saved = st.copyState()
                  dArr(doc, d, "Matrix").filter(_.length == 6).foreach { a =>
                    st.ctm.concatenate(new AffineTransform(num(a(0)),
                      num(a(1)), num(a(2)), num(a(3)), num(a(4)), num(a(5))))
                  }
                  dArr(doc, d, "BBox").filter(_.length == 4).foreach { b =>
                    val bb = new Path2D.Double()
                    val x0 = num(b(0)); val y0 = num(b(1))
                    val x1 = num(b(2)); val y1 = num(b(3))
                    val pts = Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1))
                    pts.zipWithIndex.foreach { case ((x, y), i) =>
                      val p = new java.awt.geom.Point2D.Double(x, y)
                      st.ctm.transform(p, p)
                      if (i == 0) bb.moveTo(p.getX, p.getY)
                      else bb.lineTo(p.getX, p.getY)
                    }
                    bb.closePath()
                    val area = new Area(bb)
                    st.clip = Some(st.clip.map { c =>
                      val nn = new Area(c); nn.intersect(area); nn
                    }.getOrElse(area))
                  }
                  val formRes = dDict(doc, d, "Resources").getOrElse(res)
                  val content = Pdf.decodedStream(o)
                  st = execContent(content, formRes, g, st, doc, depth + 1,
                    budget, notes)
                  st = saved
                case other =>
                  notes += s"xobject-${other.getOrElse("untyped")}"
              }
            case None => notes += s"xobject-missing-$nm"
          }
        case _ => notes += s"xobject-missing-$nm"
      }
    }

    def inlineImage(): Unit = {
      // key/value pairs until ID, then raw payload until EI
      val kv = Map.newBuilder[String, PVal]
      var done = false
      while (!done && !lx.atEnd) {
        lx.next() match {
          case POp("ID") => done = true
          case PName(k) =>
            if (!lx.atEnd) kv += k -> lx.next()
          case _ =>
        }
      }
      val d = PDict(kv.result())
      val len = d.m.get("L").orElse(d.m.get("Length")).map(v => num(doc.resolve(v)).toInt)
      val payload = lx.inlineImageData(len)
      decodeImage(doc, d, payload, None, res, st.fill,
        notes).foreach { img =>
        val t = new AffineTransform(st.ctm)
        t.concatenate(new AffineTransform(
          1.0 / img.getWidth, 0, 0, -1.0 / img.getHeight, 0, 1))
        applyClip(g, st)
        g.setComposite(alphaComposite(st.fillAlpha))
        g.drawImage(img, t, null)
      }
    }

    def applyExtGState(nm: String): Unit = {
      resDict("ExtGState", nm).map(doc.resolve) match {
        case Some(gd: PDict) =>
          gd.m.get("LW").map(v => num(doc.resolve(v))).foreach(st.lineWidth = _)
          gd.m.get("CA").map(v => num(doc.resolve(v))).foreach(v =>
            st.strokeAlpha = v.toFloat)
          gd.m.get("ca").map(v => num(doc.resolve(v))).foreach(v =>
            st.fillAlpha = v.toFloat)
          gd.m.get("LC").map(v => num(doc.resolve(v)).toInt).foreach(st.cap = _)
          gd.m.get("LJ").map(v => num(doc.resolve(v)).toInt).foreach(st.join = _)
          if (gd.m.contains("SMask")) notes += "extgstate-smask"
        case _ =>
      }
    }

    while (!lx.atEnd) {
      lx.next() match {
        case POp(op) =>
          budget.op()
          op match {
            // ---- graphics state ----
            case "q" => stack.append(st.copyState())
            case "Q" => if (stack.nonEmpty) st = stack.removeLast()
            case "cm" =>
              val Seq(a, b, c, d, e, f) = popN(6)
              st.ctm.concatenate(new AffineTransform(a, b, c, d, e, f))
            case "w" => st.lineWidth = popN(1).head
            case "J" => st.cap = popN(1).head.toInt match {
              case 1 => BasicStroke.CAP_ROUND
              case 2 => BasicStroke.CAP_SQUARE
              case _ => BasicStroke.CAP_BUTT
            }
            case "j" => st.join = popN(1).head.toInt match {
              case 1 => BasicStroke.JOIN_ROUND
              case 2 => BasicStroke.JOIN_BEVEL
              case _ => BasicStroke.JOIN_MITER
            }
            case "M" => st.miter = popN(1).head.toFloat
            case "d" =>
              (operands.lift(operands.length - 2),
                operands.lastOption) match {
                case (Some(PArr(a)), Some(PNum(ph))) =>
                  val pat = a.map(v => num(doc.resolve(v)).toFloat).toArray
                  st.dash = if (pat.isEmpty || pat.forall(_ == 0f)) None
                    else Some((pat, ph.toFloat))
                case _ => st.dash = None
              }
            case "ri" | "i" => // rendering intent / flatness: no-op
            case "gs" => operands.lastOption match {
              case Some(PName(nm)) => applyExtGState(nm)
              case _ =>
            }
            // ---- path construction ----
            case "m" => val Seq(x, y) = popN(2); moveTo(x, y)
            case "l" => val Seq(x, y) = popN(2); lineTo(x, y)
            case "c" =>
              val Seq(x1, y1, x2, y2, x3, y3) = popN(6)
              curveTo(x1, y1, x2, y2, x3, y3)
            case "v" =>
              val Seq(x2, y2, x3, y3) = popN(4)
              curveTo(curUX, curUY, x2, y2, x3, y3)
            case "y" =>
              val Seq(x1, y1, x3, y3) = popN(4)
              curveTo(x1, y1, x3, y3, x3, y3)
            case "h" => closePath()
            case "re" =>
              val Seq(x, y, rw, rh) = popN(4)
              moveTo(x, y); lineTo(x + rw, y); lineTo(x + rw, y + rh)
              lineTo(x, y + rh); closePath()
            // ---- path painting ----
            case "S" => paintPath(doFill = false, doStroke = true,
              evenOdd = false, close = false)
            case "s" => paintPath(doFill = false, doStroke = true,
              evenOdd = false, close = true)
            case "f" | "F" => paintPath(doFill = true, doStroke = false,
              evenOdd = false, close = true)
            case "f*" => paintPath(doFill = true, doStroke = false,
              evenOdd = true, close = true)
            case "B" => paintPath(doFill = true, doStroke = true,
              evenOdd = false, close = false)
            case "B*" => paintPath(doFill = true, doStroke = true,
              evenOdd = true, close = false)
            case "b" => paintPath(doFill = true, doStroke = true,
              evenOdd = false, close = true)
            case "b*" => paintPath(doFill = true, doStroke = true,
              evenOdd = true, close = true)
            case "n" => paintPath(doFill = false, doStroke = false,
              evenOdd = false, close = false)
            case "W" => pendingClip = 1
            case "W*" => pendingClip = 2
            // ---- color ----
            case "rg" =>
              val c = popN(3); st.fillCs = CsRgb; st.fill = colorFrom(CsRgb, c)
              st.fillPaint = None
            case "RG" =>
              val c = popN(3); st.strokeCs = CsRgb
              st.stroke = colorFrom(CsRgb, c); st.strokePaint = None
            case "g" =>
              val c = popN(1); st.fillCs = CsGray
              st.fill = colorFrom(CsGray, c); st.fillPaint = None
            case "G" =>
              val c = popN(1); st.strokeCs = CsGray
              st.stroke = colorFrom(CsGray, c); st.strokePaint = None
            case "k" =>
              val c = popN(4); st.fillCs = CsCmyk
              st.fill = colorFrom(CsCmyk, c); st.fillPaint = None
            case "K" =>
              val c = popN(4); st.strokeCs = CsCmyk
              st.stroke = colorFrom(CsCmyk, c); st.strokePaint = None
            case "cs" => operands.lastOption match {
              case Some(v) =>
                st.fillCs = colorSpaceOf(doc, v, res, notes)
                st.fill = Color.BLACK; st.fillPaint = None
              case _ =>
            }
            case "CS" => operands.lastOption match {
              case Some(v) =>
                st.strokeCs = colorSpaceOf(doc, v, res, notes)
                st.stroke = Color.BLACK; st.strokePaint = None
              case _ =>
            }
            case "sc" | "scn" =>
              operands.lastOption match {
                case Some(PName(pn)) =>
                  // uncolored (PaintType 2) patterns carry the stencil
                  // color as leading operands in the underlying space
                  val nums = operands.collect { case PNum(v) => v }.toSeq
                  if (nums.nonEmpty)
                    st.fill = colorFrom(csByArity(nums.length), nums)
                  resolvePattern(pn) match {
                    case Some(paint) => st.fillPaint = Some(paint)
                    case None => notes += "pattern-fill-skipped"
                  }
                case _ =>
                  val nums = operands.collect { case PNum(v) => v }.toSeq
                  if (nums.nonEmpty) st.fill = colorFrom(st.fillCs, nums)
                  st.fillPaint = None
              }
            case "SC" | "SCN" =>
              operands.lastOption match {
                case Some(PName(pn)) =>
                  val nums = operands.collect { case PNum(v) => v }.toSeq
                  if (nums.nonEmpty)
                    st.stroke = colorFrom(csByArity(nums.length), nums)
                  resolvePattern(pn) match {
                    case Some(paint) => st.strokePaint = Some(paint)
                    case None => notes += "pattern-stroke-skipped"
                  }
                case _ =>
                  val nums = operands.collect { case PNum(v) => v }.toSeq
                  if (nums.nonEmpty) st.stroke = colorFrom(st.strokeCs, nums)
                  st.strokePaint = None
              }
            // ---- text ----
            case "BT" => tm = new AffineTransform(); tlm = new AffineTransform()
            case "ET" => // text clip modes (4-7) unsupported beyond fill part
            case "Tf" =>
              (operands.lift(operands.length - 2), operands.lastOption) match {
                case (Some(PName(nm)), Some(PNum(size))) => setFont(nm, size)
                case _ =>
              }
            case "Td" =>
              val Seq(tx, ty) = popN(2)
              tlm.translate(tx, ty); tm = new AffineTransform(tlm)
            case "TD" =>
              val Seq(tx, ty) = popN(2)
              st.leading = -ty
              tlm.translate(tx, ty); tm = new AffineTransform(tlm)
            case "Tm" =>
              val Seq(a, b, c, d, e, f) = popN(6)
              tlm = new AffineTransform(a, b, c, d, e, f)
              tm = new AffineTransform(tlm)
            case "T*" =>
              tlm.translate(0, -st.leading); tm = new AffineTransform(tlm)
            case "TL" => st.leading = popN(1).head
            case "Tc" => st.charSp = popN(1).head
            case "Tw" => st.wordSp = popN(1).head
            case "Tz" => st.hscale = popN(1).head / 100.0
            case "Ts" => st.rise = popN(1).head
            case "Tr" => st.renderMode = popN(1).head.toInt
            case "Tj" => operands.lastOption match {
              case Some(PStr(b)) => showText(b)
              case _ =>
            }
            case "'" =>
              tlm.translate(0, -st.leading); tm = new AffineTransform(tlm)
              operands.lastOption match {
                case Some(PStr(b)) => showText(b)
                case _ =>
              }
            case "\"" =>
              (operands.lift(operands.length - 3),
                operands.lift(operands.length - 2),
                operands.lastOption) match {
                case (Some(PNum(aw)), Some(PNum(ac)), Some(PStr(b))) =>
                  st.wordSp = aw; st.charSp = ac
                  tlm.translate(0, -st.leading); tm = new AffineTransform(tlm)
                  showText(b)
                case _ =>
              }
            case "TJ" => operands.lastOption match {
              case Some(PArr(items)) =>
                items.foreach {
                  case PStr(b) => showText(b)
                  case PNum(adj) =>
                    tm.translate(
                      -adj / 1000.0 * st.fontSize * st.hscale, 0)
                  case _ =>
                }
              case _ =>
            }
            // ---- XObjects / inline images ----
            case "Do" => operands.lastOption match {
              case Some(PName(nm)) => drawXObject(nm)
              case _ =>
            }
            case "BI" => inlineImage()
            // ---- Type3 glyph metrics ----
            case "d0" | "d1" => // advance comes from /Widths; d1 also
            // constrains color (we already inherit fill from the text op)
            // ---- marked content / compatibility ----
            case "BMC" | "BDC" | "EMC" | "MP" | "DP" | "BX" | "EX" =>
            case "sh" => operands.lastOption match {
              case Some(PName(shn)) =>
                resDict("Shading", shn) match {
                  case Some(sv) =>
                    // ISO 32000-1 §8.7.4.2: `sh` coordinates are in the
                    // CURRENT user space (CTM at invocation), unlike
                    // pattern dictionaries which anchor to default space.
                    // RAW value: mesh shadings are stream objects.
                    shadingPaint(doc, sv, new AffineTransform(st.ctm),
                        notes) match {
                      case Some(paint) =>
                        applyClip(g, st)
                        g.setComposite(alphaComposite(st.fillAlpha))
                        g.setPaint(paint)
                        // paint the full device surface through the clip
                        // (Java2D clips fills to the raster, so an
                        // oversized rect floods exactly the visible area)
                        g.fill(st.clip.map(_.getBounds2D).getOrElse(
                          new java.awt.geom.Rectangle2D.Double(
                            -1e6, -1e6, 2e6, 2e6)))
                      case None => notes += "shading-skipped"
                    }
                  case _ => notes += "shading-skipped"
                }
              case _ => notes += "shading-skipped"
            }
            case other => notes += s"op-$other"
          }
          operands.clear()
        case v => operands += v
      }
      if (operands.length > 64) operands.remove(0, operands.length - 64)
    }
    st
  }

  // ===================== page API =====================

  /** One rasterized page. `png` is RGB (white page background composited).
    * `unsupported` names constructs skipped on this page (empty for fully
    * supported content).
    */
  final case class RenderedPage(page: Int, width: Int, height: Int,
      png: Array[Byte], unsupported: Seq[String])

  private val MaxPagePixels = 1 << 26

  /** Inherited page attribute (/MediaBox /Resources /Rotate live on the
    * page OR any ancestor /Pages node).
    */
  private def inherited(doc: Doc, pageDict: PDict, key: String): Option[PVal] = {
    var d = pageDict
    var depth = 0
    while (depth < 64) {
      dGet(doc, d, key) match {
        case Some(v) => return Some(v)
        case None =>
          d.m.get("Parent").map(doc.resolve) match {
            case Some(p: PDict) => d = p; depth += 1
            case _ => return None
          }
      }
    }
    None
  }

  /** Rasterize every page at `scale` (1.0 = 72 dpi, the reference's
    * `page.render()` default).
    */
  def renderPageImages(pdf: Array[Byte], scale: Double = 1.0,
      password: String = ""): Seq[RenderedPage] = {
    require(scale > 0 && scale <= 16, s"scale out of range: $scale")
    // corrupt input fails fast as IllegalArgumentException (the fuzz
    // battery's contract): parse/interpret slips on garbage bytes
    // (index/number-format/match errors) all normalize here
    def guarded[A](what: String)(body: => A): A =
      try body
      catch {
        case e: IllegalArgumentException => throw e
        case e @ (_: IndexOutOfBoundsException | _: NumberFormatException |
            _: MatchError | _: NoSuchElementException |
            _: NegativeArraySizeException | _: ArithmeticException |
            _: java.util.zip.ZipException | _: java.io.IOException) =>
          throw new IllegalArgumentException(
            s"corrupt PDF ($what): ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    val objs = guarded("objects")(Pdf.parseObjects(pdf, password))
    val doc = new Doc(objs)
    val order = guarded("page tree")(Pdf.pageOrder(objs))
    order.zipWithIndex.map { case (pnum, pi) => guarded(s"page ${pi + 1}") {
      val pageDict = parseValue(objs(pnum).dict) match {
        case d: PDict => d
        case _ => PDict(Map.empty)
      }
      val notes = mutable.Set.empty[String]
      val mb = inherited(doc, pageDict, "MediaBox") match {
        case Some(PArr(a)) if a.length == 4 =>
          (num(doc.resolve(a(0))), num(doc.resolve(a(1))),
            num(doc.resolve(a(2))), num(doc.resolve(a(3))))
        case _ => (0.0, 0.0, 612.0, 792.0)
      }
      val rotate = inherited(doc, pageDict, "Rotate") match {
        case Some(PNum(r)) => ((r.toInt % 360) + 360) % 360
        case _ => 0
      }
      val mbw = math.abs(mb._3 - mb._1)
      val mbh = math.abs(mb._4 - mb._2)
      require(mbw > 0 && mbh > 0, "degenerate /MediaBox")
      val (pw, ph) =
        if (rotate == 90 || rotate == 270) (mbh, mbw) else (mbw, mbh)
      val wpx = math.max(1, math.round(pw * scale).toInt)
      val hpx = math.max(1, math.round(ph * scale).toInt)
      require(wpx.toLong * hpx <= MaxPagePixels,
        s"page raster too large: ${wpx}x$hpx")
      val img = new BufferedImage(wpx, hpx, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
          RenderingHints.VALUE_ANTIALIAS_ON)
        g.setRenderingHint(RenderingHints.KEY_STROKE_CONTROL,
          RenderingHints.VALUE_STROKE_PURE)
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.setColor(Color.WHITE)
        g.fillRect(0, 0, wpx, hpx)
        val st = new GState
        // device ← user: flip y, scale, honor /Rotate and MediaBox origin
        val base = new AffineTransform()
        rotate match {
          case 90 => base.translate(wpx, 0); base.rotate(Math.PI / 2)
          case 180 => base.translate(wpx, hpx); base.rotate(Math.PI)
          case 270 => base.translate(0, hpx); base.rotate(-Math.PI / 2)
          case _ =>
        }
        base.scale(scale, -scale)
        base.translate(-mb._1, -mb._4)
        st.ctm = base
        st.baseCtm = new AffineTransform(base) // pattern-space anchor
        val res = inherited(doc, pageDict, "Resources") match {
          case Some(d: PDict) => d
          case _ => PDict(Map.empty)
        }
        // concatenated /Contents streams
        val content: Array[Byte] = (dGet(doc, pageDict, "Contents") match {
          case Some(PArr(refs)) => refs.flatMap(doc.streamOf(_))
          case Some(_) =>
            pageDict.m.get("Contents").flatMap(doc.streamOf).toVector
          case None => Vector.empty
        }).foldLeft(Array.emptyByteArray)((a, b) => a ++ Array(' '.toByte) ++ b)
        val budget = new Budget(2000000, 1000000)
        execContent(content, res, g, st, doc, 0, budget, notes)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      RenderedPage(pi + 1, wpx, hpx, bos.toByteArray, notes.toSeq.sorted)
    } }
  }

  // ===================== Spark surface =====================

  /** Column op: PDF → array of rendered pages
    * `struct<page:int, width:int, height:int, png:binary>` — the
    * document_splitter `elements=['image']` page-image surface (scale 1.0
    * ≡ the reference's default 72-dpi render).
    */
  private val renderPagesUdf = udf { (pdf: Array[Byte], scale: Double) =>
    if (pdf == null) null
    else renderPageImages(pdf, scale).map(r =>
      (r.page, r.width, r.height, r.png))
  }

  def renderPages(pdf: Column, scale: Double = 1.0): Column =
    renderPagesUdf(pdf, lit(scale))

  /** Error-capturing variant (the reference's on_error='ignore' shape):
    * per-document struct with either pages or an errormsg.
    */
  private val renderPagesSafeUdf = udf { (pdf: Array[Byte], scale: Double) =>
    if (pdf == null) null
    else
      try {
        val pages = renderPageImages(pdf, scale).map(r =>
          (r.page, r.width, r.height, r.png))
        (pages, null: String)
      } catch {
        case e: Exception =>
          (null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
  }

  def renderPagesSafe(pdf: Column, scale: Double = 1.0): Column =
    renderPagesSafeUdf(pdf, lit(scale))
}
