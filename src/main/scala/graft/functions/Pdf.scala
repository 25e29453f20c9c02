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
  *    ASCII85Decode, RunLengthDecode — singly or as a /Filter chain,
  *    with PNG/TIFF /DecodeParms predictors;
  *  - PDF 1.5+ object streams (/ObjStm) and encrypted documents
  *    (standard security handler: RC4, AES-128, AES-256 R5/R6 — empty or
  *    supplied user password); whatever remains out of reach raises
  *    cleanly and `pdfPagesSafe` captures it per cell.
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
      filters: Seq[String]): Array[Byte] =
    writePdfImpl(pages, filters, None)

  /** `writePdf` with standard-security-handler encryption: `method`
    * "rc4" (V2/R3, 128-bit), "aes" (V4/R4, AESV2), or "aes256" (V5/R6,
    * AESV3 with the Algorithm 2.B password hash). Empty `userPwd` is the
    * parser-readable owner-locked shape; a non-empty one produces a
    * genuinely password-protected file (the error-path fixture).
    */
  private[functions] def writePdfEncrypted(pages: Seq[String],
      method: String = "rc4", userPwd: String = ""): Array[Byte] =
    writePdfImpl(pages, Seq("FlateDecode"), Some((method, userPwd)))

  /** Fixture writer with embedded raster images: `images` maps 0-based
    * page index → image payload (JPEG embeds as a DCTDecode passthrough
    * XObject; anything ImageIO reads embeds as Flate-compressed
    * DeviceRGB samples) — the twin `extractImages` round-trips against.
    */
  def writePdfWithImages(pages: Seq[String],
      images: Map[Int, Array[Byte]]): Array[Byte] =
    writePdfImpl(pages, Seq("FlateDecode"), None, images)

  private def writePdfImpl(pages: Seq[String], filters: Seq[String],
      enc: Option[(String, String)],
      images: Map[Int, Array[Byte]] = Map.empty): Array[Byte] = {
    val objs = mutable.ArrayBuffer.empty[String] // 1-based object bodies
    def add(body: String): Int = { objs += body; objs.length }
    val filterEntry = filters match {
      case Seq() => ""
      case Seq(one) => s" /Filter /$one"
      case many => many.map("/" + _).mkString(" /Filter [", " ", "]")
    }
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    // fixture determinism: fixed file id and AES IV
    val id0 = Array.tabulate(16)(i => (i * 17 + 3).toByte)
    val cryptState = enc.map { case (method, userPwd) =>
      if (method == "aes256") { // V5/R6 (Algorithm 8: U/UE from the 2.B hash)
        val pwd = userPwd.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .take(127)
        val vSalt = Array.tabulate(8)(i => (i * 7 + 1).toByte)
        val kSalt = Array.tabulate(8)(i => (i * 11 + 5).toByte)
        val fileKey = Array.tabulate(32)(i => (i * 31 + 13).toByte)
        val u = PdfCrypt.hash2B(pwd, vSalt, Array.emptyByteArray) ++
          vSalt ++ kSalt
        val ue = PdfCrypt.aesNoPad(
          PdfCrypt.hash2B(pwd, kSalt, Array.emptyByteArray), fileKey,
          encrypt = true)
        // owner entries mirror the user ones (empty owner password, keyed
        // over the 48-byte /U per Algorithm 9)
        val ovSalt = Array.tabulate(8)(i => (i * 3 + 2).toByte)
        val okSalt = Array.tabulate(8)(i => (i * 13 + 7).toByte)
        val o48 = PdfCrypt.hash2B(Array.emptyByteArray, ovSalt, u) ++
          ovSalt ++ okSalt
        val oe = PdfCrypt.aesNoPad(
          PdfCrypt.hash2B(Array.emptyByteArray, okSalt, u), fileKey,
          encrypt = true)
        (Crypt(fileKey, aes = true, v5 = true), o48, u, 6, -1, Some((ue, oe)))
      } else {
        val aes = method == "aes"
        val r = if (aes) 4 else 3
        val keyLen = 16
        val o = PdfCrypt.ownerValue(keyLen, r)
        val pwdPadded = (userPwd.getBytes(ISO_8859_1) ++ PdfCrypt.Pad).take(32)
        val p = -1
        val key = PdfCrypt.fileKey(pwdPadded, o, p, id0, keyLen, r,
          encryptMetadata = true)
        val u = PdfCrypt.userValue(key, id0, r) ++ new Array[Byte](16)
        (Crypt(key, aes), o, u.take(32), r, p, None)
      }
    }
    def encryptStream(num: Int, z: Array[Byte]): Array[Byte] =
      cryptState match {
        case None => z
        case Some((c, _, _, _, _, _)) if c.v5 =>
          PdfCrypt.aesEncrypt(c.key, id0, z)
        case Some((c, _, _, _, _, _)) =>
          val k = PdfCrypt.objKey(c.key, num, 0, c.aes)
          if (c.aes) PdfCrypt.aesEncrypt(k, id0, z) else PdfCrypt.rc4(k, z)
      }

    val fontId = add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val pageIds = pages.zipWithIndex.map { case (text, pageIdx) =>
      // optional embedded image XObject for this page
      val imageId = images.get(pageIdx).map { bytes =>
        val isJpeg = bytes.length > 2 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xd8
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, "unreadable image payload for embedding")
        val (w, h) = (img.getWidth, img.getHeight)
        val (filterName, payload) =
          if (isJpeg) ("DCTDecode", bytes) // the stream IS the JPEG
          else {
            val rgb = new Array[Byte](w * h * 3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val px = img.getRGB(x, y)
                val at = (y * w + x) * 3
                rgb(at) = ((px >> 16) & 0xff).toByte
                rgb(at + 1) = ((px >> 8) & 0xff).toByte
                rgb(at + 2) = (px & 0xff).toByte
                x += 1
              }
              y += 1
            }
            ("FlateDecode", deflate(rgb))
          }
        val z = encryptStream(objs.length + 1, payload)
        val id = add("<< /Type /XObject /Subtype /Image " +
          s"/Width $w /Height $h /ColorSpace /DeviceRGB " +
          s"/BitsPerComponent 8 /Filter /$filterName /Length ${z.length} >>" +
          "\nstream\n" + new String(z, ISO_8859_1) + "\nendstream")
        (id, w, h)
      }
      val lines = text.split("\n", -1)
      val content = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) content.append("0 -14 Td\n")
        content.append(literal(l)).append(" Tj\n")
      }
      content.append("ET")
      imageId.foreach { case (_, w, h) =>
        content.append(s"\nq $w 0 0 $h 72 ${400 - h} cm /Im0 Do Q")
      }
      val raw = content.toString.getBytes(UTF_8)
      val z = encryptStream(objs.length + 1, encodeFilters(raw, filters))
      val cId = add(s"<< /Length ${z.length}$filterEntry >>" +
        "\nstream\n" + new String(z, ISO_8859_1) + "\nendstream")
      val xobjEntry = imageId
        .map { case (id, _, _) => s" /XObject << /Im0 $id 0 R >>" }
        .getOrElse("")
      add("<< /Type /Page /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontId 0 R >>$xobjEntry >> " +
        s"/Contents $cId 0 R >>")
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
    val encId = cryptState.map { case (c, o, u, r, p, oe) =>
      val filterPart =
        if (c.v5) "/V 5 /R 6 /Length 256 /CF << /StdCF << /CFM /AESV3 " +
          "/Length 32 >> >> /StmF /StdCF /StrF /StdCF"
        else if (c.aes) "/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV2 " +
          "/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        else "/V 2 /R 3 /Length 128"
      val ueEntry = oe.map { case (ueBytes, oeBytes) =>
        s" /UE <${hex(ueBytes)}> /OE <${hex(oeBytes)}>"
      }.getOrElse("")
      add(s"<< /Filter /Standard $filterPart /P $p " +
        s"/O <${hex(o)}> /U <${hex(u)}>$ueEntry >>")
    }

    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = out.length
      out.append(s"${i + 1} 0 obj\n").append(body).append("\nendobj\n")
    }
    val xref = out.length
    out.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    (1 to objs.length).foreach(i => out.append(f"${offsets(i)}%010d 00000 n \n"))
    val encEntry = encId.map(id =>
      s" /Encrypt $id 0 R /ID [<${hex(id0)}> <${hex(id0)}>]").getOrElse("")
    out.append(s"trailer\n<< /Size ${objs.length + 1} /Root $catId 0 R" +
        s"$encEntry >>\n")
      .append(s"startxref\n$xref\n%%EOF")
    out.toString.getBytes(ISO_8859_1)
  }

  /** Low-level PDF authoring: arbitrary objects, streams, and pages with
    * caller-supplied content streams and resource dictionaries. This is
    * the vector/text/image fixture surface for the page RASTERIZER
    * (`PdfRender`) — `writePdf`/`writePdfWithImages` only emit the fixed
    * one-font text layout. Object ids are 1-based and returned by the
    * `add*` methods so resource dicts can reference earlier objects.
    */
  final class PdfBuilder {
    // NUL-delimited so a caller-supplied dict body can never collide
    // with the deferred Pages object reference patched in build().
    private val PagesPlaceholder = "\u0000PAGES\u0000"
    private val objs =
      mutable.ArrayBuffer.empty[(String, Option[Array[Byte]])]
    private val pages = mutable.ArrayBuffer.empty[Int] // page object ids

    /** Add a dict-only (or array/number) object; returns its id. */
    def addObj(body: String): Int = { objs += ((body, None)); objs.length }

    /** Add a stream object: `dict` WITHOUT the surrounding << >> and
      * WITHOUT /Length (added here). `compress` Flate-encodes the payload
      * and appends /Filter /FlateDecode.
      */
    def addStream(dict: String, payload: Array[Byte],
        compress: Boolean = false): Int = {
      val data = if (compress) deflate(payload) else payload
      val filter = if (compress) " /Filter /FlateDecode" else ""
      objs += ((s"<< $dict /Length ${data.length}$filter >>", Some(data)))
      objs.length
    }

    /** Add a page: `content` is the raw content stream, `resources` the
      * body of the /Resources dict (without << >>), `mediaBox` in points.
      */
    def addPage(content: String, mediaBox: (Double, Double),
        resources: String = ""): Int =
      addPageBox(content, (0, 0, mediaBox._1, mediaBox._2), resources)

    /** Full-control page: explicit /MediaBox corners plus extra page-dict
      * entries (e.g. `/Rotate 90`).
      */
    def addPageBox(content: String,
        box: (Double, Double, Double, Double), resources: String = "",
        extraEntries: String = ""): Int = {
      val cId = addStream("", content.getBytes(ISO_8859_1))
      def fmt(d: Double) =
        if (d == d.floor && d.abs < 1e9) d.toLong.toString else d.toString
      val pid = addObj(
        s"<< /Type /Page /MediaBox [${fmt(box._1)} ${fmt(box._2)} " +
          s"${fmt(box._3)} ${fmt(box._4)}] " +
          s"/Resources << $resources >> /Contents $cId 0 R" +
          s"$extraEntries /Parent $PagesPlaceholder 0 R >>")
      pages += pid
      pid
    }

    def build(): Array[Byte] = {
      val pagesId = objs.length + 1
      val catId = pagesId + 1
      val bodies = objs.map { case (d, _) =>
        d.replace(s"$PagesPlaceholder 0 R", s"$pagesId 0 R")
      } :+
        s"<< /Type /Pages /Kids [${pages.map(i => s"$i 0 R").mkString(" ")}] /Count ${pages.length} >>" :+
        s"<< /Type /Catalog /Pages $pagesId 0 R >>"
      val streams = objs.map(_._2) :+ None :+ None
      val out = new java.io.ByteArrayOutputStream()
      def w(t: String): Unit = out.write(t.getBytes(ISO_8859_1))
      w("%PDF-1.4\n")
      val offsets = new Array[Int](bodies.length + 1)
      bodies.zipWithIndex.foreach { case (body, i) =>
        offsets(i + 1) = out.size()
        w(s"${i + 1} 0 obj\n")
        w(body)
        streams(i).foreach { z =>
          w("\nstream\n"); out.write(z); w("\nendstream")
        }
        w("\nendobj\n")
      }
      val xref = out.size()
      w(s"xref\n0 ${bodies.length + 1}\n0000000000 65535 f \n")
      (1 to bodies.length).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
      w(s"trailer\n<< /Size ${bodies.length + 1} /Root $catId 0 R >>\n")
      w(s"startxref\n$xref\n%%EOF")
      out.toByteArray
    }
  }

  // ---------------- parser ----------------

  private[functions] final case class Obj(dict: String, stream: Option[Array[Byte]])

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

  private[functions] def parseObjects(bytes: Array[Byte],
      password: String = ""): Map[Int, Obj] = {
    val s = new String(bytes, ISO_8859_1)
    require(s.startsWith("%PDF"), "not a PDF (missing %PDF header)")
    val out = mutable.Map.empty[Int, Obj]
    // pass 1: dict-only objects, so indirect /Length refs resolve in pass 2
    val starts = objStart.findAllMatchIn(s).toVector
    def parseAt(m: scala.util.matching.Regex.Match): (Int, Int, String, Int) = {
      val num = m.group(1).toInt
      val gen = m.group(2).toInt
      var i = m.end
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i + 1 < s.length && s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
        val e = dictEnd(s, i)
        (num, gen, s.substring(i, e), e)
      } else {
        // non-dict top-level object (array/number, e.g. an indirect
        // /Widths or /Length target): keep the raw body so consumers
        // (the renderer's value resolver, /Length refs) can parse it
        val e = s.indexOf("endobj", i)
        (num, gen, if (e < 0) "" else s.substring(i, e).trim, i)
      }
    }
    val parsed = starts.map(parseAt)
    val dictOf = parsed.map { case (n, _, d, _) => n -> d }.toMap
    val crypt: Option[Crypt] =
      if ("""/Encrypt\s+\d+\s+\d+\s+R""".r.findFirstIn(s).isDefined)
        Some(buildCrypt(s, dictOf, password))
      else None
    parsed.foreach { case (num, gen, dict, dEnd) =>
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
          val raw = java.util.Arrays.copyOfRange(bytes, d,
            math.min(d + len, bytes.length))
          // everything but cross-reference streams is encrypted (§7.5.8.2)
          Some(crypt match {
            case Some(c) if !dict.contains("/XRef") => c.decrypt(num, gen, raw)
            case _ => raw
          })
        }
      out(num) = Obj(dict, stream)
    }
    expandObjectStreams(out)
    out.toMap
  }

  /** PDF 1.5+ object streams: a `/Type /ObjStm` stream holds N compressed
    * dict-only objects behind a `objnum offset` pair header — where real
    * post-2005 PDFs keep their page tree. Expand each into the object map
    * so the rest of the parser never knows the difference. Top-level
    * definitions win a number conflict (incremental updates append
    * replacements at the file level).
    */
  private def expandObjectStreams(out: mutable.Map[Int, Obj]): Unit = {
    val stms = out.collect {
      case (n, o) if o.dict.contains("/ObjStm") && o.stream.isDefined => n
    }.toSeq
    stms.foreach { n =>
      val o = out(n)
      val s2 = new String(decodedStream(o), ISO_8859_1)
      val count = """/N\s+(\d+)""".r.findFirstMatchIn(o.dict)
        .map(_.group(1).toInt).getOrElse(0)
      val first = """/First\s+(\d+)""".r.findFirstMatchIn(o.dict)
        .map(_.group(1).toInt).getOrElse(0)
      val header = s2.substring(0, math.min(first, s2.length))
      val pairs = """\d+""".r.findAllIn(header).map(_.toInt)
        .grouped(2).take(count).collect { case Seq(a, b) => (a, b) }.toVector
      pairs.zipWithIndex.foreach { case ((objNum, off), idx) =>
        val start = first + off
        val end = if (idx + 1 < pairs.length) first + pairs(idx + 1)._2
          else s2.length
        if (start <= s2.length && !out.contains(objNum)) {
          val body = s2.substring(start, math.min(math.max(end, start),
            s2.length)).trim
          val dict =
            if (body.startsWith("<<")) body.substring(0, dictEnd(body, 0))
            else body // number/array object (e.g. an indirect /Length target)
          out(objNum) = Obj(dict, None)
        }
      }
    }
  }

  private[functions] def inflate(data: Array[Byte]): Array[Byte] = {
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

  private[functions] def deflate(raw: Array[Byte]): Array[Byte] = {
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

  /** Undo a /DecodeParms predictor after Flate/LZW: PNG row filters
    * (predictor ≥ 10: None/Sub/Up/Average/Paeth, one filter-type byte per
    * row) or TIFF horizontal differencing (predictor 2). 8-bit components
    * as everywhere in text-bearing streams.
    */
  private[functions] def applyPredictor(data: Array[Byte], predictor: Int,
      columns: Int, colors: Int, bpc: Int): Array[Byte] = {
    if (predictor <= 1) return data
    require(bpc == 8, s"predictor with $bpc-bit components unsupported")
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    if (predictor == 2) { // TIFF horizontal differencing
      val out = data.clone()
      var r = 0
      while (r + rowLen <= out.length) {
        var i = bpp
        while (i < rowLen) {
          out(r + i) = (out(r + i) + out(r + i - bpp)).toByte; i += 1
        }
        r += rowLen
      }
      out
    } else { // PNG: each stored row = filter byte + rowLen filtered bytes
      val rows = data.length / (rowLen + 1)
      val out = new Array[Byte](rows * rowLen)
      var r = 0
      while (r < rows) {
        val ft = data(r * (rowLen + 1)) & 0xff
        val src = r * (rowLen + 1) + 1
        val dst = r * rowLen
        var i = 0
        while (i < rowLen) {
          val raw = data(src + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
          val ul = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
          val v = ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left)
              val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              raw + (if (pa <= pb && pa <= pc) left
                else if (pb <= pc) up else ul)
            case other =>
              throw new IllegalArgumentException(s"bad PNG filter $other")
          }
          out(dst + i) = (v & 0xff).toByte
          i += 1
        }
        r += 1
      }
      out
    }
  }

  /** Decoded bytes of the /JBIG2Globals stream a JBIG2 image's
    * DecodeParms reference (shared symbol dictionaries), empty when
    * absent. The globals stream's own filters (e.g. Flate) apply.
    */
  private[functions] def jbig2Globals(dict: String,
      objs: Map[Int, Obj]): Array[Byte] =
    """/JBIG2Globals\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(dict)
      .flatMap(m => objs.get(m.group(1).toInt))
      .map(o => decodedStream(o))
      .getOrElse(Array.emptyByteArray)

  private[functions] def applyStreamFilters(raw: Array[Byte], filters: Seq[String],
      dict: String): Array[Byte] =
    applyStreamFilters(raw, filters, dict, Array.emptyByteArray)

  private[functions] def applyStreamFilters(raw: Array[Byte], filters: Seq[String],
      dict: String, globals: Array[Byte]): Array[Byte] = {
    def parm(name: String, dflt: Int): Int =
      (name + """\s+(\d+)""").r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(dflt)
    val earlyChange = parm("/EarlyChange", 1)
    filters.foldLeft(raw) { (data, f) =>
      f match {
        case "FlateDecode" | "Fl" => inflate(data)
        case "LZWDecode" | "LZW" => lzwDecode(data, earlyChange)
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
        case "ASCII85Decode" | "A85" => ascii85Decode(data)
        case "RunLengthDecode" | "RL" => runLengthDecode(data)
        case "CCITTFaxDecode" | "CCF" =>
          // scanned-fax images (ITU-T T.4/T.6); params live in
          // /DecodeParms (or the inline-image dict): signed /K selects
          // the coding discipline, /Rows falls back to the image /Height
          val k = """/K\s+(-?\d+)""".r.findFirstMatchIn(dict)
            .map(_.group(1).toInt).getOrElse(0)
          val columns = parm("/Columns", 1728)
          val rows = Seq("/Rows", "/Height", "/H")
            .map(parm(_, 0)).find(_ > 0).getOrElse(0)
          val blackIs1 = """/BlackIs1\s+true""".r
            .findFirstIn(dict).isDefined
          val byteAlign = """/EncodedByteAlign\s+true""".r
            .findFirstIn(dict).isDefined
          CcittFax.decode(data, k, columns, rows, blackIs1, byteAlign)
        case "JBIG2Decode" =>
          // bi-level scanned images (ITU-T T.88, embedded organization);
          // output follows the PDF presentation (0 = black, the
          // inverted JBIG2 convention). /JBIG2Globals streams carry
          // shared symbol dictionaries — the caller resolves them to
          // bytes (the dict string only holds an indirect ref).
          if (dict.contains("/JBIG2Globals") && globals.isEmpty)
            throw new UnsupportedOperationException(
              "JBIG2Decode /JBIG2Globals stream unresolved")
          Jbig2.pdfFilterDecode(data, globals)
        case other => throw new IllegalArgumentException(
          s"unsupported stream filter /$other")
      }
    }
  }

  private[functions] def decodedStream(o: Obj): Array[Byte] =
    decodedStream(o, Array.emptyByteArray)

  private[functions] def decodedStream(o: Obj,
      globals: Array[Byte]): Array[Byte] = {
    val raw = o.stream.getOrElse(Array.emptyByteArray)
    def parm(name: String, dflt: Int): Int =
      (name + """\s+(\d+)""").r.findFirstMatchIn(o.dict)
        .map(_.group(1).toInt).getOrElse(dflt)
    val decoded =
      applyStreamFilters(raw, streamFilters(o.dict), o.dict, globals)
    applyPredictor(decoded, parm("/Predictor", 1), parm("/Columns", 1),
      parm("/Colors", 1), parm("/BitsPerComponent", 8))
  }

  private val refPat = """(\d+)\s+\d+\s+R""".r

  /** page object numbers in document order, via the page tree */
  private[functions] def pageOrder(objs: Map[Int, Obj]): Seq[Int] = {
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

  // ------------- standard security handler (PDF 32000-1 §7.6.3) -------------

  /** RC4 / AES-128 / AES-256 primitives for the standard security
    * handler. The default (empty) password covers the ubiquitous
    * "owner-locked" case — viewable by anyone, permissions flagged —
    * and `extractPages(pdf, password)` authenticates user-password
    * documents across all revisions (R2-R4 Algorithm 2, R5 SHA-256,
    * R6 Algorithm 2.B). A wrong password raises a clean "encrypted"
    * error that `pdfPagesSafe` captures per cell.
    */
  private[functions] object PdfCrypt {
    val Pad: Array[Byte] = Array(0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A,
      0x41, 0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E,
      0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64,
      0x53, 0x69, 0x7A).map(_.toByte)

    def md5(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(d.update)
      d.digest()
    }

    def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val s = Array.tabulate(256)(_.toByte)
      var j = 0
      var i = 0
      while (i < 256) {
        j = (j + s(i) + key(i % key.length)) & 0xff
        val t = s(i); s(i) = s(j); s(j) = t
        i += 1
      }
      val out = new Array[Byte](data.length)
      var x = 0; var y = 0
      i = 0
      while (i < data.length) {
        x = (x + 1) & 0xff
        y = (y + s(x)) & 0xff
        val t = s(x); s(x) = s(y); s(y) = t
        out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
        i += 1
      }
      out
    }

    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)

    /** Algorithm 2: file encryption key from a (padded) password. */
    def fileKey(paddedPwd: Array[Byte], o: Array[Byte], p: Int,
        id0: Array[Byte], keyLen: Int, r: Int,
        encryptMetadata: Boolean): Array[Byte] = {
      val extra =
        if (r >= 4 && !encryptMetadata) le(0xFFFFFFFFL, 4)
        else Array.emptyByteArray
      var digest = md5(paddedPwd, o, le(p.toLong & 0xFFFFFFFFL, 4), id0, extra)
      if (r >= 3) {
        var i = 0
        while (i < 50) { digest = md5(digest.take(keyLen)); i += 1 }
      }
      digest.take(keyLen)
    }

    /** Algorithm 4/5: the /U value an empty user password must produce. */
    def userValue(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
      if (r == 2) rc4(key, Pad)
      else {
        var e = rc4(key, md5(Pad, id0))
        var i = 1
        while (i <= 19) {
          e = rc4(key.map(b => (b ^ i).toByte), e)
          i += 1
        }
        e
      }

    /** Algorithm 3: the /O entry (empty owner AND user password). */
    def ownerValue(keyLen: Int, r: Int): Array[Byte] = {
      var digest = md5(Pad)
      if (r >= 3) { var i = 0; while (i < 50) { digest = md5(digest); i += 1 } }
      val k = digest.take(keyLen)
      var o = rc4(k, Pad)
      if (r >= 3) {
        var i = 1
        while (i <= 19) { o = rc4(k.map(b => (b ^ i).toByte), o); i += 1 }
      }
      o
    }

    /** Algorithm 1: per-object key. */
    def objKey(key: Array[Byte], num: Int, gen: Int,
        aes: Boolean): Array[Byte] = {
      val salt = if (aes) Array(0x73, 0x41, 0x6C, 0x54).map(_.toByte)
        else Array.emptyByteArray
      md5(key, le(num.toLong, 3), le(gen.toLong, 2), salt)
        .take(math.min(key.length + 5, 16))
    }

    def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      require(data.length >= 16, "AES stream shorter than its IV")
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(data.take(16)))
      c.doFinal(data, 16, data.length - 16)
    }

    def aesEncrypt(key: Array[Byte], iv: Array[Byte],
        data: Array[Byte]): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(data)
    }

    /** AES-CBC without padding, zero IV not prepended — the V5 key-wrap
      * transform for /UE and /OE (32-byte payloads).
      */
    def aesNoPad(key: Array[Byte], data: Array[Byte],
        encrypt: Boolean): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
        else javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      c.doFinal(data)
    }

    def sha(n: Int, parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance(s"SHA-$n")
      parts.foreach(d.update)
      d.digest()
    }

    /** ISO 32000-2 Algorithm 2.B — the R6 password hash: SHA-256 seeded,
      * then ≥64 rounds of AES-128-CBC over a 64× repeat with the digest
      * function (256/384/512) chosen by the ciphertext modulo 3, until
      * the final byte permits stopping.
      */
    def hash2B(pwd: Array[Byte], salt: Array[Byte],
        udata: Array[Byte]): Array[Byte] = {
      var k = sha(256, pwd, salt, udata)
      var round = 0
      var e = Array.emptyByteArray
      while (round < 64 || (e.last & 0xff) > round - 32) {
        val unit = pwd ++ k ++ udata
        val k1 = new Array[Byte](unit.length * 64)
        var i = 0
        while (i < 64) {
          System.arraycopy(unit, 0, k1, i * unit.length, unit.length); i += 1
        }
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
          new javax.crypto.spec.IvParameterSpec(
            java.util.Arrays.copyOfRange(k, 16, 32)))
        e = c.doFinal(k1)
        val mod = (0 until 16).map(e(_) & 0xff).sum % 3
        k = sha(if (mod == 0) 256 else if (mod == 1) 384 else 512, e)
        round += 1
      }
      k.take(32)
    }
  }

  /** A live decryptor for one document: `aes` selects AESV2 vs RC4; `v5`
    * (AES-256) uses the file key directly — V5 has no per-object mixing.
    */
  private final case class Crypt(key: Array[Byte], aes: Boolean,
      v5: Boolean = false) {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (v5) PdfCrypt.aesDecrypt(key, data)
      else {
        val k = PdfCrypt.objKey(key, num, gen, aes)
        if (aes) PdfCrypt.aesDecrypt(k, data) else PdfCrypt.rc4(k, data)
      }
  }

  /** Parse a PDF string at `i` (must point at '(' or '<'): raw bytes +
    * end index. The dict-context twin of the content-stream reader.
    */
  private[functions] def parsePdfString(s: String, i0: Int): (Array[Byte], Int) = {
    val out = new ByteArrayOutputStream()
    var i = i0
    if (s.charAt(i) == '<') {
      i += 1
      val hex = new StringBuilder
      while (i < s.length && s.charAt(i) != '>') {
        if (!s.charAt(i).isWhitespace) hex.append(s.charAt(i))
        i += 1
      }
      i += 1
      if (hex.length % 2 == 1) hex.append('0')
      hex.toString.grouped(2).foreach(h => out.write(Integer.parseInt(h, 16)))
    } else {
      i += 1
      var depth = 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            s.charAt(i + 1) match {
              case 'n' => out.write('\n'); i += 2
              case 'r' => out.write('\r'); i += 2
              case 't' => out.write('\t'); i += 2
              case 'b' => out.write('\b'); i += 2
              case 'f' => out.write('\f'); i += 2
              case '\n' => i += 2
              case '\r' =>
                i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var n = 0; i += 1
                while (n < 3 && i < s.length &&
                    s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                  v = v * 8 + (s.charAt(i) - '0'); i += 1; n += 1
                }
                out.write(v & 0xff)
              case other => out.write(other); i += 2
            }
          case '(' => depth += 1; out.write('('); i += 1
          case ')' =>
            depth -= 1; if (depth > 0) out.write(')'); i += 1
          case ch => out.write(ch); i += 1
        }
      }
    }
    (out.toByteArray, i)
  }

  /** String value of dict key `name` (literal or hex form). */
  private def dictString(dict: String, name: String): Option[Array[Byte]] =
    (name + """(?![A-Za-z])\s*""").r.findAllMatchIn(dict).collectFirst {
      case m if m.end < dict.length &&
          (dict.charAt(m.end) == '(' || dict.charAt(m.end) == '<') =>
        parsePdfString(dict, m.end)._1
    }

  /** Build the document decryptor from the trailer's /Encrypt dict, or
    * raise "encrypted" if the handler is out of reach or the supplied
    * user password (default empty — the ubiquitous owner-locked case)
    * does not authenticate.
    */
  private def buildCrypt(s: String, dictOf: Map[Int, String],
      password: String = ""): Crypt = {
    val encRef = """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        "encrypted PDF: /Encrypt dict not an indirect reference"))
    val enc = dictOf.getOrElse(encRef, throw new IllegalArgumentException(
      "encrypted PDF: /Encrypt object missing"))
    require(enc.contains("/Standard"),
      "encrypted PDF: non-standard security handler")
    def intKey(k: String, dflt: Int): Int =
      (k + """(?![A-Za-z])\s+(-?\d+)""").r.findFirstMatchIn(enc)
        .map(_.group(1).toInt).getOrElse(dflt)
    val v = intKey("/V", 0)
    val r = intKey("/R", 2)
    if (v == 5) { // AES-256: R6 (Algorithm 2.B hash) or legacy R5
      val u = dictString(enc, "/U").getOrElse(
        throw new IllegalArgumentException("encrypted PDF: missing /U"))
      val ue = dictString(enc, "/UE").getOrElse(
        throw new IllegalArgumentException("encrypted PDF: missing /UE"))
      require(u.length >= 48 && ue.length >= 32,
        "encrypted PDF: malformed V5 /U//UE")
      val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
      val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
      val pwd = password.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .take(127)
      def pwdHash(salt: Array[Byte]): Array[Byte] =
        if (r == 6) PdfCrypt.hash2B(pwd, salt, Array.emptyByteArray)
        else PdfCrypt.sha(256, pwd, salt) // R5: plain SHA-256
      require(java.util.Arrays.equals(pwdHash(vSalt), u.take(32)),
        "encrypted PDF: password-protected (supplied user password does " +
          "not authenticate)")
      val fileKey = PdfCrypt.aesNoPad(pwdHash(kSalt), ue.take(32),
        encrypt = false)
      return Crypt(fileKey, aes = true, v5 = true)
    }
    require(v <= 4 && r <= 4,
      s"encrypted PDF: unsupported security handler (V=$v R=$r)")
    val keyLen = math.max(5, intKey("/Length", 40) / 8)
    val p = intKey("/P", -1)
    val o = dictString(enc, "/O").getOrElse(
      throw new IllegalArgumentException("encrypted PDF: missing /O"))
    val u = dictString(enc, "/U").getOrElse(
      throw new IllegalArgumentException("encrypted PDF: missing /U"))
    val encryptMetadata = !enc.contains("/EncryptMetadata false")
    // V4 crypt filters: /Identity means no stream encryption; AESV2 = AES
    val aes = enc.contains("/AESV2")
    val id0 = """/ID\s*\[\s*<""".r.findFirstMatchIn(s)
      .map(m => parsePdfString(s, m.end - 1)._1)
      .getOrElse(Array.emptyByteArray)
    val paddedPwd = (password.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1) ++ PdfCrypt.Pad).take(32)
    val key = PdfCrypt.fileKey(paddedPwd, o, p, id0, keyLen, r,
      encryptMetadata)
    val expectU = PdfCrypt.userValue(key, id0, r)
    val ok =
      if (r == 2) java.util.Arrays.equals(expectU, u)
      else u.length >= 16 &&
        java.util.Arrays.equals(expectU.take(16), u.take(16))
    require(ok, "encrypted PDF: password-protected (supplied user password " +
      "does not authenticate)")
    Crypt(key, aes)
  }

  private[functions] def pageContents(pdf: Array[Byte],
      password: String = ""): Seq[Array[Byte]] = {
    val objs = parseObjects(pdf, password)
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

  /** Per-page extracted text, document order; `password` authenticates
    * user-password-protected documents (RC4/AES-128 via Algorithm 2,
    * AES-256 R5/R6 via SHA-256 / Algorithm 2.B).
    */
  def extractPages(pdf: Array[Byte], password: String = ""): Seq[String] =
    pageContents(pdf, password).map(extractContentText)

  // ---------------- embedded images ----------------

  /** One embedded raster image: 1-based page, resource name, pixel
    * geometry, and the extracted payload. `format` is `png` (raw
    * Flate/LZW samples re-encoded losslessly), `jpeg` (DCTDecode
    * passthrough — the stream IS the JPEG file), or the passthrough
    * names `jpx`/`ccitt` for codecs whose decode is out of scope.
    */
  final case class PdfImage(page: Int, name: String, width: Int,
      height: Int, format: String, data: Array[Byte])

  /** Embedded images (XObject `/Subtype /Image`) of every page, document
    * order — the reference's `elements=['image']` document-splitter
    * surface restricted to EMBEDDED rasters (figure extraction, exact
    * bytes). Full page RASTERIZATION (text+vector rendering to pixels)
    * is `PdfRender.renderPages` — the round-12 implementation that
    * closed this adjudication.
    */
  def extractImages(pdf: Array[Byte],
      password: String = ""): Seq[PdfImage] = {
    val objs = parseObjects(pdf, password)
    def iparm(dict: String, name: String): Int =
      (name + """\s+(\d+)""").r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(0)
    val out = mutable.ArrayBuffer.empty[PdfImage]
    pageOrder(objs).zipWithIndex.foreach { case (p, pi) =>
      val pageDict = objs(p).dict
      val res = """/Resources\s+(\d+)\s+\d+\s+R""".r
        .findFirstMatchIn(pageDict)
        .flatMap(m => objs.get(m.group(1).toInt).map(_.dict))
        .getOrElse(pageDict)
      val xobjs = """/XObject\s*<<([^>]*)>>""".r.findFirstMatchIn(res)
        .map(_.group(1)).getOrElse("")
      """/(\w+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(xobjs).foreach { m =>
        objs.get(m.group(2).toInt)
          .filter(_.dict.contains("/Image")).foreach { o =>
            val w = iparm(o.dict, "/Width")
            val h = iparm(o.dict, "/Height")
            val filters = streamFilters(o.dict)
            val raw = o.stream.getOrElse(Array.emptyByteArray)
            val (format, data) = filters.lastOption match {
              case Some("DCTDecode") | Some("DCT") =>
                ("jpeg", applyStreamFilters(raw, filters.dropRight(1), o.dict))
              case Some("JPXDecode") =>
                // decode the JPEG 2000 codestream (T.800 baseline) and
                // re-encode as PNG like the other full-decode paths; an
                // out-of-scope codestream falls back to passthrough
                try {
                  val jpx = Jpeg2000.decode(
                    applyStreamFilters(raw, filters.dropRight(1), o.dict))
                  val img = new java.awt.image.BufferedImage(jpx.width,
                    jpx.height,
                    if (jpx.comps.length >= 3)
                      java.awt.image.BufferedImage.TYPE_INT_RGB
                    else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
                  // depth<8 components must be SCALED to full range
                  // (255/(2^depth-1)), not right-shifted by max(d-8,0)=0
                  // unscaled — that renders a 1-bit image as 0/1 gray,
                  // i.e. near-black (mirrors PdfRender.jpxToArgb)
                  val sh = math.max(jpx.depth - 8, 0)
                  val scale =
                    if (jpx.depth < 8) 255.0 / ((1 << jpx.depth) - 1) else 1.0
                  def to8(v: Int): Int =
                    if (jpx.depth == 8) v
                    else if (jpx.depth > 8) v >> sh
                    else math.round(v * scale).toInt
                  var y = 0
                  while (y < jpx.height) {
                    var x = 0
                    while (x < jpx.width) {
                      val i = y * jpx.width + x
                      if (jpx.comps.length >= 3)
                        img.setRGB(x, y,
                          (to8(jpx.comps(0)(i)) << 16) |
                            (to8(jpx.comps(1)(i)) << 8) |
                            to8(jpx.comps(2)(i)))
                      else img.getRaster.setSample(x, y, 0,
                        to8(jpx.comps(0)(i)))
                      x += 1
                    }
                    y += 1
                  }
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, "png", bos)
                  ("png", bos.toByteArray)
                } catch {
                  case _: IllegalArgumentException |
                      _: IndexOutOfBoundsException =>
                    ("jpx",
                      applyStreamFilters(raw, filters.dropRight(1), o.dict))
                }
              case _ => // fully decodable (incl. CCITT): re-encode as PNG
                val samples = decodedStream(o, jbig2Globals(o.dict, objs))
                val bpc = math.max(iparm(o.dict, "/BitsPerComponent"), 1)
                val gray = o.dict.contains("/DeviceGray")
                require(o.dict.contains("/DeviceRGB") || gray,
                  "unsupported image colorspace (DeviceRGB/DeviceGray only)")
                val img = new java.awt.image.BufferedImage(w, h,
                  if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
                  else java.awt.image.BufferedImage.TYPE_INT_RGB)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    if (gray && bpc == 1) {
                      val bit = y * ((w + 7) / 8) * 8 + x
                      val v = (samples(bit >> 3) >> (7 - (bit & 7))) & 1
                      img.getRaster.setSample(x, y, 0, v * 255)
                    } else if (gray) {
                      img.getRaster.setSample(x, y, 0,
                        samples(y * w + x) & 0xff)
                    } else {
                      val at = (y * w + x) * 3
                      img.setRGB(x, y,
                        ((samples(at) & 0xff) << 16) |
                          ((samples(at + 1) & 0xff) << 8) |
                          (samples(at + 2) & 0xff))
                    }
                    x += 1
                  }
                  y += 1
                }
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(img, "png", bos)
                ("png", bos.toByteArray)
            }
            out += PdfImage(pi + 1, m.group(1), w, h, format, data)
          }
      }
    }
    out.toSeq
  }

  /** Per-page text + bounding box of the page's shown text (None for a
    * textless page) — the reference's PDF `bounding_box` chunk metadata for
    * page mode (`document.py` BoundingBox x1/y1/x2/y2, PDF user space).
    */
  def extractPagesWithBoxes(pdf: Array[Byte]): Seq[(String, Option[PdfBox])] =
    pageContents(pdf).map(extractContentRuns)

  // ---------------- Spark surface ----------------

  /** Embedded images as (page, name, width, height, format, data)
    * structs — the `elements=['image']` figure-extraction column op.
    */
  val embeddedImages = org.apache.spark.sql.functions.udf {
    (pdf: Array[Byte]) =>
      if (pdf == null) null
      else extractImages(pdf).map(i =>
        (i.page, i.name, i.width, i.height, i.format, i.data))
  }

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

  /** `pdfPagesSafe` with a user password (beyond the reference, whose
    * pypdfium2 path has no password surface): same per-cell error capture,
    * wrong-password documents carry errortype='encrypted'.
    */
  val pdfPagesSafePwd = udf { (bytes: Array[Byte], password: String) =>
    if (bytes == null) PdfPagesCell(Seq.empty, null, null)
    else
      try PdfPagesCell(extractPages(bytes, Option(password).getOrElse("")),
        null, null)
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
