package graft.functions

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A hand-assembled PDF — NOT produced by Pdf.writePdf — with an
    * uncompressed content stream, a TJ array with kerning numbers, a hex
    * string, octal/paren escapes and a ' (move-and-show) operator, so the
    * parser is exercised against foreign structure, not just its twin.
    */
  private def handFixture: Array[Byte] = {
    val content =
      """BT /F1 12 Tf 72 720 Td
        |[(Hel) -20 (lo) 5 ( )] TJ (world) Tj
        |0 -14 Td
        |(par\(en\) \\ back\163lash) Tj
        |(next line) '
        |0 -14 Td
        |<48455821> Tj
        |ET""".stripMargin
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    val s = new StringBuilder("%PDF-1.4\n")
    s.append(obj(1, "<< /Type /Catalog /Pages 2 0 R >>"))
    s.append(obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    s.append(obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R >>"))
    s.append(obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream"))
    s.append("trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF")
    s.toString.getBytes(ISO_8859_1)
  }

  test("hand-built fixture: TJ arrays, hex strings, escapes, ' operator") {
    val pages = Pdf.extractPages(handFixture)
    assert(pages.length == 1)
    assert(pages.head ==
      "Hello world\npar(en) \\ backslash\nnext line\nHEX!")
  }

  test("writer → parser round-trip is text-exact: unicode, parens, newlines") {
    val texts = Seq(
      "plain ascii",
      "parens () and \\ backslash (nested (deep))",
      "line1\nline2\n\nline4 after blank",
      "unicode: åçé 中文 🎉 end",
      "", // empty page
      "trailing newline\n")
    val pdf = Pdf.writePdf(texts)
    assert(Pdf.extractPages(pdf) == texts)
  }

  test("nested page tree preserves document order across inner nodes") {
    // 20 pages → writer groups kids in 8s → 3 inner /Pages nodes
    val texts = (0 until 20).map(i => s"page $i body")
    assert(Pdf.extractPages(Pdf.writePdf(texts)) == texts)
  }

  test("encrypted-ref-missing, image-filtered, and junk PDFs raise cleanly") {
    val enc = new String(handFixture, ISO_8859_1)
      .replace("/Size 5", "/Size 5 /Encrypt 9 0 R").getBytes(ISO_8859_1)
    assertThrows[IllegalArgumentException](Pdf.extractPages(enc))
    val dct = new String(handFixture, ISO_8859_1)
      .replace(">>\nstream", " /Filter /DCTDecode >>\nstream").getBytes(ISO_8859_1)
    assertThrows[IllegalArgumentException](Pdf.extractPages(dct))
    assertThrows[IllegalArgumentException](
      Pdf.extractPages("not a pdf".getBytes(ISO_8859_1)))
  }

  test("predictor-coded streams decode: PNG Up/Sub/Paeth rows, TIFF diff") {
    val rnd = new java.util.Random(3)
    val plain = new Array[Byte](640) // 40 rows × 16 columns
    rnd.nextBytes(plain)
    def pngEncode(data: Array[Byte], cols: Int, ft: Int): Array[Byte] = {
      val rows = data.length / cols
      val out = new java.io.ByteArrayOutputStream()
      for (r <- 0 until rows) {
        out.write(ft)
        for (i <- 0 until cols) {
          val cur = data(r * cols + i) & 0xff
          val left = if (i > 0) data(r * cols + i - 1) & 0xff else 0
          val up = if (r > 0) data((r - 1) * cols + i) & 0xff else 0
          val ul = if (r > 0 && i > 0) data((r - 1) * cols + i - 1) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          out.write((cur - pred) & 0xff)
        }
      }
      out.toByteArray
    }
    for (ft <- Seq(0, 1, 2, 3, 4))
      assert(Pdf.applyPredictor(pngEncode(plain, 16, ft), 12, 16, 1, 8).toSeq ==
        plain.toSeq, s"PNG filter $ft diverged")
    // TIFF predictor 2: horizontal differencing
    val tiff = plain.clone()
    for (r <- 0 until 40; i <- 15 to 1 by -1)
      tiff(r * 16 + i) = (tiff(r * 16 + i) - tiff(r * 16 + i - 1)).toByte
    assert(Pdf.applyPredictor(tiff, 2, 16, 1, 8).toSeq == plain.toSeq)
    // end-to-end: a content stream stored as PNG-Up-filtered Flate
    val content = "BT /F1 12 Tf 72 720 Td (predictor ok) Tj ET"
    val cols = 16
    val padded = content.getBytes(ISO_8859_1) ++
      Array.fill((cols - content.length % cols) % cols)(' '.toByte)
    val z = Pdf.encodeFilters(pngEncode(padded, cols, 2), Seq("FlateDecode"))
    val sb = new StringBuilder("%PDF-1.4\n")
    sb.append(s"1 0 obj\n<< /Length ${z.length} /Filter /FlateDecode")
      .append(s" /DecodeParms << /Predictor 12 /Columns $cols >> >>\nstream\n")
      .append(new String(z, ISO_8859_1)).append("\nendstream\nendobj\n")
    sb.append("2 0 obj\n<< /Type /Page /MediaBox [0 0 612 792] /Contents 1 0 R >>\nendobj\n")
    sb.append("3 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n")
    sb.append("4 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n")
    sb.append("trailer\n<< /Root 4 0 R >>\n%%EOF")
    assert(Pdf.extractPages(sb.toString.getBytes(ISO_8859_1)) ==
      Seq("predictor ok"))
  }

  test("LZW codec: PDF-spec example stream, width boundaries, EarlyChange 0") {
    // PDF 32000-1:2008 §7.4.4.2's worked example: this input must produce
    // exactly the code sequence 256 45 258 258 65 259 66 257 = bytes
    // 80 0B 60 50 22 0C 0C 85 01
    val ex = Array[Byte](45, 45, 45, 45, 45, 65, 45, 45, 45, 66)
    val enc = Pdf.lzwEncode(ex)
    assert(enc.map(b => f"${b & 0xff}%02X").mkString(" ") ==
      "80 0B 60 50 22 0C 0C 85 01")
    assert(Pdf.lzwDecode(enc).toSeq == ex.toSeq)
    // deterministic pseudo-random payload long enough to cross the 9→10→11
    // bit width boundaries (and exercise KwKwK self-reference runs)
    val rnd = new java.util.Random(42)
    val big = new Array[Byte](20000)
    rnd.nextBytes(big)
    java.util.Arrays.fill(big, 5000, 9000, 'a'.toByte) // long runs → KwKwK
    assert(Pdf.lzwDecode(Pdf.lzwEncode(big)).toSeq == big.toSeq)
    // EarlyChange 0 shifts every width bump by one code — both sides must
    // agree or the stream shreds at code 511
    assert(Pdf.lzwDecode(Pdf.lzwEncode(big, 0), 0).toSeq == big.toSeq)
    // table-full path: enough distinct material to force the internal Clear
    val huge = new Array[Byte](300000)
    new java.util.Random(7).nextBytes(huge)
    assert(Pdf.lzwDecode(Pdf.lzwEncode(huge)).toSeq == huge.toSeq)
  }

  test("ASCIIHex / ASCII85 / RunLength codecs round-trip with spec edges") {
    val rnd = new java.util.Random(1)
    val data = new Array[Byte](4097) // odd length: partial final a85 group
    rnd.nextBytes(data)
    java.util.Arrays.fill(data, 100, 400, 0.toByte) // a85 'z' groups, RL runs
    assert(Pdf.asciiHexDecode(Pdf.asciiHexEncode(data)).toSeq == data.toSeq)
    assert(Pdf.ascii85Decode(Pdf.ascii85Encode(data)).toSeq == data.toSeq)
    assert(Pdf.runLengthDecode(Pdf.runLengthEncode(data)).toSeq == data.toSeq)
    // odd final hex digit implies low nibble 0; whitespace is ignored
    assert(Pdf.asciiHexDecode("4 86\n55>".getBytes(ISO_8859_1)).toSeq ==
      Seq[Byte](0x48, 0x65, 0x50))
    // 'z' = four zero bytes, '~>' terminates
    assert(Pdf.ascii85Decode("z~>".getBytes(ISO_8859_1)).toSeq ==
      Seq[Byte](0, 0, 0, 0))
  }

  test("encrypted PDFs with an empty user password decrypt: RC4-128 and AES-128") {
    // the ubiquitous owner-locked shape — readable by any viewer, so the
    // splitter must read it too (standard security handler, §7.6.3)
    val texts = Seq("rc4 secret page", "page two\nsecond line",
      "unicode: привет")
    assert(Pdf.extractPages(Pdf.writePdfEncrypted(texts, "rc4")) == texts)
    assert(Pdf.extractPages(Pdf.writePdfEncrypted(texts, "aes")) == texts)
    // V5/R6 AES-256 (AESV3, Algorithm 2.B hash) — the modern default
    assert(Pdf.extractPages(Pdf.writePdfEncrypted(texts, "aes256")) == texts)
  }

  test("password-protected PDF fails auth and carries errortype=encrypted") {
    for (method <- Seq("rc4", "aes256")) {
      val locked = Pdf.writePdfEncrypted(Seq("cannot read"), method,
        userPwd = "hunter2")
      val e = intercept[IllegalArgumentException](Pdf.extractPages(locked))
      assert(e.getMessage.contains("password-protected"), s"method $method")
      val rows = Seq((1L, locked))
        .toDF("doc_id", "pdf")
        .select(Pdf.pdfPagesSafe(col("pdf")).as("cell"))
        .select(col("cell.errortype"))
        .collect()
      assert(rows(0).getString(0) == "encrypted", s"method $method")
    }
  }

  test("password-protected PDFs decrypt with the right password, all handlers") {
    val texts = Seq("secret page one", "secret page two")
    for (method <- Seq("rc4", "aes", "aes256")) {
      val locked = Pdf.writePdfEncrypted(texts, method, userPwd = "hunter2")
      assert(Pdf.extractPages(locked, "hunter2") == texts, s"method $method")
      // wrong password still raises the clean auth error
      val e = intercept[IllegalArgumentException](
        Pdf.extractPages(locked, "wrong"))
      assert(e.getMessage.contains("password-protected"), s"method $method")
      // Spark surface: per-cell capture with the password column
      val rows = Seq((1L, locked, "hunter2"), (2L, locked, "nope"))
        .toDF("doc_id", "pdf", "pwd")
        .select(col("doc_id"),
          Pdf.pdfPagesSafePwd(col("pdf"), col("pwd")).as("cell"))
        .orderBy("doc_id")
        .select(col("cell.pages"), col("cell.errortype"))
        .collect()
      assert(rows(0).getSeq[String](0) == texts, s"method $method")
      assert(rows(1).getString(1) == "encrypted", s"method $method")
    }
  }

  test("object streams (/ObjStm): page tree inside a compressed stream") {
    // PDF 1.5+ layout: catalog/pages/page dicts live inside one
    // Flate-compressed /ObjStm ("objnum offset" pair header, bodies at
    // /First + offset); only the content stream is a top-level object.
    val content = "BT /F1 12 Tf 72 720 Td (objstm works) Tj ET"
    val zc = Pdf.encodeFilters(content.getBytes(ISO_8859_1), Seq("FlateDecode"))
    val bodies = Seq(
      3 -> "<< /Type /Catalog /Pages 4 0 R >>",
      4 -> "<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
      5 -> "<< /Type /Page /MediaBox [0 0 612 792] /Contents 1 0 R >>")
    val offsets = bodies.map(_._2).scanLeft(0)((a, b) => a + b.length + 1).init
    val header = bodies.zip(offsets)
      .map { case ((n, _), o) => s"$n $o" }.mkString(" ")
    val first = header.length + 1
    val payload = header + "\n" + bodies.map(_._2).mkString("\n")
    val zp = Pdf.encodeFilters(payload.getBytes(ISO_8859_1), Seq("FlateDecode"))
    val sb = new StringBuilder("%PDF-1.5\n")
    sb.append(s"1 0 obj\n<< /Length ${zc.length} /Filter /FlateDecode >>\nstream\n")
      .append(new String(zc, ISO_8859_1)).append("\nendstream\nendobj\n")
    sb.append(s"2 0 obj\n<< /Type /ObjStm /N 3 /First $first /Length ${zp.length}")
      .append(" /Filter /FlateDecode >>\nstream\n")
      .append(new String(zp, ISO_8859_1)).append("\nendstream\nendobj\n")
    sb.append("trailer\n<< /Root 3 0 R >>\n%%EOF")
    assert(Pdf.extractPages(sb.toString.getBytes(ISO_8859_1)) ==
      Seq("objstm works"))
  }

  test("interaction: encryption × ObjStm × LZW chain in one document") {
    // decryption must run BEFORE object-stream expansion and filter
    // decoding: an encrypted PDF whose page tree lives in an /ObjStm and
    // whose content stream is LZW-compressed exercises all three layers
    // in their required order
    val content = "BT /F1 12 Tf 72 720 Td (layered) Tj ET"
    val zc = Pdf.encodeFilters(content.getBytes(ISO_8859_1), Seq("LZWDecode"))
    val bodies = Seq(
      3 -> "<< /Type /Catalog /Pages 4 0 R >>",
      4 -> "<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
      5 -> "<< /Type /Page /MediaBox [0 0 612 792] /Contents 1 0 R >>")
    val offsets = bodies.map(_._2).scanLeft(0)((a, b) => a + b.length + 1).init
    val header = bodies.zip(offsets)
      .map { case ((n, _), o) => s"$n $o" }.mkString(" ")
    val first = header.length + 1
    val payload = header + "\n" + bodies.map(_._2).mkString("\n")
    val zp = Pdf.encodeFilters(payload.getBytes(ISO_8859_1), Seq("FlateDecode"))
    // encrypt both streams with the same deterministic parameters the
    // writer uses (R3 RC4-128, empty passwords, fixed /ID)
    val id0 = Array.tabulate(16)(i => (i * 17 + 3).toByte)
    val o = Pdf.PdfCrypt.ownerValue(16, 3)
    val key = Pdf.PdfCrypt.fileKey(Pdf.PdfCrypt.Pad, o, -1, id0, 16, 3, true)
    val u = Pdf.PdfCrypt.userValue(key, id0, 3) ++ new Array[Byte](16)
    def enc(num: Int, data: Array[Byte]) =
      Pdf.PdfCrypt.rc4(Pdf.PdfCrypt.objKey(key, num, 0, aes = false), data)
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val e1 = enc(1, zc)
    val e2 = enc(2, zp)
    val sb = new StringBuilder("%PDF-1.5\n")
    sb.append(s"1 0 obj\n<< /Length ${e1.length} /Filter /LZWDecode >>\nstream\n")
      .append(new String(e1, ISO_8859_1)).append("\nendstream\nendobj\n")
    sb.append(s"2 0 obj\n<< /Type /ObjStm /N 3 /First $first /Length ${e2.length}")
      .append(" /Filter /FlateDecode >>\nstream\n")
      .append(new String(e2, ISO_8859_1)).append("\nendstream\nendobj\n")
    sb.append("6 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /P -1 ")
      .append(s"/O <${hx(o)}> /U <${hx(u.take(32))}> >>\nendobj\n")
    sb.append(s"trailer\n<< /Root 3 0 R /Encrypt 6 0 R /ID [<${hx(id0)}> <${hx(id0)}>] >>\n%%EOF")
    assert(Pdf.extractPages(sb.toString.getBytes(ISO_8859_1)) == Seq("layered"))
  }

  test("filtered PDFs extract identically: LZW, RunLength, hex, 85+LZW chain") {
    val texts = Seq("lzw page one\nwith a second line",
      "page two — unicode: привет, 日本語", "short")
    for (chain <- Seq(Seq("LZWDecode"), Seq("RunLengthDecode"),
        Seq("ASCIIHexDecode"), Seq("ASCII85Decode", "LZWDecode"),
        Seq("ASCII85Decode", "FlateDecode"))) {
      val pdf = Pdf.writePdfFiltered(texts, chain)
      assert(Pdf.extractPages(pdf) == texts, s"chain $chain diverged")
    }
  }

  test("mixed batch: plain PDF chunks, encrypted PDF carries a cell error") {
    // reference on_error='ignore' (exec/exec_context.py:15): a bad file
    // must not fail the task — pdfPagesSafe captures per cell
    val enc = new String(handFixture, ISO_8859_1)
      .replace("/Size 5", "/Size 5 /Encrypt 9 0 R").getBytes(ISO_8859_1)
    val plain = Pdf.writePdf(Seq("hello", "world"))
    val rows = Seq((1L, plain), (2L, enc), (3L, "junk".getBytes(ISO_8859_1)))
      .toDF("doc_id", "pdf")
      .select(col("doc_id"), Pdf.pdfPagesSafe(col("pdf")).as("cell"))
      .select(col("doc_id"), col("cell.pages"), col("cell.errortype"))
      .orderBy("doc_id")
      .collect()
    assert(rows(0).getAs[scala.collection.Seq[String]]("pages").toSeq ==
      Seq("hello", "world"))
    assert(rows(0).getAs[String]("errortype") == null)
    assert(rows(1).isNullAt(1) && rows(1).getAs[String]("errortype") == "encrypted")
    assert(rows(2).isNullAt(1) && rows(2).getAs[String]("errortype") != null)
  }

  test("textToPdf + pdfPages on a DataFrame: exact substr pagination") {
    val df = Seq(
      (1L, "a" * 450), // 3 pages: 200, 200, 50
      (2L, ""),        // 1 empty page
      (3L, "short\nwith\nlines"),
    ).toDF("doc_id", "text")
    val out = df
      .select(col("doc_id"), Pdf.textToPdf(col("text"), 200).as("pdf"))
      .select(col("doc_id"), posexplode(Pdf.pdfPages(col("pdf"))).as(Seq("i", "t")))
      .orderBy("doc_id", "i")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 0, "a" * 200), (1L, 1, "a" * 200), (1L, 2, "a" * 50),
      (2L, 0, ""),
      (3L, 0, "short\nwith\nlines")))
  }

  test("bounding boxes: Helvetica metrics exact on writer output") {
    // writer layout: /F1 12 Tf, first line Td 72 720, 0 -14 Td per line
    val pages = Pdf.extractPagesWithBoxes(Pdf.writePdf(Seq("AB\nx", "")))
    assert(pages.map(_._1) == Seq("AB\nx", ""))
    val b = pages(0)._2.get
    val wAB = (667 + 667) * 12.0 / 1000 // Helvetica 'A'=667 'B'=667
    assert(math.abs(b.x1 - 72.0) < 1e-9)
    assert(math.abs(b.x2 - (72.0 + wAB)) < 1e-9) // "AB" is the widest line
    assert(math.abs(b.y2 - (720.0 + 0.718 * 12)) < 1e-9) // ascender, top line
    assert(math.abs(b.y1 - (706.0 - 0.207 * 12)) < 1e-9) // descender, line 2
    assert(pages(1)._2.isEmpty) // textless page: no box
  }

  test("bounding boxes on the foreign fixture track ', Td and TL-less flow") {
    val Some(b) = Pdf.extractPagesWithBoxes(handFixture).head._2
    // lines land at y = 720, 706, 706 (' with zero leading), 692
    assert(math.abs(b.y2 - (720.0 + 0.718 * 12)) < 1e-9)
    assert(math.abs(b.y1 - (692.0 - 0.207 * 12)) < 1e-9)
    assert(math.abs(b.x1 - 72.0) < 1e-9)
    assert(b.x2 > 72.0 + 50) // some line is at least ~9 chars wide
  }

  test("pdfPageBoxes on a DataFrame: box columns, null coords when textless") {
    val rows = Seq((1L, "hi\nthere"), (2L, ""))
      .toDF("id", "t")
      .select(col("id"), Pdf.textToPdf(col("t"), 200).as("pdf"))
      .select(col("id"), posexplode(Pdf.pdfPageBoxes(col("pdf"))).as(Seq("i", "c")))
      .select(col("id"), col("c.text"), col("c.x1"), col("c.y2"))
      .orderBy("id")
      .collect()
    assert(rows(0).getString(1) == "hi\nthere")
    assert(math.abs(rows(0).getDouble(2) - 72.0) < 1e-9)
    assert(math.abs(rows(0).getDouble(3) - (720.0 + 0.718 * 12)) < 1e-9)
    assert(rows(1).getString(1) == "" && rows(1).isNullAt(2) && rows(1).isNullAt(3))
  }

  test("q96 registry query runs and matches page arithmetic on testdata") {
    val df = graft.SparkEntry.queries("q96_pdf_chunker")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // page_len == 200 for every non-final page; reconstructed text == source
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, pages) =>
      val ordered = pages.sortBy(_.getLong(1))
      assert(ordered.init.forall(_.getLong(3) == 200L), s"doc $id short mid-page")
      assert(ordered.map(_.getString(2)).mkString == src(id), s"doc $id text diverged")
    }
  }
}
