package graft.io

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Excel (.xlsx) import/export (reference `io/pandas.py:57` `import_excel`
  * = `pd.read_excel`: first row is the header, shared/inline strings,
  * numeric cells, date-styled serials → timestamps).
  *
  * Pure-JVM: an xlsx is a zip of XML parts — parsed here with
  * `java.util.zip` + StAX, no external library. This import is inherently
  * driver-side: the zip container is non-splittable and the format caps at
  * ~1M rows per sheet, so (like the reference's pandas path) it is a
  * small-table ingestion door, not a scan path — the parsed rows land in a
  * distributed DataFrame for everything downstream.
  */
object Excel {

  private val xmlIn = XMLInputFactory.newInstance()
  xmlIn.setProperty(XMLInputFactory.SUPPORT_DTD, false)
  xmlIn.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)

  /** Excel day-serial epoch (1900 date system as used by every modern
    * writer: serial 1 = 1900-01-01, with the historical Lotus leap-year
    * bug folded in by anchoring at 1899-12-30).
    */
  private val EpochDays = java.time.LocalDate.of(1899, 12, 30).toEpochDay

  private case class Cell(col: Int, kind: String, style: Int, value: String)

  /** Import the first (or named) worksheet of an .xlsx as a DataFrame.
    * Row 1 is the header; column types are inferred per column over the
    * data cells (long / double / boolean / timestamp / string).
    */
  def importExcel(spark: SparkSession, path: String,
      sheet: Option[String] = None): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      val dateStyles = readDateStyles(zip)
      val sheetPath = resolveSheet(zip, sheet)
      val rows = readSheet(zip, sheetPath)
      require(rows.nonEmpty, s"empty worksheet in $path")

      val width = rows.map(r => if (r.isEmpty) 0 else r.map(_.col).max + 1).max
      val names = (0 until width).map { i =>
        rows.head.find(_.col == i).map(c => cellString(c, shared).value)
          .filter(_.nonEmpty).getOrElse(s"c${i + 1}")
      }
      val dataRows = rows.tail

      // per-column type inference over typed cell values
      val cols: Seq[Seq[Any]] = (0 until width).map { i =>
        dataRows.map(r => r.find(_.col == i).map(c =>
          typedValue(c, shared, dateStyles)).orNull)
      }
      val types = cols.map(inferType)
      val schema = StructType(names.zip(types).map { case (n, t) =>
        StructField(n, t, nullable = true) })
      val data = dataRows.map { r =>
        Row.fromSeq((0 until width).map { i =>
          coerce(r.find(_.col == i).map(c =>
            typedValue(c, shared, dateStyles)).orNull, types(i))
        })
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(data).asJava), schema)
    } finally zip.close()
  }

  /** Sheet names available in the workbook, in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try readWorkbookSheets(zip).map(_._1)
    finally zip.close()
  }

  // ---- container parsing ------------------------------------------------

  private def entryStream(zip: ZipFile, name: String): Option[InputStream] =
    Option(zip.getEntry(name)).map(zip.getInputStream)

  /** workbook.xml sheet name → rels target worksheet path. */
  private def readWorkbookSheets(zip: ZipFile): Seq[(String, String)] = {
    val rels: Map[String, String] =
      entryStream(zip, "xl/_rels/workbook.xml.rels").map { in =>
        val r = xmlIn.createXMLStreamReader(in)
        val m = Seq.newBuilder[(String, String)]
        try {
          while (r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT &&
                r.getLocalName == "Relationship")
              m += (attr(r, "Id").getOrElse("") ->
                attr(r, "Target").getOrElse(""))
          }
        } finally r.close()
        m.result().toMap
      }.getOrElse(Map.empty)
    entryStream(zip, "xl/workbook.xml").map { in =>
      val r = xmlIn.createXMLStreamReader(in)
      val out = Seq.newBuilder[(String, String)]
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "sheet") {
            val name = attr(r, "name").getOrElse("")
            val rid = attr(r, "id").getOrElse("") // r:id resolves by local name
            val target = rels.getOrElse(rid, "worksheets/sheet1.xml")
            val norm = if (target.startsWith("/")) target.drop(1)
                       else "xl/" + target
            out += (name -> norm)
          }
        }
      } finally r.close()
      out.result()
    }.getOrElse(Seq.empty)
  }

  private def resolveSheet(zip: ZipFile, sheet: Option[String]): String = {
    val sheets = readWorkbookSheets(zip)
    sheet match {
      case Some(n) => sheets.find(_._1 == n).map(_._2).getOrElse(
        throw new IllegalArgumentException(
          s"no sheet '$n'; have ${sheets.map(_._1).mkString(", ")}"))
      case None => sheets.headOption.map(_._2)
        .getOrElse("xl/worksheets/sheet1.xml")
    }
  }

  /** sharedStrings.xml: each <si> is one string — concatenate every <t>
    * beneath it (rich-text runs split one string across <r><t> parts).
    */
  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] =
    entryStream(zip, "xl/sharedStrings.xml").map { in =>
      val r = xmlIn.createXMLStreamReader(in)
      val out = IndexedSeq.newBuilder[String]
      val cur = new StringBuilder
      var inSi = false; var inT = false
      try {
        while (r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (r.getLocalName == "si") { inSi = true; cur.clear() }
            else if (r.getLocalName == "t" && inSi) inT = true
          case XMLStreamConstants.CHARACTERS if inT =>
            cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "t") inT = false
            else if (r.getLocalName == "si") { inSi = false; out += cur.toString }
          case _ => ()
        }
      } finally r.close()
      out.result()
    }.getOrElse(IndexedSeq.empty)

  /** styles.xml → the set of cellXfs indexes whose numFmt is a date
    * format (builtin ids 14–22 and 45–47, or a custom format code
    * containing date letters).
    */
  private def readDateStyles(zip: ZipFile): Set[Int] =
    entryStream(zip, "xl/styles.xml").map { in =>
      val r = xmlIn.createXMLStreamReader(in)
      val customDate = Set.newBuilder[Int]
      val xfFmts = Seq.newBuilder[Int]
      var inCellXfs = false
      try {
        while (r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "numFmt" =>
              val id = attr(r, "numFmtId").map(_.toInt).getOrElse(-1)
              val code = attr(r, "formatCode").getOrElse("")
              // strip quoted literals/colors, then look for date letters
              val bare = code.replaceAll("\"[^\"]*\"|\\[[^\\]]*\\]", "")
              if (bare.exists(c => "ymdhs".contains(c.toLower)) &&
                  !bare.exists(c => "0#?".contains(c))) customDate += id
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmts += attr(r, "numFmtId").map(_.toInt).getOrElse(0)
            case _ => ()
          }
          case XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "cellXfs") inCellXfs = false
          case _ => ()
        }
      } finally r.close()
      val custom = customDate.result()
      xfFmts.result().zipWithIndex.collect {
        case (fmt, i) if (fmt >= 14 && fmt <= 22) ||
          (fmt >= 45 && fmt <= 47) || custom(fmt) => i
      }.toSet
    }.getOrElse(Set.empty)

  /** worksheet xml → rows of cells. Handles v (value), t= s/str/b/
    * inlineStr/n, is/t inline strings, sparse cells via r="B2" refs.
    */
  private def readSheet(zip: ZipFile, path: String): Seq[Seq[Cell]] = {
    val in = entryStream(zip, path).getOrElse(
      throw new IllegalArgumentException(s"missing worksheet part $path"))
    val r = xmlIn.createXMLStreamReader(in)
    val rows = Seq.newBuilder[Seq[Cell]]
    var row = Seq.newBuilder[Cell]
    var nextCol = 0
    var col = 0; var kind = "n"; var style = -1
    val text = new StringBuilder
    var capture = false // inside <v> or inline <is><t>
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = Seq.newBuilder[Cell]; nextCol = 0
          case "c" =>
            col = attr(r, "r").map(colIndex).getOrElse(nextCol)
            kind = attr(r, "t").getOrElse("n")
            style = attr(r, "s").map(_.toInt).getOrElse(-1)
            text.clear()
          case "v" | "t" => capture = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if capture => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => capture = false
          case "c" =>
            if (text.nonEmpty) row += Cell(col, kind, style, text.toString)
            nextCol = col + 1
          case "row" => rows += row.result()
          case _ => ()
        }
        case _ => ()
      }
    } finally r.close()
    rows.result().filter(_.nonEmpty)
  }

  /** "BC23" → 0-based column index (54). */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def attr(r: javax.xml.stream.XMLStreamReader,
      name: String): Option[String] =
    (0 until r.getAttributeCount)
      .find(i => r.getAttributeLocalName(i) == name)
      .map(r.getAttributeValue)

  // ---- typing -----------------------------------------------------------

  private case class SV(value: String) // header string wrapper
  private def cellString(c: Cell, shared: IndexedSeq[String]): SV = c.kind match {
    case "s" => SV(shared(c.value.toInt))
    case _   => SV(c.value)
  }

  private def typedValue(c: Cell, shared: IndexedSeq[String],
      dateStyles: Set[Int]): Any = c.kind match {
    case "s" => shared(c.value.toInt)
    case "str" | "inlineStr" => c.value
    case "b" => c.value.trim == "1"
    case _ => // numeric; date-styled serials become timestamps
      if (dateStyles(c.style)) {
        val d = c.value.toDouble
        val days = math.floor(d).toLong
        val frac = d - days
        // serial doubles carry ~µs float error at modern dates; snap to
        // the millisecond (Excel's own display resolution)
        val millis = (EpochDays + days) * 86400000L +
          math.round(frac * 86400000L)
        new java.sql.Timestamp(millis)
      }
      // Integer vs double is decided by the cell's TEXT, not the parsed
      // value: a double column of whole values serializes as "17.0" while
      // a true integer serializes as "17", so round-trips preserve the
      // column type (csv-style inference; the old value-based heuristic
      // collapsed whole doubles to bigint and broke re-import hashing).
      // The 18-digit guard counts digits, not the sign: ±18 digits always
      // fits in a Long (range ±9.2e18).
      else if (IntegerText.matches(c.value) &&
        c.value.length - (if (c.value.startsWith("-")) 1 else 0) <= 18)
        c.value.toLong
      else c.value.toDouble
  }

  private val IntegerText = "-?\\d+".r

  private def inferType(vals: Seq[Any]): DataType = {
    val nn = vals.filter(_ != null)
    if (nn.isEmpty) StringType
    else if (nn.forall(_.isInstanceOf[java.sql.Timestamp])) TimestampType
    else if (nn.forall(_.isInstanceOf[Boolean])) BooleanType
    else if (nn.forall(_.isInstanceOf[Long])) LongType
    else if (nn.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double]))
      DoubleType
    else StringType
  }

  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    // defensive only: inferType yields LongType solely when every non-null
    // value is already a Long, so this case is unreachable today
    case (d: Double, LongType) => d.toLong
    case (l: Long, DoubleType) => l.toDouble
    case (x, StringType) => x match {
      case ts: java.sql.Timestamp => ts.toString
      case d: Double => if (d.isWhole && math.abs(d) < 9.0e15)
        d.toLong.toString else d.toString
      case other => other.toString
    }
    case (x, _) => x
  }

  // ---- writer (round-trip fixture + export surface) ---------------------

  /** Export a (small) DataFrame as a single-sheet .xlsx. Driver-side by
    * nature (one zip file); intended for result-set handoff, not data
    * movement — mirror of the import bound above.
    */
  def exportExcel(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = 1048575): Unit = {
    val schema = df.schema
    val it = df.toLocalIterator() // streams partitions; no full collect
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
      .append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    // header row: inline strings
    sb.append("<row>")
    schema.fields.foreach(f =>
      sb.append(s"""<c t="inlineStr"><is><t>${esc(f.name)}</t></is></c>"""))
    sb.append("</row>")
    var n = 0
    while (it.hasNext && n < maxRows) {
      val row = it.next(); n += 1
      sb.append("<row>")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) f.dataType match {
          case _: NumericType =>
            sb.append(s"""<c><v>${row.get(i)}</v></c>""")
          case BooleanType =>
            sb.append(s"""<c t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>""")
          case TimestampType =>
            val inst = row.getTimestamp(i).toInstant
            val days = Math.floorDiv(inst.getEpochSecond, 86400L)
            val frac = (inst.getEpochSecond - days * 86400L +
              inst.getNano / 1e9) / 86400.0
            sb.append(s"""<c s="1"><v>${days - EpochDays + frac}</v></c>""")
          case _ =>
            sb.append(s"""<c t="inlineStr"><is><t>${esc(String.valueOf(row.get(i)))}</t></is></c>""")
        } else sb.append("<c/>")
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")

    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${sheetName}" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/styles.xml" ->
        """<?xml version="1.0" encoding="UTF-8"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><fonts count="1"><font/></fonts><fills count="1"><fill/></fills><borders count="1"><border/></borders><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs></styleSheet>""",
      "xl/worksheets/sheet1.xml" -> sb.toString)

    val out = new ZipOutputStream(new java.io.FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes(UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}
