package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** HTML → text extraction for document pipelines — the reference parses
  * HTML documents via bs4 (`utils/documents.py:74-96`) for its document
  * splitter; corpus builds additionally need the boilerplate-removal step
  * (nav/footer/link-farm dropping) every CommonCrawl-derived dataset
  * applies. Pure JVM, single forward scan, no regex over the full
  * document (attribute values may contain `>`; comments/script/style must
  * be skipped as raw text, which regexes get wrong).
  *
  * Shape: map-only (one UDF call per document), so the operator scales
  * with the scan — no shuffle, no state.
  */
object Html {

  private val blockTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "tr", "br", "hr", "ul", "ol", "table", "section", "article",
    "header", "footer", "nav", "aside", "blockquote", "pre", "title",
    "main", "form", "figcaption")

  private val dropTags = Set("script", "style", "noscript", "template",
    "svg")

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "rsquo" -> "’",
    "lsquo" -> "‘", "ldquo" -> "“", "rdquo" -> "”",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "times" -> "×", "middot" -> "·", "bull" -> "•",
    "eacute" -> "é", "egrave" -> "è", "uuml" -> "ü",
    "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß")

  /** Decode `&name;`, `&#NN;`, `&#xHH;` (unterminated `&` passes through,
    * as browsers do).
    */
  private[functions] def decodeEntities(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val handled =
          if (semi > i && semi - i <= 10) {
            val body = s.substring(i + 1, semi)
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try { out.appendAll(Character.toChars(
                Integer.parseInt(body.substring(2), 16))); true }
              catch { case _: Exception => false }
            } else if (body.startsWith("#")) {
              try { out.appendAll(Character.toChars(
                Integer.parseInt(body.substring(1)))); true }
              catch { case _: Exception => false }
            } else namedEntities.get(body.toLowerCase) match {
              case Some(rep) => out.append(rep); true
              case None => false
            }
          } else false
        if (handled) i = semi + 1
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One text block with its link statistics (for boilerplate scoring). */
  private[functions] final case class Block(text: String, linkChars: Int) {
    def linkDensity: Double =
      if (text.isEmpty) 1.0 else linkChars.toDouble / text.length
  }

  /** Forward-scan an HTML document into text blocks. Handles comments,
    * CDATA, script/style/head raw-skipping, quoted attribute values
    * containing `>`, implicit tag case-insensitivity, and entities.
    */
  private[functions] def blocks(html: String): Seq[Block] = {
    val out = mutable.ArrayBuffer.empty[Block]
    val cur = new StringBuilder
    var curLink = 0
    var anchorDepth = 0
    var dropDepth = 0
    var dropTag = "" // tag whose matching close ends the raw-skip
    def flush(): Unit = {
      val t = decodeEntities(cur.toString)
        .replace(' ', ' ').replaceAll("[ \\t\\n\\r\\f]+", " ").trim
      if (t.nonEmpty) out += Block(t, math.min(curLink, t.length))
      cur.clear(); curLink = 0
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) { // comment: raw until -->
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          val body = html.substring(i + 9, if (e < 0) n else e)
          if (dropDepth == 0) cur.append(body)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
            (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/' ||
             html.charAt(i + 1) == '!')) {
          // scan the tag, honoring quoted attribute values
          var j = i + 1
          var quote = 0.toChar
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val ch = html.charAt(j)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            j += 1
          }
          val tagBody = html.substring(i + 1, math.min(j, n))
          val closing = tagBody.startsWith("/")
          val name = tagBody.dropWhile(_ == '/')
            .takeWhile(ch => ch.isLetterOrDigit).toLowerCase
          if (dropDepth > 0) {
            // inside script/style/head: only the matching close tag ends it
            if (closing && name == dropTag) dropDepth = 0
          } else if (!closing && dropTags.contains(name) &&
              !tagBody.endsWith("/")) {
            dropDepth = 1; dropTag = name
          } else {
            if (name == "a") {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else if (!tagBody.endsWith("/")) anchorDepth += 1
            }
            if (blockTags.contains(name)) flush()
          }
          i = if (j < n) j + 1 else n
        } else { // stray '<' that is not a tag
          if (dropDepth == 0) { cur.append(c); if (anchorDepth > 0) curLink += 1 }
          i += 1
        }
      } else {
        if (dropDepth == 0) {
          cur.append(c)
          if (anchorDepth > 0 && !c.isWhitespace) curLink += 1
        }
        i += 1
      }
    }
    flush()
    out.toSeq
  }

  /** Full text: every block, newline-joined (bs4 `get_text`-equivalent
    * with block-level segmentation).
    */
  def htmlToText(html: String): String =
    if (html == null) null else blocks(html).map(_.text).mkString("\n")

  // ---------------- image-text pairs ----------------

  /** One `<img>` occurrence: the `src` URL plus its `alt`/`title` text
    * (entity-decoded) — the image-text pair unit a multimodal corpus
    * build mines from crawl HTML (alt-text pairing).
    */
  final case class ImgRef(src: String, alt: String, title: String)

  // Unquoted-value branch must not swallow the '/' of an XHTML-style
  // self-closing tag (`<img src=foo.jpg/>` → "foo.jpg", not "foo.jpg/").
  private val attrRe =
    """([a-zA-Z-]+)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*[^\s>/]|[^\s>/]))""".r

  /** Every `<img>` with a non-empty `src`, document order; images inside
    * script/style/template/noscript are skipped. Map-only at corpus
    * scale — the extraction step ahead of URL fetch + CLIP filtering.
    */
  def imageRefs(html: String): Seq[ImgRef] = {
    if (html == null) return Seq.empty
    val out = mutable.ArrayBuffer.empty[ImgRef]
    var dropTag = ""
    var i = 0
    val n = html.length
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
            html.charAt(i + 1) == '/')) {
          var j = i + 1
          var quote = 0.toChar
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val ch = html.charAt(j)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            j += 1
          }
          val tagBody = html.substring(i + 1, math.min(j, n))
          val closing = tagBody.startsWith("/")
          val name = tagBody.dropWhile(_ == '/')
            .takeWhile(_.isLetterOrDigit).toLowerCase
          if (dropTag.nonEmpty) {
            if (closing && name == dropTag) dropTag = ""
          } else if (!closing && dropTags.contains(name) &&
              !tagBody.endsWith("/")) {
            dropTag = name
          } else if (!closing && name == "img") {
            val attrs = attrRe.findAllMatchIn(tagBody).map { m =>
              m.group(1).toLowerCase ->
                Option(m.group(2)).orElse(Option(m.group(3)))
                  .getOrElse(m.group(4))
            }.toMap
            val src = attrs.getOrElse("src", "").trim
            if (src.nonEmpty)
              out += ImgRef(src,
                decodeEntities(attrs.getOrElse("alt", "")).trim,
                decodeEntities(attrs.getOrElse("title", "")).trim)
          }
          i = if (j < n) j + 1 else n
        } else i += 1
      } else i += 1
    }
    out.toSeq
  }

  /** `<img>` pairs as (src, alt, title) structs. */
  val imagePairs = org.apache.spark.sql.functions.udf {
    (html: String) => imageRefs(html)
  }

  /** Main-content text: blocks whose link density exceeds `maxLinkDensity`
    * AND whose length is below `minChars` are dropped — the classic
    * boilerplate heuristic (nav bars, footers, related-links farms are
    * short and link-heavy; real paragraphs are neither).
    */
  def extractMainText(html: String, maxLinkDensity: Double = 0.5,
      minChars: Int = 80): String =
    if (html == null) null
    else blocks(html).filter(b =>
      b.linkDensity <= maxLinkDensity || b.text.length >= minChars)
      .map(_.text).mkString("\n")

  // ---------------- Spark surface ----------------

  private lazy val htmlTextUdf = udf((h: String) => htmlToText(h))
  private lazy val htmlMainTextUdf = udf((h: String) => extractMainText(h))

  /** html string column → extracted text (all blocks). */
  def htmlText(c: Column): Column = htmlTextUdf(c)

  /** html string column → main-content text (boilerplate dropped). */
  def htmlMainText(c: Column): Column = htmlMainTextUdf(c)
}
