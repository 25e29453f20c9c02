package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-producing iterator expressions for component views (reference
  * UDTF iterators: `string_splitter` `/root/reference/pixeltable/functions/
  * string.py:913`, `document_splitter` char_limit/overlap mode
  * `functions/document.py:163`): each returns an array Column that
  * `Views.expand`/`posexplode` turns into one-to-many child rows. Pure
  * generator expressions — the expansion distributes with the scan.
  */
object Iterators {

  /** whitespace token splitter (string_splitter) */
  def stringSplitter(text: Column): Column = split(trim(text), "\\s+")

  /** fixed-size character chunks with overlap (document_splitter's
    * char_limit + overlap mode): stride = size - overlap.
    */
  def charChunks(text: Column, size: Int, overlap: Int = 0): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"bad chunking: size=$size overlap=$overlap")
    val stride = size - overlap
    transform(sequence(lit(1), greatest(length(text), lit(1)), lit(stride)),
      start => text.substr(start, lit(size)))
  }

  /** sentence splitter (document_splitter separator='sentence'): split
    * after sentence-ending punctuation followed by whitespace.
    */
  def sentences(text: Column): Column =
    filter(split(trim(text), "(?<=[.!?])\\s+"), s => length(s) > 0)

  /** paragraph splitter (document_splitter separator='paragraph'): split on
    * blank lines.
    */
  def paragraphs(text: Column): Column =
    filter(split(trim(text), "\\n\\s*\\n"), s => length(s) > 0)

  /** token windows of `n` tokens with `overlap` (token_limit mode) */
  def tokenChunks(text: Column, n: Int, overlap: Int = 0): Column = {
    require(n > 0 && overlap >= 0 && overlap < n)
    val stride = n - overlap
    val toks = stringSplitter(text)
    transform(sequence(lit(1), greatest(size(toks), lit(1)), lit(stride)),
      start => concat_ws(" ", slice(toks, start, lit(n))))
  }

  /** One chunk of a heading-split document (document_splitter
    * separator='heading', reference `functions/document.py:24-45`): the text
    * under the currently-open heading hierarchy, with the reference's chunk
    * metadata — `title` (first h1), `heading` (open h1..h6 map) and
    * `sourceline` (1-based first line of the chunk).
    */
  final case class DocChunk(
      text: String, title: String, heading: Map[String, String], sourceline: Int)

  /** document_splitter separator='heading': split at markdown (`# ...`) and
    * single-line HTML (`<hN>...</hN>`) headings (reference HTML headings,
    * `document.py:138`; markdown needs no external parser). A heading opens
    * its level and closes all deeper levels; text between headings becomes
    * one chunk tagged with the open hierarchy. Preamble before the first
    * heading is a chunk with an empty heading map.
    */
  val headingChunks = udf { (text: String) =>
    if (text == null) Seq.empty[DocChunk]
    else {
      val md = "^(#{1,6})\\s+(.*)$".r
      val html = "(?i)^\\s*<h([1-6])[^>]*>(.*?)</h\\1>\\s*$".r
      val open = scala.collection.mutable.SortedMap.empty[Int, String]
      var title: String = null
      val out = scala.collection.mutable.ArrayBuffer.empty[DocChunk]
      val cur = new StringBuilder
      var curStart = 1
      var started = false
      def emit(): Unit = {
        val t = cur.toString.trim
        if (t.nonEmpty)
          out += DocChunk(t, title,
            open.map { case (l, h) => s"h$l" -> h }.toMap, curStart)
        cur.clear(); started = false
      }
      text.split("\n", -1).zipWithIndex.foreach { case (line, i) =>
        val h = line match {
          case md(hashes, t) => Some((hashes.length, t.trim))
          case html(lvl, t)  => Some((lvl.toInt, t.trim))
          case _             => None
        }
        h match {
          case Some((lvl, t)) =>
            emit() // chunk carries the hierarchy it was accumulated under
            open.keys.filter(_ > lvl).toSeq.foreach(open.remove)
            open(lvl) = t
            if (lvl == 1 && title == null) title = t
          case None =>
            if (!started) { curStart = i + 1; started = true }
            cur.append(line).append('\n')
        }
      }
      emit()
      out.toSeq
    }
  }

  /** document_splitter separator='page': form-feed (\f) page breaks — the
    * plain-text page convention (the reference's page mode needs a PDF
    * parser; the metadata shape — 1-based `page` per chunk — is the same).
    */
  val pageChunks = udf { (text: String) =>
    if (text == null) Seq.empty[(String, Int)]
    else text.split("\f", -1).zipWithIndex.collect {
      case (t, i) if t.trim.nonEmpty => (t.trim, i + 1)
    }.toSeq
  }
}
