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
}
