package graft.ml

import scala.collection.mutable.ArrayBuffer

/** WordPiece tokenizer — the BERT-family vocabulary encoding used by the
  * reference's sentence_transformer / cross_encoder models
  * (`/root/reference/pixeltable/functions/huggingface.py:31-123`, which
  * delegate to HF tokenizers). Public algorithm (Devlin et al. 2018,
  * BERT repo tokenization.py): basic-tokenize (lowercase, split on
  * whitespace, isolate punctuation and CJK chars), then greedy
  * longest-prefix match against the vocab with `##` continuation pieces;
  * a word with no match becomes `[UNK]`.
  */
final class WordPiece(
    val vocab: Map[String, Int],
    val lowercase: Boolean = true,
    val unkToken: String = "[UNK]",
    val clsToken: String = "[CLS]",
    val sepToken: String = "[SEP]",
    val padToken: String = "[PAD]",
    val maxInputCharsPerWord: Int = 100,
) extends Serializable {

  private def id(tok: String): Int = vocab.getOrElse(tok,
    throw new IllegalArgumentException(s"vocab missing special token $tok"))
  val unkId: Int = id(unkToken)
  val clsId: Int = id(clsToken)
  val sepId: Int = id(sepToken)
  val padId: Int = id(padToken)

  private def isCjk(c: Int): Boolean =
    (c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3400 && c <= 0x4dbf) ||
      (c >= 0xf900 && c <= 0xfaff) || (c >= 0x20000 && c <= 0x2a6df)

  private def isPunct(c: Char): Boolean = {
    // BERT treats all non-letter/digit ASCII as punctuation, plus Unicode P*
    (c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
      (c >= 123 && c <= 126) || {
        val t = Character.getType(c)
        t == Character.DASH_PUNCTUATION || t == Character.START_PUNCTUATION ||
          t == Character.END_PUNCTUATION || t == Character.CONNECTOR_PUNCTUATION ||
          t == Character.OTHER_PUNCTUATION || t == Character.INITIAL_QUOTE_PUNCTUATION ||
          t == Character.FINAL_QUOTE_PUNCTUATION
      }
  }

  /** Whitespace split + punctuation/CJK isolation (+ optional lowercase). */
  def basicTokenize(text: String): Seq[String] = {
    val t = if (lowercase) text.toLowerCase(java.util.Locale.ROOT) else text
    val words = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { words += cur.toString; cur.clear() }
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (Character.isWhitespace(c) || c == ' ') flush()
      else if (isPunct(c) || isCjk(c.toInt)) { flush(); words += c.toString }
      else if (Character.isISOControl(c) || c == '�') () // strip
      else cur += c
      i += 1
    }
    flush()
    words.toSeq
  }

  /** Greedy longest-prefix wordpiece split of one basic token. */
  def wordpiece(word: String): Seq[String] = {
    if (word.length > maxInputCharsPerWord) return Seq(unkToken)
    val pieces = ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > start) {
        val cand = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(cand)) found = cand else end -= 1
      }
      if (found == null) return Seq(unkToken) // any unmatched span → whole word UNK
      pieces += found
      start = end
    }
    pieces.toSeq
  }

  def tokenize(text: String): Seq[String] = basicTokenize(text).flatMap(wordpiece)

  /** Like basicTokenize but with original [start, end) char offsets
    * (lowercasing preserves offsets; stripped controls do not produce
    * words, so every word maps to a real span).
    */
  def basicTokenizeWithOffsets(text: String): Seq[(String, Int, Int)] = {
    val t = if (lowercase) text.toLowerCase(java.util.Locale.ROOT) else text
    val words = ArrayBuffer.empty[(String, Int, Int)]
    val cur = new StringBuilder
    var curStart = -1
    def flush(end: Int): Unit =
      if (cur.nonEmpty) { words += ((cur.toString, curStart, end)); cur.clear(); curStart = -1 }
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (Character.isWhitespace(c)) flush(i)
      else if (isPunct(c) || isCjk(c.toInt)) { flush(i); words += ((c.toString, i, i + 1)) }
      else if (Character.isISOControl(c) || c == '�') flush(i)
      else { if (cur.isEmpty) curStart = i; cur += c }
      i += 1
    }
    flush(t.length)
    words.toSeq
  }

  /** Wordpiece tokens with [start, end) char offsets into the original
    * text (pieces of one word split its span by character counts; an UNK
    * covers the whole word).
    */
  def tokenizeWithOffsets(text: String): Seq[(String, Int, Int)] =
    basicTokenizeWithOffsets(text).flatMap { case (word, ws, we) =>
      val pieces = wordpiece(word)
      if (pieces == Seq(unkToken)) Seq((unkToken, ws, we))
      else {
        var pos = ws
        pieces.map { p =>
          val len = if (p.startsWith("##")) p.length - 2 else p.length
          val span = (p, pos, math.min(pos + len, we))
          pos += len
          span
        }
      }
    }

  /** `[CLS] text [SEP]` token ids, truncated to maxLen. */
  def encode(text: String, maxLen: Int): Array[Int] = {
    val body = tokenize(text).take(maxLen - 2).map(vocab)
    (clsId +: body :+ sepId).toArray
  }

  /** `[CLS] a [SEP] b [SEP]` with segment ids (0 for a+seps, 1 for b),
    * longest-first truncation like HF's `truncation='longest_first'`.
    */
  def encodePair(a: String, b: String, maxLen: Int): (Array[Int], Array[Int]) = {
    var ta = tokenize(a).map(vocab).toBuffer
    var tb = tokenize(b).map(vocab).toBuffer
    while (ta.length + tb.length > maxLen - 3) {
      if (ta.length >= tb.length) ta = ta.dropRight(1) else tb = tb.dropRight(1)
    }
    val ids = (clsId +: ta :+ sepId) ++ (tb :+ sepId)
    val types = Array.fill(ta.length + 2)(0) ++ Array.fill(tb.length + 1)(1)
    (ids.toArray, types)
  }
}

object WordPiece {
  /** vocab.txt: one token per line, id = line number (the HF layout). */
  def fromFile(path: String, lowercase: Boolean = true): WordPiece = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
    fromTokens(scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala.toSeq, lowercase)
  }

  def fromTokens(tokens: Seq[String], lowercase: Boolean = true): WordPiece =
    new WordPiece(tokens.zipWithIndex.toMap, lowercase)
}
