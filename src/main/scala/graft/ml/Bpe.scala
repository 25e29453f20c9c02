package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Byte-level BPE tokenizer (the GPT-2 / CLIP family; public algorithm —
  * Sennrich et al. 2016 merges over the GPT-2 byte-to-unicode alphabet).
  * The reference's clip() local model tokenizes with exactly this scheme
  * (`/root/reference/pixeltable/functions/huggingface.py:127-205` via HF
  * CLIPTokenizer: vocab.json + merges.txt, lowercased input, `</w>`
  * end-of-word marker).
  *
  * `clipMode = true` reproduces CLIP's SimpleTokenizer: lowercase,
  * whitespace-collapse, append `</w>` to each word's last symbol.
  * `clipMode = false` is plain GPT-2: no marker, spaces become `Ġ`-prefixed
  * symbols through the byte map.
  */
final class Bpe(
    val vocab: Map[String, Int],
    merges: Seq[(String, String)],
    val clipMode: Boolean = true,
    val unkToken: String = "<|endoftext|>",
) extends TextTokenizer {

  private val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  val unkId: Int = vocab.getOrElse(unkToken,
    throw new IllegalArgumentException(s"vocab missing $unkToken"))

  // word pre-split: CLIP collapses whitespace away (the `</w>` marker is
  // the boundary); GPT-2 keeps a leading space on each word (→ `Ġ` through
  // the byte map), so decode restores spacing exactly
  private val pat =
    if (clipMode) ("""'s|'t|'re|'ve|'m|'ll|'d|""" +
      """[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""").r
    else ("""'s|'t|'re|'ve|'m|'ll|'d|""" +
      """ ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+""").r

  /** Greedy lowest-rank pair merging of one word's symbol sequence. */
  private def bpe(symbols0: Vector[String]): Vector[String] = {
    var symbols = symbols0
    var done = symbols.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < symbols.length - 1) {
        ranks.get((symbols(i), symbols(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; best = i }
        }
        i += 1
      }
      if (best < 0) done = true
      else {
        symbols = (symbols.take(best) :+ (symbols(best) + symbols(best + 1))) ++
          symbols.drop(best + 2)
        if (symbols.length < 2) done = true
      }
    }
    symbols
  }

  /** One pre-split word → token ids (byte-map, mark, merge, look up). */
  def encodeWord(word: String): Seq[Int] = {
    val mapped = word.getBytes("UTF-8").map(b => Bpe.byteToUnicode(b & 0xff))
    val symbols =
      if (clipMode && mapped.nonEmpty)
        mapped.init.map(_.toString).toVector :+ (mapped.last.toString + "</w>")
      else mapped.map(_.toString).toVector
    bpe(symbols).map(s => vocab.getOrElse(s, unkId))
  }

  @transient private lazy val idToToken: Map[Int, String] = vocab.map(_.swap)
  @transient private lazy val unicodeToByte: Map[Char, Int] =
    Bpe.byteToUnicode.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** ids → text (inverse byte map; `skipIds` drops special tokens; in
    * clip mode each `</w>` marker becomes a trailing space, then trimmed).
    */
  def decode(ids: Seq[Int], skipIds: Set[Int] = Set.empty): String = {
    val sb = new java.io.ByteArrayOutputStream()
    ids.iterator.filterNot(skipIds).flatMap(idToToken.get).foreach { tok =>
      val (body, eow) =
        if (clipMode && tok.endsWith("</w>")) (tok.dropRight(4), true) else (tok, false)
      body.foreach(c => unicodeToByte.get(c).foreach(sb.write))
      if (eow) sb.write(' ')
    }
    new String(sb.toByteArray, "UTF-8").stripTrailing()
  }

  def encode(text: String): Seq[Int] = {
    val t =
      if (clipMode) text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim
      else text
    pat.findAllIn(t).toSeq.flatMap(encodeWord)
  }
}

object Bpe {
  /** GPT-2 bytes_to_unicode: the three printable latin-1 runs map to
    * themselves; the other 68 bytes map to U+0100.. in byte order (so
    * space → Ġ U+0120, newline → Ċ).
    */
  val byteToUnicode: Array[Char] = {
    val direct = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).toSet
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (direct.contains(b.toChar)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** Load the HF layout: vocab.json (token → id) + merges.txt (one
    * space-separated pair per line, `#`-comment first line allowed).
    */
  def fromFiles(vocabJson: String, mergesTxt: String, clipMode: Boolean = true,
      unkToken: String = "<|endoftext|>"): Bpe = {
    val node = new ObjectMapper().readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(vocabJson)))
    val vocab = node.properties().asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
    val merges = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(mergesTxt))
      .asScala.iterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ", 2)
        require(sp.length == 2, s"bad merges line: $l")
        (sp(0), sp(1))
      }.toSeq
    new Bpe(vocab, merges, clipMode, unkToken)
  }

  /** Write a vocab.json + merges.txt pair (fixtures/export). */
  def writeFiles(vocabJson: String, mergesTxt: String, vocab: Seq[String],
      merges: Seq[(String, String)]): Unit = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    vocab.zipWithIndex.foreach { case (tok, id) => node.put(tok, id) }
    java.nio.file.Files.write(java.nio.file.Paths.get(vocabJson),
      mapper.writeValueAsBytes(node))
    val lines = "#version: 0.2" +: merges.map { case (a, b) => s"$a $b" }
    java.nio.file.Files.write(java.nio.file.Paths.get(mergesTxt),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  /** Character-complete CLIP-style vocab (every ascii letter/digit/punct as
    * both inner and `</w>` symbol) so any input encodes without merges.
    */
  def tinyClipVocab: (Seq[String], Seq[(String, String)]) = {
    val chars = (('a' to 'z') ++ ('0' to '9') ++ ".,!?;:'\"-()[]{}/@#$%&*+=<>_~`|\\^".toSeq)
      .map(_.toString)
    val vocab = Seq("<|startoftext|>", "<|endoftext|>") ++
      chars ++ chars.map(_ + "</w>")
    // a couple of real merges so the merge loop is exercised end-to-end
    val merges = Seq(("t", "h"), ("th", "e</w>"), ("a", "n"))
    val mergedToks = Seq("th", "the</w>", "an")
    (vocab ++ mergedToks, merges)
  }
}
