package graft.ml

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal tokenizer contract shared by the GPT-2-byte BPE ([[Bpe]]) and the
  * SentencePiece family ([[SentencePiece]]), so model bundles can carry
  * whichever the checkpoint ships.
  */
trait TextTokenizer extends Serializable {
  def encode(text: String): Seq[Int]
  def decode(ids: Seq[Int], skipIds: Set[Int] = Set.empty): String
}

/** SentencePiece tokenizer (Kudo & Richardson 2018; public algorithm) in the
  * HF `tokenizer.json` layout — the scheme the reference's seq2seq surfaces
  * load through AutoTokenizer (`/root/reference/pixeltable/functions/
  * huggingface.py:1566-1638`: MarianMT/T5 translation, summarization).
  *
  * Two model types:
  *  - `unigram`: each piece carries a log-probability score; tokenization is
  *    the Viterbi max-score segmentation of each metaspace chunk. Unknown
  *    code points pay `min(score) − 10` (the kUnkPenalty convention) and
  *    resolve through byte-fallback `<0xXX>` pieces when the vocab has them,
  *    else the unk id.
  *  - `bpe`: greedy lowest-rank pair merging over the chunk's code points
  *    (SentencePiece-style BPE works on raw unicode with the `▁` metaspace,
  *    unlike GPT-2's byte-alphabet BPE).
  *
  * Normalization is the Metaspace pre-tokenizer: spaces become `▁`, a prefix
  * `▁` is prepended per `prependScheme` ("always" | "first" | "never"), and
  * the text splits into chunks at `▁` boundaries (each chunk keeps its
  * leading `▁`), with segmentation running per chunk. Decoding inverts: bytes
  * from `<0xXX>` pieces are flushed as UTF-8, `▁` becomes a space, and one
  * leading space is stripped when a prefix was prepended.
  */
final class SentencePiece(
    val modelType: String, // "unigram" | "bpe"
    piecesInIdOrder: Seq[(String, Double)],
    merges: Seq[(String, String)] = Seq.empty,
    val unkId: Int = 0,
    val byteFallback: Boolean = true,
    val prependScheme: String = "always",
    val specialIds: Set[Int] = Set.empty,
    val normalizer: SpNormalizer = SpNormalizer.Identity,
) extends TextTokenizer {

  require(modelType == "unigram" || modelType == "bpe",
    s"unsupported SentencePiece model type: $modelType")

  private val idToPiece: Array[String] = piecesInIdOrder.map(_._1).toArray
  private val scoreById: Array[Double] = piecesInIdOrder.map(_._2).toArray
  /** first occurrence wins, matching SP's piece-to-id resolution */
  val vocab: Map[String, Int] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    piecesInIdOrder.iterator.zipWithIndex.foreach { case ((p, _), i) =>
      if (!m.contains(p)) m(p) = i
    }
    m.toMap
  }

  private val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** byte-fallback piece ids, present only when the vocab carries them */
  private val byteIds: Array[Int] = {
    val arr = Array.fill(256)(-1)
    for (b <- 0 until 256; id <- vocab.get(f"<0x$b%02X>")) arr(b) = id
    arr
  }
  private val hasBytePieces = byteIds.forall(_ >= 0)

  private val maxPieceCps: Int =
    if (idToPiece.isEmpty) 1
    else idToPiece.iterator.map(p => p.codePointCount(0, p.length)).max

  private val unkScore: Double =
    (if (scoreById.isEmpty) 0.0 else scoreById.min) - 10.0

  /** cost of the unknown-single-codepoint lattice transition: with byte
    * fallback the segmentation resolves to the cp's `<0xXX>` pieces, so
    * the transition costs the SUM of those pieces' own scores (matching
    * the HF/sentencepiece lattice); flat `unkScore` only when the vocab
    * has no byte pieces to fall back on
    */
  private def unkCost(cp: String): Double =
    if (byteFallback && hasBytePieces) {
      val bs = cp.getBytes("UTF-8")
      var s = 0.0
      var i = 0
      while (i < bs.length) { s += scoreById(byteIds(bs(i) & 0xff)); i += 1 }
      s
    } else unkScore

  private val Meta = '▁' // ▁

  /** metaspace normalization + chunking: spaces → ▁, optional prefix ▁,
    * split so every chunk after the first starts with ▁
    */
  private def chunks(text: String): Seq[String] = {
    val replaced = text.replace(' ', Meta)
    val t = prependScheme match {
      case "never" => replaced
      case _ => if (replaced.nonEmpty && replaced.charAt(0) == Meta) replaced
                else s"$Meta$replaced"
    }
    if (t.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 1
    while (i < t.length) {
      if (t.charAt(i) == Meta) { out += t.substring(start, i); start = i }
      i += 1
    }
    out += t.substring(start)
    out.toSeq
  }

  /** one chunk's code points as single-codepoint strings */
  private def cps(chunk: String): Array[String] =
    chunk.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** unknown code point → byte-fallback ids or the unk id */
  private def fallback(cp: String): Seq[Int] =
    if (byteFallback && hasBytePieces)
      cp.getBytes("UTF-8").toSeq.map(b => byteIds(b & 0xff))
    else Seq(unkId)

  /** Viterbi max-score segmentation (ties: the longer piece wins, matching
    * the left-to-right longest-at-equal-score traversal)
    */
  private def unigramChunk(chunk: String): Seq[Int] = {
    val xs = cps(chunk)
    val n = xs.length
    if (n == 0) return Seq.empty
    // prefix sums of codepoint offsets into the chunk string for substring
    val offs = new Array[Int](n + 1)
    for (i <- 0 until n) offs(i + 1) = offs(i) + xs(i).length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val backStart = Array.fill(n + 1)(-1)
    val backId = Array.fill(n + 1)(-1) // -1 = unknown single cp
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - maxPieceCps)
      while (start < end) {
        if (best(start) > Double.NegativeInfinity) {
          vocab.get(chunk.substring(offs(start), offs(end))).foreach { id =>
            val cand = best(start) + scoreById(id)
            if (cand > best(end)) {
              best(end) = cand; backStart(end) = start; backId(end) = id
            }
          }
        }
        start += 1
      }
      // the unknown-single-codepoint transition keeps every input
      // tokenizable; inserted only when the cp has no piece of its own
      // (sentencepiece inserts the unk node iff !has_single_node)
      if (!vocab.contains(xs(end - 1)) &&
          best(end - 1) + unkCost(xs(end - 1)) > best(end)) {
        best(end) = best(end - 1) + unkCost(xs(end - 1))
        backStart(end) = end - 1
        backId(end) = -1
      }
      end += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pos = n
    while (pos > 0) {
      val s = backStart(pos)
      if (backId(pos) >= 0) out += backId(pos)
      else fallback(xs(s)).reverseIterator.foreach(out += _)
      pos = s
    }
    out.reverse.toSeq
  }

  /** greedy lowest-rank merging, SP-BPE style (raw code points, no byte map) */
  private def bpeChunk(chunk: String): Seq[Int] = {
    var symbols = cps(chunk).toVector
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
    symbols.flatMap(s => vocab.get(s).map(Seq(_)).getOrElse(fallback(s)))
  }

  /** Added/special tokens match greedily before segmentation (HF behavior:
    * `>>fra<<`-style control tokens are single pieces even when the model
    * would split them). Longest special first at each position.
    */
  private val specialByLength: Seq[(String, Int)] =
    specialIds.toSeq.filter(i => i >= 0 && i < idToPiece.length)
      .map(i => idToPiece(i) -> i).sortBy(-_._1.length)

  def encode(text: String): Seq[Int] = {
    if (text == null || text.isEmpty) return Seq.empty
    // split out special-token literals first, segment the text between them
    val parts = scala.collection.mutable.ArrayBuffer.empty[Either[String, Int]]
    var rest = text
    while (rest.nonEmpty) {
      val hit = specialByLength.iterator
        .map { case (tok, id) => (rest.indexOf(tok), tok, id) }
        .filter(_._1 >= 0)
        .minByOption(h => (h._1, -h._2.length))
      hit match {
        case None => parts += Left(rest); rest = ""
        case Some((at, tok, id)) =>
          if (at > 0) parts += Left(rest.substring(0, at))
          parts += Right(id)
          rest = rest.substring(at + tok.length)
      }
    }
    parts.toSeq.flatMap {
      case Right(id)   => Seq(id)
      case Left(plain) =>
        // normalizer runs on the plain text BETWEEN special tokens (HF
        // pipeline order for special=true added tokens), then metaspace
        chunks(normalizer(plain)).flatMap(c =>
          if (modelType == "unigram") unigramChunk(c) else bpeChunk(c))
    }
  }

  def decode(ids: Seq[Int], skipIds: Set[Int] = Set.empty): String = {
    val bytes = new java.io.ByteArrayOutputStream()
    val sb = new StringBuilder
    def flushBytes(): Unit =
      if (bytes.size() > 0) {
        sb.append(new String(bytes.toByteArray, "UTF-8"))
        bytes.reset()
      }
    ids.iterator
      .filterNot(skipIds)
      .filter(i => i >= 0 && i < idToPiece.length)
      .foreach { id =>
        val p = idToPiece(id)
        if (p.length == 6 && p.startsWith("<0x") && p.endsWith(">"))
          bytes.write(Integer.parseInt(p.substring(3, 5), 16))
        else { flushBytes(); sb.append(p) }
      }
    flushBytes()
    val text = sb.toString.replace(Meta, ' ')
    if (prependScheme != "never" && text.startsWith(" ")) text.substring(1)
    else text
  }
}

object SentencePiece {

  /** Load the HF `tokenizer.json` layout: `model.type` Unigram
    * (`vocab: [[piece, score], …]`, `unk_id`, `byte_fallback`) or BPE
    * (`vocab: {piece: id}`, `merges`, `unk_token`), plus `added_tokens`
    * (id overrides + special flags) and the Metaspace pre-tokenizer's
    * `prepend_scheme`.
    */
  def fromTokenizerJson(path: String): SentencePiece =
    fromJsonString(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def fromJsonString(json: String): SentencePiece = {
    val root = new ObjectMapper().readTree(json)
    val model = root.get("model")
    require(model != null, "tokenizer.json missing 'model'")
    val tpe = model.get("type").asText().toLowerCase(java.util.Locale.ROOT)

    val prepend = Option(root.get("pre_tokenizer"))
      .flatMap(findMetaspace)
      .flatMap(m => Option(m.get("prepend_scheme")).map(_.asText()))
      .getOrElse("always")

    val normalizer = SpNormalizer.parse(root.get("normalizer"))

    val (pieces0, merges, unkId0, byteFb) = tpe match {
      case "unigram" =>
        val vocab = model.get("vocab").elements().asScala.map { e =>
          e.get(0).asText() -> e.get(1).asDouble()
        }.toSeq
        val unk = Option(model.get("unk_id")).map(_.asInt()).getOrElse(0)
        val bf = Option(model.get("byte_fallback")).forall(_.asBoolean())
        (vocab, Seq.empty[(String, String)], unk, bf)
      case "bpe" =>
        val entries = model.get("vocab").properties().asScala
          .map(e => e.getKey -> e.getValue.asInt()).toSeq
        val maxId = if (entries.isEmpty) -1 else entries.map(_._2).max
        val arr = Array.fill(maxId + 1)("")
        entries.foreach { case (p, i) => arr(i) = p }
        val ms = Option(model.get("merges")).map(_.elements().asScala.map { m =>
          if (m.isArray) (m.get(0).asText(), m.get(1).asText())
          else { val sp = m.asText().split(" ", 2); (sp(0), sp(1)) }
        }.toSeq).getOrElse(Seq.empty)
        val unkTok = Option(model.get("unk_token")).map(_.asText()).getOrElse("<unk>")
        val unk = entries.toMap.getOrElse(unkTok, 0)
        val bf = Option(model.get("byte_fallback")).exists(_.asBoolean())
        (arr.toSeq.map(_ -> 0.0), ms, unk, bf)
      case other => throw new IllegalArgumentException(
        s"unsupported tokenizer.json model type: $other")
    }

    // added_tokens: place at their ids (growing the table if needed),
    // special ones are matched literally and skipped on decode
    var pieces = pieces0.toBuffer
    val special = scala.collection.mutable.Set.empty[Int]
    Option(root.get("added_tokens")).foreach(_.elements().asScala.foreach { t =>
      val id = t.get("id").asInt()
      val content = t.get("content").asText()
      while (pieces.length <= id) pieces += ("" -> 0.0)
      pieces(id) = content -> pieces(id)._2
      if (Option(t.get("special")).exists(_.asBoolean())) special += id
    })

    new SentencePiece(if (tpe == "bpe") "bpe" else "unigram", pieces.toSeq,
      merges, unkId0, byteFb, prepend, special.toSet, normalizer)
  }

  /** Load a sentencepiece protobuf `.model` / `.spm` file (the layout
    * `source.spm`-shipping checkpoint dirs use — see [[SpModelProto]]).
    * Mapping to this tokenizer:
    *  - pieces/scores in id order; CONTROL and USER_DEFINED pieces become
    *    greedily-matched specials (HF AddedVocabulary behavior);
    *  - byte fallback from the trainer spec OR the presence of BYTE pieces;
    *  - `add_dummy_prefix` → prepend scheme; `remove_extra_whitespaces` and
    *    the `precompiled_charsmap` (exact darts trie — [[PrecompiledCharsMap]])
    *    become the normalizer chain; a charsmap-less `nfkc`-family name
    *    approximates as NFKC (+ Nmt for `nmt_*`);
    *  - BPE models carry no explicit merge list: merges are derived the way
    *    HF's SentencePieceExtractor does — every (left, right) vocab split
    *    of a vocab piece, ranked by the merged piece's id.
    */
  def fromModelFile(path: String): SentencePiece =
    fromModelBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  def fromModelBytes(bytes: Array[Byte]): SentencePiece = {
    val m = SpModelProto.parse(bytes)
    require(m.modelType == 1 || m.modelType == 2,
      s"unsupported sentencepiece model_type ${m.modelType} (UNIGRAM/BPE only)")
    val pieces = m.pieces.map(p => p.piece -> p.score)
    val ids = pieces.iterator.map(_._1).zipWithIndex.toMap
    val special = m.pieces.zipWithIndex.collect {
      case (p, i) if p.tpe == SpModelProto.TypeControl ||
        p.tpe == SpModelProto.TypeUserDefined ||
        p.tpe == SpModelProto.TypeUnknown => i // HF marks unk special too
    }.toSet
    val byteFb = m.byteFallback ||
      m.pieces.exists(_.tpe == SpModelProto.TypeByte)
    val merges =
      if (m.modelType != 2) Seq.empty[(String, String)]
      else m.pieces.iterator.zipWithIndex
        .filter { case (p, i) => p.tpe == SpModelProto.TypeNormal }
        .flatMap { case (p, mergedId) =>
          val s = p.piece
          (1 until s.length).iterator.flatMap { cut =>
            val (l, r) = (s.substring(0, cut), s.substring(cut))
            for (li <- ids.get(l); ri <- ids.get(r))
              yield (mergedId, li, ri, (l, r))
          }
        }.toSeq.sortBy(t => (t._1, t._2, t._3)).map(_._4)
    val steps = Seq.newBuilder[SpNormalizer]
    if (m.precompiledCharsmap.nonEmpty)
      steps += SpNormalizer.Precompiled(
        java.util.Base64.getEncoder.encodeToString(m.precompiledCharsmap))
    else {
      val n = m.normalizerName.toLowerCase(java.util.Locale.ROOT)
      if (n.startsWith("nmt")) steps += SpNormalizer.Nmt
      if (n.contains("nfkc")) steps += SpNormalizer.Nfx("NFKC")
    }
    if (m.removeExtraWhitespaces) steps += SpNormalizer.RemoveExtraWhitespaces
    val norm = steps.result() match {
      case Seq()  => SpNormalizer.Identity
      case Seq(n) => n
      case ns     => SpNormalizer.Chain(ns)
    }
    new SentencePiece(
      if (m.modelType == 2) "bpe" else "unigram",
      pieces, merges, m.unkId, byteFb,
      if (m.addDummyPrefix) "always" else "never",
      special, norm)
  }

  /** Metaspace may sit at top level or inside a Sequence pre-tokenizer */
  private def findMetaspace(node: JsonNode): Option[JsonNode] = {
    if (Option(node.get("type")).exists(_.asText() == "Metaspace")) Some(node)
    else Option(node.get("pretokenizers")).flatMap(
      _.elements().asScala.flatMap(findMetaspace(_).iterator).nextOption())
  }

  /** Write a unigram-model tokenizer.json (fixtures / tiny checkpoints).
    * `normalizerTypes` emits a `Sequence` of parameterless normalizer
    * nodes (e.g. Seq("NFKC")) in the HF layout.
    */
  def writeUnigramJson(path: String, pieces: Seq[(String, Double)],
      unkId: Int, byteFallback: Boolean = true,
      addedSpecials: Seq[(Int, String)] = Seq.empty,
      prependScheme: String = "always",
      normalizerTypes: Seq[String] = Seq.empty): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    if (normalizerTypes.nonEmpty) {
      val norm = root.putObject("normalizer")
      norm.put("type", "Sequence")
      val arr = norm.putArray("normalizers")
      normalizerTypes.foreach(t => arr.addObject().put("type", t))
    }
    val added = root.putArray("added_tokens")
    addedSpecials.foreach { case (id, content) =>
      val t = added.addObject()
      t.put("id", id); t.put("content", content); t.put("special", true)
    }
    val pre = root.putObject("pre_tokenizer")
    pre.put("type", "Metaspace")
    pre.put("replacement", "▁")
    pre.put("prepend_scheme", prependScheme)
    val model = root.putObject("model")
    model.put("type", "Unigram")
    model.put("unk_id", unkId)
    model.put("byte_fallback", byteFallback)
    val vocab = model.putArray("vocab")
    pieces.foreach { case (p, s) =>
      val e = vocab.addArray(); e.add(p); e.add(s)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      mapper.writeValueAsBytes(root))
  }
}
