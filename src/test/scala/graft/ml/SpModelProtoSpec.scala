package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** The protobuf `.model` / `.spm` loader: identical encode/decode vs the
  * equivalent tokenizer.json, unknown-field skipping, normalizer-spec
  * wiring (precompiled charsmap, dummy prefix, extra-whitespace removal),
  * HF-style merge derivation for SP-BPE models, and the checkpoint-dir
  * resolution order in the Marian bundle.
  */
class SpModelProtoSpec extends AnyFunSuite {

  private val Meta = "▁"
  private val EAcute = "é"

  private def bytePieces(score: Double): Seq[SpModelProto.Piece] =
    (0 until 256).map(b =>
      SpModelProto.Piece(f"<0x$b%02X>", score, SpModelProto.TypeByte))

  /** unigram fixture shared by the json-equivalence tests: 256 byte
    * pieces, unk + control specials, scored word pieces
    */
  private def unigramPieces: Seq[SpModelProto.Piece] =
    bytePieces(-10.0) ++ Seq(
      SpModelProto.Piece("<unk>", 0.0, SpModelProto.TypeUnknown),
      SpModelProto.Piece("</s>", 0.0, SpModelProto.TypeControl),
      SpModelProto.Piece(Meta + "the", -1.0, SpModelProto.TypeNormal),
      SpModelProto.Piece(Meta + "a", -1.8, SpModelProto.TypeNormal),
      SpModelProto.Piece("he", -1.7, SpModelProto.TypeNormal),
      SpModelProto.Piece("t", -3.0, SpModelProto.TypeNormal),
      SpModelProto.Piece("ing", -2.0, SpModelProto.TypeNormal))

  test(".model unigram: encode/decode identical to the equivalent tokenizer.json") {
    val blob = SpModelProto.write(unigramPieces, modelType = 1,
      byteFallback = true, unkId = 256)
    val spm = SentencePiece.fromModelBytes(blob)

    val vocabJson = unigramPieces.map(p =>
      s"""["${p.piece.replace("\\", "\\\\").replace("\"", "\\\"")}",${p.score}]""")
      .mkString(",")
    val json =
      s"""{"pre_tokenizer":{"type":"Metaspace","replacement":"$Meta","prepend_scheme":"always"},
         |"added_tokens":[{"id":256,"content":"<unk>","special":true},
         |                {"id":257,"content":"</s>","special":true}],
         |"model":{"type":"Unigram","unk_id":256,"byte_fallback":true,
         |  "vocab":[$vocabJson]}}""".stripMargin
    val spj = SentencePiece.fromJsonString(json)

    for (t <- Seq("the thing", "a cat" + EAcute, "het </s> t", "", "   ", "thething"))
      assert(spm.encode(t) == spj.encode(t), s"input '$t'")
    val ids = spm.encode("the a" + EAcute)
    assert(spm.decode(ids) == spj.decode(ids))
    assert(spm.decode(ids) == "the a" + EAcute)
  }

  test(".model: trainer/normalizer fields decode; unknown fields are skipped") {
    val blob = SpModelProto.write(unigramPieces, modelType = 1,
      byteFallback = true, unkId = 256, addDummyPrefix = false,
      removeExtraWhitespaces = true)
    // append unknown top-level fields: #99 varint (tag 792 = [0x98,0x06])
    // and #98 length-delimited (tag 786 = [0x92,0x06], 3 bytes)
    val extra = Array[Byte](0x98.toByte, 0x06, 7,
      0x92.toByte, 0x06, 3, 1, 2, 3)
    val m = SpModelProto.parse(blob ++ extra)
    assert(m.pieces.size == unigramPieces.size)
    assert(m.modelType == 1 && m.byteFallback && m.unkId == 256)
    assert(!m.addDummyPrefix && m.removeExtraWhitespaces)
    val sp = SentencePiece.fromModelBytes(blob ++ extra)
    assert(sp.prependScheme == "never")
    // remove_extra_whitespaces collapses runs before metaspace chunking
    assert(sp.decode(sp.encode("the   thing")) == "the thing")
  }

  test(".model: precompiled charsmap from the normalizer spec is applied") {
    val charsmap = DartsFixtures.charsmapBlob(Seq(EAcute -> "e"))
    val blob = SpModelProto.write(unigramPieces, modelType = 1,
      byteFallback = true, unkId = 256, normalizerName = "nmt_nfkc",
      precompiledCharsmap = charsmap)
    val sp = SentencePiece.fromModelBytes(blob)
    val rev = sp.vocab.map(_.swap)
    // 'th(e-acute)' normalizes to 'the' -> the single word piece
    assert(sp.encode("th" + EAcute).map(rev) == Seq(Meta + "the"))
  }

  test(".model BPE: merges derive HF-extractor style (ranked by merged id)") {
    // id order: specials, singles, then merged pieces — merged id IS rank
    val pieces = Seq(
      SpModelProto.Piece("<unk>", 0.0, SpModelProto.TypeUnknown),
      SpModelProto.Piece(Meta, 0.0, SpModelProto.TypeNormal),
      SpModelProto.Piece("a", 0.0, SpModelProto.TypeNormal),
      SpModelProto.Piece("b", 0.0, SpModelProto.TypeNormal),
      SpModelProto.Piece("c", 0.0, SpModelProto.TypeNormal),
      SpModelProto.Piece("ab", -1.0, SpModelProto.TypeNormal),   // rank 0
      SpModelProto.Piece("abc", -2.0, SpModelProto.TypeNormal),  // rank 1
      SpModelProto.Piece(Meta + "abc", -3.0, SpModelProto.TypeNormal))
    val blob = SpModelProto.write(pieces, modelType = 2,
      byteFallback = false, unkId = 0)
    val sp = SentencePiece.fromModelBytes(blob)
    assert(sp.modelType == "bpe")
    val rev = sp.vocab.map(_.swap)
    // greedy lowest-rank: a+b -> ab, ab+c -> abc, meta+abc -> full piece
    assert(sp.encode("abc").map(rev) == Seq(Meta + "abc"))
    // unmergeable tail falls back to singles
    assert(sp.encode("cb").map(rev) == Seq(Meta, "c", "b"))
  }

  test("Marian checkpoint dir with source.spm (no tokenizer.json) loads SP") {
    val src = LocalModels.ensureTinyMarianModel()
    val dir = java.nio.file.Files.createTempDirectory("graft-spm-marian")
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(src))
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val f = it.next()
        if (f.getFileName.toString != "tokenizer.json")
          java.nio.file.Files.copy(f, dir.resolve(f.getFileName.toString))
      }
    } finally s.close()
    // write the SAME vocab as the json the tiny checkpoint ships, as .spm
    val jsonSp = SentencePiece.fromTokenizerJson(
      java.nio.file.Paths.get(src, "tokenizer.json").toString)
    val rev = jsonSp.vocab.toSeq.sortBy(_._2)
    val protoPieces = rev.map { case (p, id) =>
      val tpe =
        if (p.matches("<0x[0-9A-F]{2}>")) SpModelProto.TypeByte
        else if (jsonSp.specialIds.contains(id))
          (if (id == jsonSp.unkId) SpModelProto.TypeUnknown
           else SpModelProto.TypeControl)
        else SpModelProto.TypeNormal
      SpModelProto.Piece(p, 0.0, tpe) // scores differ; structure suffices
    }
    java.nio.file.Files.write(dir.resolve("source.spm"),
      SpModelProto.write(protoPieces, 1, byteFallback = true,
        unkId = jsonSp.unkId))
    val bundle = LocalModels.loadMarian(dir.toString)
    assert(bundle.spTokenizerJson.isEmpty && bundle.spModelProto.isDefined)
    assert(bundle.tokenizer.isInstanceOf[SentencePiece])
    val ids = bundle.tokenizer.encode("the cat")
    assert(ids.nonEmpty &&
      bundle.tokenizer.decode(ids, jsonSp.specialIds) == "the cat")
  }
}
