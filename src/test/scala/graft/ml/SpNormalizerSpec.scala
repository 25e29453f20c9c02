package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** The tokenizer.json `normalizer` stage: node-by-node unit pins
  * (accented / full-width / NBSP inputs against hand-computed HF
  * behavior), the EXACT `Precompiled` charsmap parser against a
  * self-built darts-clone double-array blob, and end-to-end
  * normalizer -> encode integration through the tokenizer.json loader.
  * All non-ASCII inputs are spelled as \\uXXXX escapes so the pins are
  * byte-exact regardless of editor/encoding.
  */
class SpNormalizerSpec extends AnyFunSuite {

  private val Meta = "\u2581" // the SP metaspace
  private val FiLig = "\uFB01" // fi ligature
  private val FfiLig = "\uFB03" // ffi ligature
  private val Nbsp = "\u00A0"
  private val Zwsp = "\u200B"
  private val EAcute = "\u00E9" // composed
  private val EAcuteD = "e\u0301" // decomposed e + combining acute
  private val Ellipsis = "\u2026"
  private val FwA = "\uFF21" // full-width A
  private val FwB = "\uFF42" // full-width b
  private val FwC = "\uFF43" // full-width c
  private val Fw1 = "\uFF11" // full-width 1
  private val Cjk = "\u4E2D\u6587" // two CJK chars

  // charsmap blobs come from the shared darts-clone builder (DartsFixtures)

  private def charsmapBlob(mappings: Seq[(String, String)]): Array[Byte] =
    DartsFixtures.charsmapBlob(mappings)

  private def precompiled(mappings: (String, String)*): SpNormalizer =
    SpNormalizer.Precompiled(
      java.util.Base64.getEncoder.encodeToString(charsmapBlob(mappings)))

  // ---------- unit pins ----------

  test("NFKC folds ligatures, full-width forms and NBSP (hand-computed)") {
    val n = SpNormalizer.Nfx("NFKC")
    assert(n(FiLig + "le") == "file")
    assert(n(FwA + FwB + FwC + Fw1) == "Abc1")
    assert(n("a" + Nbsp + "b") == "a b")
    assert(n(EAcuteD) == EAcute) // combining acute composes
  }

  test("NFC composes without compatibility folding") {
    val n = SpNormalizer.Nfx("NFC")
    assert(n(EAcuteD) == EAcute)
    assert(n(FiLig) == FiLig) // NFC keeps the ligature NFKC would split
  }

  test("Replace: literal and regex patterns") {
    assert(SpNormalizer.Replace(" ", false, Meta)("a b c") ==
      "a" + Meta + "b" + Meta + "c")
    assert(SpNormalizer.Replace(" {2,}", true, " ")("a  b   c") == "a b c")
  }

  test("Strip, Prepend, Lowercase, Nmt") {
    assert(SpNormalizer.Strip(left = true, right = true)("  ab\t ") == "ab")
    assert(SpNormalizer.Strip(left = false, right = true)("  ab ") == "  ab")
    assert(SpNormalizer.Prepend(Meta)("x") == Meta + "x")
    assert(SpNormalizer.Prepend(Meta)("") == "")
    assert(SpNormalizer.Lowercase("AbC") == "abc")
    assert(SpNormalizer.Nmt("ab\nc" + Zwsp + "d") == "ab c d")
    assert(SpNormalizer.Nmt("a\u0007b") == "ab") // control char removed
  }

  test("RemoveExtraWhitespaces trims and collapses") {
    assert(SpNormalizer.RemoveExtraWhitespaces("  a  b   c  ") == "a b c")
  }

  // ---------- Precompiled exactness ----------

  test("Precompiled: multi-byte keys map through the double-array trie") {
    val n = precompiled(EAcute -> "e", Ellipsis -> "...", Nbsp -> " ")
    assert(n("caf" + EAcute + Ellipsis + Nbsp + "ok") == "cafe... ok")
    assert(n("plain ascii") == "plain ascii") // no-match passthrough
    assert(n(Cjk) == Cjk) // unmapped multi-byte intact
  }

  test("Precompiled: LONGEST prefix wins over a shorter key") {
    val n = precompiled("a" -> "Y", "ab" -> "X")
    assert(n("abc") == "Xc")
    assert(n("a") == "Y")
    assert(n("aab") == "YX")
  }

  test("Precompiled: deletion (empty replacement) and expansion") {
    val n = precompiled(Zwsp -> "", FfiLig -> "ffi")
    assert(n("a" + Zwsp + "b") == "ab")
    assert(n("o" + FfiLig + "ce") == "office")
  }

  test("Precompiled: malformed blob fails loudly") {
    val bad = java.util.Base64.getEncoder.encodeToString(Array[Byte](9, 0, 0))
    intercept[IllegalArgumentException] {
      SpNormalizer.Precompiled(bad)("x")
    }
  }

  // ---------- parser + end-to-end through the tokenizer ----------

  test("parse: Sequence of NFKC + Replace from tokenizer.json layout") {
    val json =
      """{"type":"Sequence","normalizers":[
        |  {"type":"NFKC"},
        |  {"type":"Replace","pattern":{"String":"  "},"content":" "}]}""".stripMargin
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = SpNormalizer.parse(om.readTree(json))
    assert(n(FwA + "  " + FiLig + "n") == "A fin")
  }

  test("parse: Replace with a Regex pattern node") {
    val json =
      """{"type":"Replace","pattern":{"Regex":"[0-9]+"},"content":"#"}"""
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(SpNormalizer.parse(om.readTree(json))("a12b345") == "a#b#")
  }

  test("parse: unknown normalizer type fails loudly") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    intercept[IllegalArgumentException] {
      SpNormalizer.parse(om.readTree("""{"type":"BertNormalizer"}"""))
    }
  }

  test("tokenizer.json with a normalizer block drives encode (accented input)") {
    val bytePieces = (0 until 256)
      .map(b => f"""["<0x$b%02X>",-10.0]""").mkString(",")
    val json =
      s"""{"normalizer":{"type":"Sequence","normalizers":[{"type":"NFKC"}]},
         |"pre_tokenizer":{"type":"Metaspace","replacement":"$Meta","prepend_scheme":"always"},
         |"model":{"type":"Unigram","unk_id":256,"byte_fallback":true,
         |  "vocab":[$bytePieces,["<unk>",0.0],["${Meta}file",-1.0],["${Meta}A",-1.2]]}}""".stripMargin
    val sp = SentencePiece.fromJsonString(json)
    val rev = sp.vocab.map(_.swap)
    // the fi-ligature 'file' normalizes to plain 'file' -> single piece
    assert(sp.encode(FiLig + "le").map(rev) == Seq(Meta + "file"))
    // full-width A folds to A
    assert(sp.encode(FwA).map(rev) == Seq(Meta + "A"))
    // NBSP folds to a space -> metaspace chunk boundary
    assert(sp.encode("A" + Nbsp + "file").map(rev) ==
      Seq(Meta + "A", Meta + "file"))
  }

  test("byte-fallback lattice transition scores as the BYTE pieces' sum") {
    // byte pieces at -1.0 each; the only multi-cp piece scores far worse
    // than two 1-byte fallbacks (-2.0) — the lattice must pick the bytes.
    // (Under the old flat min-10 convention the piece would have won.)
    val pieces = (0 until 256).map(b => f"<0x$b%02X>" -> -1.0) ++
      Seq("<unk>" -> 0.0, (Meta + "ab") -> -25.0)
    val sp = new SentencePiece("unigram", pieces, unkId = 256,
      byteFallback = true, specialIds = Set(256))
    val rev = sp.vocab.map(_.swap)
    val out = sp.encode("ab").map(rev)
    assert(out.forall(_.startsWith("<0x")), s"picked $out")
    assert(sp.decode(sp.encode("ab")) == "ab")
  }
}
