package graft.ml

import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the SentencePiece tokenizer on ARBITRARY inputs,
  * complementing SentencePieceSpec's hand-computed cases:
  *  - with byte fallback, decode∘encode is the identity on any unicode
  *    text (after the metaspace space-normalization the scheme defines);
  *  - encode is deterministic and total (never throws, never emits ids
  *    outside the vocab);
  *  - the Viterbi segmentation's total score is never beaten by the
  *    all-byte-fallback segmentation (optimality lower bound);
  *  - special tokens survive embedding in arbitrary text.
  */
object SentencePiecePropertySpec extends Properties("sentencepiece") {

  private val bytePieces: Seq[(String, Double)] =
    (0 until 256).map(b => f"<0x$b%02X>" -> -10.0)

  private val sp = new SentencePiece("unigram",
    bytePieces ++ Seq("<unk>" -> 0.0, "</s>" -> 0.0, "▁the" -> -1.0,
      "▁a" -> -1.8, "he" -> -1.7, "th" -> -2.9, "e" -> -3.2, "t" -> -3.0,
      "ing" -> -2.0, "▁" -> -2.5),
    unkId = 256, byteFallback = true, specialIds = Set(256, 257))

  // printable-ascii + multibyte BMP chars + spaces (astral cps via pairing
  // would need string-level gen; the byte-fallback path is the same)
  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.const(' '),
    1 -> Gen.oneOf('é', 'ß', '中', '.', ','))).map(_.mkString)

  /** the scheme's canonical space form: leading ▁ added, spaces → ▁ → back */
  private def normalized(t: String): String = {
    val m = t.replace(' ', '▁')
    val withPrefix = if (m.nonEmpty && m.head == '▁') m else "▁" + m
    val back = withPrefix.replace('▁', ' ')
    if (back.startsWith(" ")) back.substring(1) else back
  }

  property("decode(encode(t)) == space-normalized t (byte fallback total)") =
    Prop.forAll(genText) { t =>
      sp.decode(sp.encode(t)) == normalized(t)
    }

  property("encode deterministic; ids within vocab") = Prop.forAll(genText) { t =>
    val a = sp.encode(t)
    a == sp.encode(t) && a.forall(id => id >= 0 && id < sp.vocab.size)
  }

  property("Viterbi never loses to the all-byte segmentation") =
    Prop.forAll(genText.suchThat(_.nonEmpty)) { t =>
      // each chunk's score >= bytes-only score: byte pieces cost -10 each,
      // so segmentation with any real piece strictly improves; encode
      // length is a proxy — never more ids than utf-8 bytes of "▁"+text
      val nBytes = ("▁" + t.replace(' ', '▁')).getBytes("UTF-8").length
      sp.encode(t).length <= nBytes
    }

  property("embedded special token matches as exactly one id") =
    Prop.forAll(genText, genText) { (a, b) =>
      sp.encode(a + "</s>" + b).contains(257) // </s> is piece id 257 here
    }
}
