package graft.functions

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

/** Corpus-robustness fuzzing: at 100 TB every malformed byte sequence
  * that can exist, does — the parsers behind per-cell-error UDFs must
  * never hang or kill a task, only raise (captured) or return.
  */
class RobustnessSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(20260813L)

  test("pdfPagesSafe surface: random garbage and truncations never escape") {
    // raw garbage with a %PDF header (passes the cheap gate, then must
    // survive object scan / filter decode / page walk)
    for (i <- 0 until 200) {
      val n = 1 + rnd.nextInt(4000)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      val withHeader = "%PDF-1.4\n".getBytes(ISO_8859_1) ++ b
      try { Pdf.extractPages(withHeader); () }
      catch { case _: Exception => () } // any raise is fine; hangs are not
    }
    // every truncation prefix of a real multi-page encrypted PDF
    val real = Pdf.writePdfEncrypted(Seq("page one", "page two"), "aes")
    for (len <- 1 until real.length by 37) {
      try { Pdf.extractPages(real.take(len)); () }
      catch { case _: Exception => () }
    }
    // bit flips in a real PDF (xref/dict/stream corruption)
    val plain = Pdf.writePdf(Seq("alpha", "beta", "gamma"))
    for (_ <- 0 until 200) {
      val c = plain.clone()
      val pos = rnd.nextInt(c.length)
      c(pos) = (c(pos) ^ (1 << rnd.nextInt(8))).toByte
      try { Pdf.extractPages(c); () }
      catch { case _: Exception => () }
    }
  }

  test("LZW/85/hex/RL decoders terminate on arbitrary input") {
    for (_ <- 0 until 300) {
      val b = new Array[Byte](1 + rnd.nextInt(2000))
      rnd.nextBytes(b)
      for (dec <- Seq[Array[Byte] => Array[Byte]](
          Pdf.lzwDecode(_), Pdf.ascii85Decode, Pdf.asciiHexDecode,
          Pdf.runLengthDecode)) {
        try { dec(b); () } catch { case _: Exception => () }
      }
    }
  }

  test("html blocks terminate on adversarial tag soup") {
    val nasty = Seq(
      "<" * 5000,
      "<a " + "x='" * 1000,
      "<script>" + "<div>" * 1000, // unterminated raw-skip
      "&#" * 2000 + ";",
      "<!--" * 500,
      "<![CDATA[" * 100)
    for (s <- nasty) assert(Html.blocks(s) != null)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](1 + rnd.nextInt(3000))
      rnd.nextBytes(b)
      assert(Html.blocks(new String(b, ISO_8859_1)) != null)
    }
  }
}
