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

  test("r7 media iterators terminate on garbage, truncations, and degenerate inputs") {
    val real = Video.makeBlockVideo(Seq(3, 2), Seq(0xff0000, 0x0000ff), 8, 6, 10)
    def survives(f: => Any): Unit =
      try { f; () } catch { case _: Exception => () } // raise ok; hang/JVM-kill not
    // every truncation prefix of a real AVI through all five detectors,
    // the splitter, and the frame reader
    for (len <- 1 until real.length by 53) {
      val cut = real.take(len)
      survives(SceneDetect.detectContent(cut, 27.0, 2, lumaOnly = false))
      survives(SceneDetect.detectThreshold(cut, 12.0, 2, 0.0,
        addFinalScene = false, method = "floor"))
      survives(SceneDetect.detectHash(cut, 0.395, 8, 2, 2))
      survives(SceneDetect.detectHistogram(cut, 0.05, 16, 2))
      survives(SceneDetect.detectAdaptive(cut, 3.0, 2, 1, 15.0))
      survives(Avi.readFrames(cut))
    }
    // random garbage with a RIFF header
    for (_ <- 0 until 100) {
      val b = new Array[Byte](12 + rnd.nextInt(2000))
      rnd.nextBytes(b)
      System.arraycopy("RIFF".getBytes(ISO_8859_1), 0, b, 0, 4)
      survives(SceneDetect.detectContent(b, 27.0, 2, lumaOnly = false))
      survives(Avi.readMeta(b))
    }
    // single-frame video: every detector returns the degenerate full-span
    // scene; the splitter returns one segment
    val one = Video.makeTestVideo(1, 8, 6, 0x123456, 10)
    assert(SceneDetect.detectContent(one, 27.0, 2, lumaOnly = false) ==
      Seq(SceneDetect.SceneInfo(0.0, 0L, 0.0)))
    assert(SceneDetect.detectHash(one, 0.395, 8, 2, 2).length == 1)
    // audio: truncated WAV prefixes through the PCM decoder
    val wav = Audio.sineWav(0.5, 440.0)
    for (len <- 1 until wav.length by 97)
      survives(Audio.decodePcm(wav.take(len)))
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
