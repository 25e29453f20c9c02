package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Per-cell compression codecs: round-trips, magic-sniffed auto
  * decompression (incl. nested layers), and the documentToText handoff —
  * a gzip-compressed docx chunks like the plain one.
  */
class CompressSpec extends AnyFunSuite {
  import Compress._

  private val payload =
    ("the quick brown fox " * 100).getBytes("UTF-8")

  test("gzip/zstd/lz4/snappy round-trip and actually compress") {
    for ((enc, dec, name) <- Seq(
        (gzip(_: Array[Byte]), gunzip _, "gzip"),
        (zstd(_: Array[Byte], 3), unzstd _, "zstd"),
        (lz4 _, unlz4 _, "lz4"),
        (snappy _, unsnappy _, "snappy"))) {
      val c = enc(payload)
      assert(dec(c).toSeq == payload.toSeq, name)
      assert(c.length < payload.length / 2, s"$name: ${c.length}")
    }
  }

  test("decompressAuto sniffs magics, passes plain data through, bounds depth") {
    assert(decompressAuto(gzip(payload)).toSeq == payload.toSeq)
    assert(decompressAuto(zstd(payload, 3)).toSeq == payload.toSeq)
    assert(decompressAuto(lz4(payload)).toSeq == payload.toSeq)
    assert(decompressAuto(payload).toSeq == payload.toSeq) // no magic
    // nested: zstd(gzip(x)) unwraps both layers
    assert(decompressAuto(zstd(gzip(payload), 3)).toSeq == payload.toSeq)
    // tiny payloads don't crash the sniffer
    assert(decompressAuto(Array[Byte](1, 2)).toSeq == Seq[Byte](1, 2))
  }

  test("documentToText unwraps compressed documents before dispatch") {
    val docx = Office.writeDocx(Seq((1, "T"), (0, "compressed body")))
    assert(Office.documentToText(gzip(docx)) == "# T\n\ncompressed body")
    assert(Office.documentToText(zstd("plain text".getBytes, 3)) == "plain text")
    val pdf = Pdf.writePdf(Seq("page"))
    assert(Office.documentToText(lz4(pdf)) == "page")
  }
}
