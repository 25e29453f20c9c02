package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CodecsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("image transcode round-trips through gif/bmp/tiff with pixels intact") {
    val png = Images.solidPng(6, 4, 0x3060C0)
    for (fmt <- Seq("gif", "bmp", "tiff")) {
      val re = Codecs.reencodeImage(png, fmt)
      assert(Codecs.imageFormatOf(re) == fmt, s"format tag for $fmt")
      val img = Images.decode(re)
      assert(img.getWidth == 6 && img.getHeight == 4, s"dims after $fmt")
      // solid color survives every palette/truecolor container exactly
      assert((img.getRGB(2, 2) & 0xFFFFFF) == 0x3060C0, s"pixel after $fmt")
    }
    assert(Codecs.imageFormatOf(png) == "png")
    // wbmp is 1-bit: survives as pure black/white
    val bw = Codecs.reencodeImage(Images.solidPng(4, 4, 0xFFFFFF), "wbmp")
    assert((Images.decode(bw).getRGB(1, 1) & 0xFFFFFF) == 0xFFFFFF)
  }

  test("animated gif: write frames, read back count, dims, delays, pixels") {
    val frames = Seq(0xFF0000, 0x00FF00, 0x0000FF).map(c =>
      Images.decode(Images.solidPng(8, 5, c)))
    val gif = Codecs.makeAnimatedGif(frames, delayMs = 40)
    assert(Codecs.imageFormatOf(gif) == "gif")
    val back = Codecs.gifFrames(gif)
    assert(back.length == 3)
    assert(back.forall { case (delay, img) =>
      delay == 40 && img.getWidth == 8 && img.getHeight == 5 })
    // GIF quantizes to a 256-color palette; solid primaries survive exactly
    val got = back.map(_._2.getRGB(3, 2) & 0xFFFFFF)
    assert(got == Seq(0xFF0000, 0x00FF00, 0x0000FF), s"frame pixels $got")
  }

  test("gifFrameIterator explodes one row per frame, distributed") {
    val gif = Codecs.makeAnimatedGif(
      (1 to 4).map(i => Images.decode(Images.solidPng(4, 4, i * 0x111111))), 20)
    val df = Seq((1L, gif), (2L, gif)).toDF("id", "media")
    val out = Codecs.gifFrameIterator(df, "media")
    assert(out.count() == 8)
    assert(out.filter(col("id") === 1L).select("frame_idx")
      .as[Int].collect().sorted.toSeq == Seq(0, 1, 2, 3))
    val first = out.filter(col("id") === 1L && col("frame_idx") === 2).head()
    assert(Images.decode(first.getAs[Array[Byte]]("frame_png")).getWidth == 4)
  }

  test("multi-page tiff: build, page count, per-page dims and pixels") {
    val pages = Seq((4, 3, 0xAA0000), (6, 2, 0x00BB00), (5, 5, 0x0000CC))
      .map { case (w, h, c) => Images.decode(Images.solidPng(w, h, c)) }
    val tiff = Codecs.makeMultipageTiff(pages)
    assert(Codecs.imageFormatOf(tiff) == "tiff")
    val back = Codecs.tiffPages(tiff)
    assert(back.map(p => (p.getWidth, p.getHeight)) == Seq((4, 3), (6, 2), (5, 5)))
    assert((back(1).getRGB(2, 1) & 0xFFFFFF) == 0x00BB00)
    // distributed page iterator: one row per page with dims
    val df = Seq((7L, tiff)).toDF("doc_id", "tiff")
    val rows = Codecs.tiffPageIterator(df, "tiff").orderBy("page_idx").collect()
    assert(rows.map(_.getAs[Int]("page_idx")).toSeq == Seq(0, 1, 2))
    assert(rows.map(r => (r.getAs[Int]("page_w"), r.getAs[Int]("page_h"))).toSeq ==
      Seq((4, 3), (6, 2), (5, 5)))
    assert(Images.decode(rows(2).getAs[Array[Byte]]("page_png")).getHeight == 5)
  }

  test("audio transcode wav → aiff → au → wav preserves pcm samples") {
    val wav = Audio.sineWav(0.05, 440.0)
    val (fmtW, samplesW) = Audio.decodePcm(wav)
    val aiff = Codecs.transcodeAudio(wav, "aiff")
    val au = Codecs.transcodeAudio(aiff, "au")
    val wav2 = Codecs.transcodeAudio(au, "wav")
    val (fmt2, samples2) = Audio.decodePcm(wav2)
    assert(fmt2.getSampleRate == fmtW.getSampleRate)
    assert(samples2.toSeq == samplesW.toSeq, "pcm payload changed in transit")
    // container magic: AIFF starts FORM, AU starts .snd
    assert(new String(aiff.take(4), "US-ASCII") == "FORM")
    assert(new String(au.take(4), "US-ASCII") == ".snd")
  }

  test("column surface works end-to-end in a dataframe") {
    val df = Seq((1L, Images.solidPng(5, 5, 0x804020))).toDF("id", "img")
    val row = df.select(
      Codecs.imageFormat(col("img")).as("f"),
      Codecs.reencode(col("img"), "bmp").as("bmp")).head()
    assert(row.getString(0) == "png")
    assert(Codecs.imageFormatOf(row.getAs[Array[Byte]]("bmp")) == "bmp")
  }
}
