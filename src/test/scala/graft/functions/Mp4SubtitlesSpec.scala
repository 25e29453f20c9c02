package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** WebVTT-in-MP4 subtitle tracks (ISO 14496-30: `wvtt` sample entry,
  * `vttc(payl)` cue samples, `vtte` gaps) — the subtitle streams the
  * reference copies in clips (`utils/av.py:289`) and reports in
  * `get_metadata` stream listings.
  */
class Mp4SubtitlesSpec extends AnyFunSuite {

  private def jpeg(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("cue round-trip: leading gap, inter-cue gaps, adjacent cues") {
    val cues = Seq((0.5, 1.25, "first cue"), (1.25, 2.0, "adjacent"),
      (3.0, 4.5, "after a gap"), (4.75, 5.0, "Ünïcødé — text"))
    val v = Mp4.write(Seq(jpeg()), 8, 6, 2, subtitles = cues)
    assert(Mp4.readSubtitles(v) == cues)
    // video demux undisturbed; subtitle track visible as a text track
    assert(Mp4.readFrames(v).length == 1)
    val tracks = Mp4.parseTracks(v)
    assert(tracks.map(_.handler) == Seq("vide", "text"))
    assert(tracks(1).codec == "webvtt")
  }

  test("multi-track: video + pcm + mp3 + subtitles all resolve") {
    val samples = Array.tabulate(800)(i => (i % 50).toShort)
    val cues = Seq((0.0, 1.0, "a"), (1.0, 2.0, "b"))
    val v = Mp4.write(Seq(jpeg(), jpeg()), 8, 6, 2,
      audio = Some((samples, 800)),
      mp3 = Some((Seq(Array.fill[Byte](96)(9)), 32000, 1152)),
      tags = Seq("title" -> "T"),
      subtitles = cues)
    assert(Mp4.parseTracks(v).map(_.handler) ==
      Seq("vide", "soun", "soun", "text"))
    assert(Mp4.readSubtitles(v) == cues)
    assert(Mp4.readAudio(v).get._1.length == 800)
    assert(Mp4.readTags(v) == Seq("title" -> "T"))
    val cm = Multimedia.containerMeta(v)
    assert(cm.streams.map(_.`type`) ==
      Seq("video", "audio", "audio", "subtitle"))
    assert(cm.streams.last.codec_context.name == "webvtt")
    assert(cm.streams.last.frames == Mp4.parseTracks(v).last.nSamples)
  }

  test("no subtitle track → empty; avi → empty; overlap rejected") {
    assert(Mp4.readSubtitles(Mp4.write(Seq(jpeg()), 8, 6, 1)).isEmpty)
    val e = intercept[IllegalArgumentException](Mp4.write(Seq(jpeg()), 8, 6, 1,
      subtitles = Seq((0.0, 2.0, "x"), (1.0, 3.0, "y"))))
    assert(e.getMessage.contains("overlapping"))
    val e2 = intercept[IllegalArgumentException](Mp4.write(Seq(jpeg()), 8, 6, 1,
      subtitles = Seq((1.0, 1.0, "empty"))))
    assert(e2.getMessage.contains("empty cue"))
  }

  test("extracted track feeds the Subtitles/document pipeline") {
    val cues = Seq((0.0, 1.5, "<i>Hello</i> world"), (2.0, 3.0, "- Bye."))
    val v = Mp4.write(Seq(jpeg()), 8, 6, 1, subtitles = cues)
    val extracted = Mp4.readSubtitles(v)
    val vtt = Subtitles.formatVtt(extracted)
    assert(Office.documentToText(vtt.getBytes("UTF-8")) ==
      "Hello world\nBye.")
    // and re-parsing the formatted doc preserves the timeline
    val back = Subtitles.parse(vtt)
    assert(back.map(c => (c.start, c.end, c.text)) == cues)
  }

  test("200 random cue timelines round-trip (ms grid)") {
    val rnd = new scala.util.Random(174)
    for (case_ <- 0 until 200) {
      var t = rnd.nextInt(500)
      val cues = (0 until rnd.nextInt(10) + 1).map { i =>
        val s = t + rnd.nextInt(300)
        val e = s + rnd.nextInt(2000) + 1
        t = e + (if (rnd.nextBoolean()) 0 else rnd.nextInt(400))
        (s / 1000.0, e / 1000.0, s"cue $i of case $case_")
      }
      val v = Mp4.write(Seq(jpeg()), 8, 6, 1, subtitles = cues)
      assert(Mp4.readSubtitles(v) == cues, s"case $case_")
    }
  }
}
