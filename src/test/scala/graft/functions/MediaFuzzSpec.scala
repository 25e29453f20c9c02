package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz over the round-11 surfaces (the OfficeFuzz/FLAC-fuzz
  * pattern): random cue lists round-trip through SRT/VTT format→parse,
  * random tag sets round-trip through ID3v2 and MP4 ilst writers, and
  * random fragment shapes round-trip the fragmented muxer — seeded, so
  * failures replay.
  */
class MediaFuzzSpec extends AnyFunSuite {

  test("300 random cue lists round-trip srt and vtt exactly") {
    val rnd = new scala.util.Random(20260815)
    for (case_ <- 0 until 300) {
      val n = rnd.nextInt(12) + 1
      var t = rnd.nextInt(1000) / 4.0 // quarter-second grid: exact ms
      val cues = (0 until n).map { _ =>
        val start = t
        val end = start + (rnd.nextInt(1000) + 1) * 0.004 // 4 ms grid
        t = end + rnd.nextInt(2000) / 1000.0
        // cue text: printable, no blank lines, maybe multi-line/markup
        val lines = (0 to rnd.nextInt(2)).map { _ =>
          val words = (0 to rnd.nextInt(4)).map(_ =>
            Seq("hey", "<i>it</i>", "Ünïcødé", "one,two", "x -> y",
              "{\\an8}top", "99:99", "a|b")(rnd.nextInt(8)))
          words.mkString(" ")
        }
        (start, end, lines.mkString("\n"))
      }
      for ((doc, kind) <- Seq((Subtitles.formatSrt(cues), "srt"),
          (Subtitles.formatVtt(cues), "vtt"))) {
        val back = Subtitles.parse(doc)
        assert(back.length == n, s"case $case_ $kind: ${back.length} != $n")
        back.zip(cues).zipWithIndex.foreach { case ((c, (s0, e0, txt)), i) =>
          assert(math.abs(c.start - s0) < 5e-4 &&
            math.abs(c.end - e0) < 5e-4,
            s"case $case_ $kind cue $i clock drift")
          assert(c.text == txt, s"case $case_ $kind cue $i text")
        }
      }
    }
  }

  test("300 random tag sets round-trip id3v2 and mp4 ilst") {
    val rnd = new scala.util.Random(41118)
    val names = Seq("title", "artist", "album", "date", "genre", "encoder")
    val alphabet = "aA1 ,.!?-éß€中ÿ"
    def randText(): String = {
      val n = rnd.nextInt(40) + 1
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        .trim match { case "" => "x"; case s => s }
    }
    val jpeg = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    for (case_ <- 0 until 300) {
      val tags = rnd.shuffle(names).take(rnd.nextInt(names.length) + 1)
        .map(n => n -> randText())
      val mp3 = Mp3.writeId3v2(tags) ++ Mp3.writeTestStream(Seq(90))
      assert(Mp3.readTags(mp3).toMap == tags.toMap, s"case $case_ id3")
      val mp4 = Mp4.write(Seq(jpeg), 4, 4, 5, tags = tags)
      assert(Mp4.readTags(mp4).toMap == tags.toMap, s"case $case_ ilst")
      assert(Mp4.readFrames(mp4).length == 1, s"case $case_ demux intact")
    }
  }

  test("100 random fragment shapes round-trip payloads and audio") {
    val rnd = new scala.util.Random(9917)
    def jpeg(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(seed * 2654435761L.toInt & 0xffffff))
      g.fillRect(0, 0, 8, 6); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    for (case_ <- 0 until 100) {
      val nFrames = rnd.nextInt(12) + 1
      val fpf = rnd.nextInt(6) + 1
      val fps = rnd.nextInt(20) + 1
      val frames = (0 until nFrames).map(jpeg)
      val audio = if (rnd.nextBoolean()) {
        val rate = Seq(1000, 4000, 8000)(rnd.nextInt(3))
        Some((Array.tabulate(rnd.nextInt(4000) + 1)(i =>
          ((i * 37) % 5000 - 2500).toShort), rate))
      } else None
      val frag = Mp4.writeFragmented(frames, 8, 6, fps, audio, fpf)
      val back = Mp4.readFrames(frag)
      assert(back.length == nFrames, s"case $case_ frame count")
      back.zip(frames).foreach { case (a, b) =>
        assert(a.sameElements(b), s"case $case_ frame bytes")
      }
      audio.foreach { case (samples, rate) =>
        val Some((got, gotRate)) = Mp4.readAudio(frag)
        assert(gotRate == rate && got.toSeq == samples.toSeq,
          s"case $case_ audio")
      }
      val meta = Mp4.readMeta(frag)
      assert(meta.frames == nFrames && meta.fps == fps.toDouble,
        s"case $case_ meta")
    }
  }
}
