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

  test("corrupt inputs fail fast: truncations and bit flips never hang") {
    val rnd = new scala.util.Random(55511)
    def jpeg(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val samples = Array.tabulate(800)(i => (i % 90).toShort)
    val files = Seq(
      Mp4.write(Seq(jpeg(), jpeg()), 8, 6, 2, Some((samples, 800)),
        tags = Seq("title" -> "t"),
        subtitles = Seq((0.0, 0.5, "cue"))),
      Mp4.writeFragmented(Seq(jpeg(), jpeg(), jpeg()), 8, 6, 3,
        Some((samples, 800)), framesPerFragment = 2))
    def poke(f: => Any): Unit =
      try { f; () } catch { case _: Exception => () } // graceful error is fine
    files.foreach { v =>
      // truncate at 60 random byte lengths (incl. mid-box boundaries)
      for (_ <- 0 until 60) {
        val cut = rnd.nextInt(v.length)
        val t = v.take(cut)
        poke(Mp4.parseTracks(t)); poke(Mp4.readMeta(t))
        poke(Mp4.readFrames(t)); poke(Mp4.readAudio(t))
        poke(Mp4.readTags(t)); poke(Mp4.readSubtitles(t))
        poke(Mp4.segmentIndex(t))
      }
      // flip 60 random bytes in place
      for (_ <- 0 until 60) {
        val c = v.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        poke(Mp4.parseTracks(c)); poke(Mp4.readMeta(c))
        poke(Mp4.readFrames(c)); poke(Mp4.readAudio(c))
        poke(Mp4.readTags(c)); poke(Mp4.readSubtitles(c))
        poke(Mp4.segmentIndex(c))
      }
    }
    // subtitle parser on mangled documents
    val srt = Subtitles.formatSrt(Seq((0.0, 1.0, "a"), (2.0, 3.0, "b")))
    for (_ <- 0 until 120) {
      val chars = srt.toCharArray
      chars(rnd.nextInt(chars.length)) = (rnd.nextInt(94) + 33).toChar
      poke(Subtitles.parse(new String(chars)))
      poke(Subtitles.parse(new String(chars).take(rnd.nextInt(srt.length))))
    }
    // id3/ilst readers on mangled tag blocks
    val mp3 = Mp3.writeId3v2(Seq("title" -> "x", "artist" -> "y")) ++
      Mp3.writeTestStream(Seq(80))
    for (_ <- 0 until 60) {
      val c = mp3.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      poke(Mp3.readTags(c)); poke(Mp3.readMeta(c)); poke(Mp3.frames(c))
    }
    // EBML/Matroska walk on truncations and bit flips
    val mkv = Mkv.write(Seq(jpeg(), jpeg()), 8, 6, 2, Some((samples, 800)),
      subtitles = Seq((0.0, 0.5, "cue")), tags = Seq("title" -> "t"))
    for (_ <- 0 until 60) {
      val t = mkv.take(rnd.nextInt(mkv.length))
      poke(Mkv.parse(t)); poke(Mkv.readMeta(t)); poke(Mkv.readFrames(t))
      poke(Mkv.readAudio(t)); poke(Mkv.readTags(t))
      poke(Mkv.readSubtitles(t)); poke(Mkv.segmentCues(t))
      val c = mkv.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      poke(Mkv.parse(c)); poke(Mkv.readMeta(c)); poke(Mkv.readFrames(c))
      poke(Mkv.readAudio(c)); poke(Mkv.readTags(c))
      poke(Mkv.readSubtitles(c)); poke(Mkv.segmentCues(c))
    }
    // Ogg page walk on truncations and bit flips (CRC-protected pages:
    // flips must degrade to fewer pages/empty meta, never to throws
    // outside IllegalArgumentException or misallocation)
    for (codec <- Seq("opus", "vorbis")) {
      val ogg = Ogg.writeTestOgg(codec, 2, 16000, 3, 1600,
        tags = Seq("title" -> "t", "artist" -> "a"))
      for (_ <- 0 until 60) {
        val t = ogg.take(rnd.nextInt(ogg.length))
        poke(Ogg.pages(t)); poke(Ogg.readMeta(t)); poke(Ogg.readTags(t))
        poke(Ogg.extractPackets(t))
        val c = ogg.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        poke(Ogg.pages(c)); poke(Ogg.readMeta(c)); poke(Ogg.readTags(c))
        poke(Ogg.extractPackets(c))
      }
    }
    // HEIF/AVIF meta-box walk on truncations and bit flips
    for (fmt <- Seq("AVIF", "HEIF")) {
      val heif = Heif.writeTest(fmt, 12, 9, 2)
      for (_ <- 0 until 60) {
        val t = heif.take(rnd.nextInt(heif.length))
        poke(Heif.isHeif(t)); poke(Heif.readMeta(t))
        val c = heif.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        poke(Heif.isHeif(c)); poke(Heif.readMeta(c))
      }
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

  test("PDF renderer: truncations and bit flips fail fast, never hang") {
    // STRICTER than poke: only IllegalArgumentException may escape — the
    // renderer normalizes parse/interpret slips (index, number-format,
    // zip, match errors) and caps page rasters, image pixels, op count,
    // and recursion depth, so corrupt bytes can neither hang nor
    // misallocate.
    val rnd = new scala.util.Random(771188)
    val b = new Pdf.PdfBuilder
    val proc = b.addStream("",
      "1200 0 d0 0 0 1000 1000 re f"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val font = b.addObj(
      "<< /Type /Font /Subtype /Type3 /FontMatrix [0.001 0 0 0.001 0 0] " +
        s"/CharProcs << /box $proc 0 R >> " +
        "/Encoding << /Differences [65 /box] >> " +
        "/FirstChar 65 /LastChar 65 /Widths [1200] >>")
    val img = b.addStream(
      "/Type /XObject /Subtype /Image /Width 2 /Height 1 " +
        "/ColorSpace /DeviceRGB /BitsPerComponent 8",
      Array(0xff, 0, 0, 0, 0xff, 0).map(_.toByte))
    val form = b.addStream(
      "/Type /XObject /Subtype /Form /BBox [0 0 10 10]",
      "0 g 0 0 10 10 re f"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val cffStream = b.addStream("/Subtype /Type1C",
      Cff.write(Seq("A" -> Cff.charstring(Seq(0, 0, "rmoveto",
        100, "hlineto", 50, "vlineto", -100, "hlineto", "endchar"))),
        Seq(65)))
    val cffDesc = b.addObj("<< /Type /FontDescriptor /FontName /Fx " +
      s"/FontFile3 $cffStream 0 R >>")
    val cffFont = b.addObj(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Fx " +
        "/FirstChar 65 /LastChar 65 /Widths [1000] " +
        s"/FontDescriptor $cffDesc 0 R >>")
    val pat = b.addStream(
      "/PatternType 1 /PaintType 1 /TilingType 1 /BBox [0 0 10 10] " +
        "/XStep 10 /YStep 10 /Resources << >>",
      "0 g 0 0 4 4 re f"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val sfn = b.addStream(
      "/FunctionType 0 /Domain [0 1] /Range [0 1 0 1 0 1] " +
        "/Size [3] /BitsPerSample 8",
      Array(0xff, 0, 0, 0xff, 0, 0, 0, 0, 0xff).map(_.toByte))
    val shd = b.addObj(
      "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 80 0] " +
        s"/Function $sfn 0 R /Extend [true true] >>")
    b.addPage(
      "0.2 0.4 0.6 rg 10 20 30 15 re f 0 g BT /T3 10 Tf 5 5 Td (AA) Tj ET " +
        "BT /FC 40 Tf 5 80 Td (A) Tj ET " +
        "q 20 0 0 10 60 60 cm /I Do Q /F Do " +
        "q 0 0 8 100 re W n 0 0 1 rg 0 45 30 10 re f Q " +
        "/Pattern cs /PT scn 90 0 20 20 re f q 0 80 30 15 re W n /SH sh Q " +
        "BI /W 1 /H 1 /CS /G /BPC 8 ID   EI",
      (120, 100),
      s"/Font << /T3 $font 0 R /FC $cffFont 0 R >> " +
        s"/Pattern << /PT $pat 0 R >> /Shading << /SH $shd 0 R >> " +
        s"/XObject << /I $img 0 R /F $form 0 R >>")
    val doc = b.build()
    def poke(f: => Any): Unit =
      try { f; () } catch { case _: IllegalArgumentException => () }
    for (_ <- 0 until 120) {
      val t = doc.take(rnd.nextInt(doc.length))
      poke(PdfRender.renderPageImages(t))
      val c = doc.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      poke(PdfRender.renderPageImages(c))
    }
  }
}
