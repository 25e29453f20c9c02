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

  // ------------------------------------------------ tx3g + sidx

  private def u32(i: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(i.toInt).array()
  private def u16(i: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(2).putShort(i.toShort).array()
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.empty[Byte])(_ ++ _)
    u32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }
  private def fullBox(typ: String, version: Int, flags: Int,
      payload: Array[Byte]*): Array[Byte] =
    box(typ, Array[Byte](version.toByte, ((flags >> 16) & 0xff).toByte,
      ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++
      payload.foldLeft(Array.empty[Byte])(_ ++ _))

  test("tx3g (mov_text) samples parse: u16-length text, empty = gap") {
    // hand-build a text-only MP4: samples "Hi"(500ms) gap(250ms) "Bye"(750ms)
    val samples = Seq(("Hi", 500), ("", 250), ("Bye", 750))
    val payload = samples.flatMap { case (t, _) =>
      val b = t.getBytes("UTF-8"); u16(b.length) ++ b
    }.toArray
    val sizes = samples.map { case (t, _) => 2 + t.getBytes("UTF-8").length }
    val entry = box("tx3g", Array.fill[Byte](6)(0), u16(1))
    val stbl = box("stbl",
      fullBox("stsd", 0, 0, u32(1), entry),
      fullBox("stts", 0, 0, (u32(samples.length.toLong) +:
        samples.flatMap { case (_, d) => Seq(u32(1L), u32(d.toLong)) }): _*),
      fullBox("stsc", 0, 0, u32(1), u32(1), u32(samples.length.toLong), u32(1)),
      fullBox("stsz", 0, 0, (u32(0L) +: u32(samples.length.toLong) +:
        sizes.map(s => u32(s.toLong))): _*),
      fullBox("stco", 0, 0, u32(1), u32(0))) // chunk offset patched below
    val mdhd = fullBox("mdhd", 0, 0, u32(0), u32(0), u32(1000), u32(1500),
      u16(0x55c4), u16(0))
    val hdlr = fullBox("hdlr", 0, 0, u32(0), "text".getBytes,
      u32(0), u32(0), u32(0), Array[Byte](0))
    val tkhd = fullBox("tkhd", 0, 7, u32(0), u32(0), u32(1), u32(0), u32(1500),
      u32(0), u32(0), u16(0), u16(0), u16(0), u16(0),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L), u32(0), u32(0))
    val trak = box("trak", tkhd, box("mdia", mdhd, hdlr,
      box("minf", fullBox("nmhd", 0, 0), stbl)))
    val mvhd = fullBox("mvhd", 0, 0, u32(0), u32(0), u32(1000), u32(1500),
      u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L), Array.fill[Byte](24)(0), u32(2))
    val ftyp = box("ftyp", "isom".getBytes, u32(0x200L), "isom".getBytes)
    val mdat = box("mdat", payload)
    val moov = box("moov", mvhd, trak)
    val file = ftyp ++ mdat ++ moov
    // patch stco: mdat payload begins after ftyp + 8-byte mdat header
    val stcoAt = new String(file, "ISO-8859-1").lastIndexOf("stco") + 4
    java.nio.ByteBuffer.wrap(file, stcoAt + 8, 4).putInt(ftyp.length + 8)
    val tracks = Mp4.parseTracks(file)
    assert(tracks.head.codec == "mov_text")
    assert(Mp4.readSubtitles(file) == Seq((0.0, 0.5, "Hi"), (0.75, 1.5, "Bye")))
  }

  test("sidx: fragmented writer emits a correct byte-range segment index") {
    val frames = (0 until 7).map(_ => jpeg())
    val samples = Array.tabulate(2800)(i => (i % 70).toShort)
    val frag = Mp4.writeFragmented(frames, 8, 6, 2,
      audio = Some((samples, 800)), framesPerFragment = 3)
    val refs = Mp4.segmentIndex(frag)
    assert(refs.length == 3) // ceil(7/3)
    assert(refs.map(r => math.round(r.durationS * 2).toInt) == Seq(3, 3, 1))
    assert(refs.forall(_.startsWithSap))
    // byte ranges line up: walking refs from the end of the sidx box
    // lands exactly on each moof and consumes the whole file
    val s = new String(frag, "ISO-8859-1")
    val firstMoof = s.indexOf("moof") - 4
    var at = firstMoof.toLong
    refs.foreach { r =>
      assert(new String(frag, at.toInt + 4, 4, "ISO-8859-1") == "moof",
        s"segment boundary at $at")
      at += r.sizeBytes
    }
    assert(at == frag.length)
    // demux is unaffected by the index box
    assert(Mp4.readFrames(frag).length == 7)
    assert(Mp4.readAudio(frag).get._1.length == 2800)
    // flat files carry no sidx
    assert(Mp4.segmentIndex(Mp4.write(Seq(jpeg()), 8, 6, 1)).isEmpty)
  }

  test("clipMp4 keeps all streams: frames, audio slice, re-based cues") {
    val frames = (0 until 8).map(_ => jpeg())
    val samples = Array.tabulate(3200)(i => ((i * 11) % 901).toShort)
    val cues = Seq((0.0, 0.75, "early"), (1.0, 2.25, "middle"),
      (3.25, 3.75, "late"))
    val v = Mp4.write(frames, 8, 6, 2, Some((samples, 800)),
      subtitles = cues) // 4 s of video, 4 s of audio
    val c = Video.clipMp4Bytes(v, 1.0, 3.5)
    assert(Mp4.readFrames(c).length == 5) // frames 2..6 at 2 fps
    // frames are the original payloads, shifted
    assert(Mp4.readFrames(c).head.sameElements(frames(2)))
    val Some((a, rate)) = Mp4.readAudio(c)
    assert(rate == 800 && a.length == 2000) // samples 800..2800
    assert(a.head == samples(800) && a.last == samples(2799))
    // cues: "early" dropped, "middle" kept whole, "late" truncated; both
    // re-based by -1.0s
    assert(Mp4.readSubtitles(c) ==
      Seq((0.0, 1.25, "middle"), (2.25, 2.5, "late")))
    // degenerate range rejected
    val e = intercept[IllegalArgumentException](Video.clipMp4Bytes(v, 2.0, 2.0))
    assert(e.getMessage.contains("empty clip"))
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
