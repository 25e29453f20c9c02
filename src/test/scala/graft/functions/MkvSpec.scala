package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Matroska/WebM (EBML) demux + mux — the crawl-major container the
  * reference opens via pyav (`functions/video/iterators.py:41-123`).
  * Round-trips ride the graft muxer; lacing/corrupt paths are
  * hand-built byte streams.
  */
class MkvSpec extends AnyFunSuite {

  private def jpeg(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 12).foreach(y => (0 until 16).foreach(x =>
      img.setRGB(x, y, seed * 7919 + x * 31 + y)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("video+audio+subtitles+tags round-trip through the muxer") {
    val frames = (0 until 5).map(jpeg)
    val samples = Array.tabulate(4000)(i => (i % 100).toShort)
    val cues = Seq((0.0, 0.5, "first"), (0.5, 1.2, "second - unicode é"),
      (2.0, 2.5, "third"))
    val tags = Seq("title" -> "T", "artist" -> "A", "CUSTOM_TAG" -> "x")
    val mkv = Mkv.write(frames, 16, 12, 10, Some((samples, 8000)),
      subtitles = cues, tags = tags)

    assert(Mkv.isMkv(mkv) && !Mp4.isMp4(mkv))
    val m = Mkv.readMeta(mkv)
    assert(m.width == 16 && m.height == 12 && m.codec == "JPEG" &&
      m.format == "MKV" && m.frames == 5)
    assert(math.abs(m.fps - 10.0) < 1e-9)
    assert(math.abs(m.duration_s - 0.5) < 1e-3) // video-track duration

    // bit-exact frame payloads
    val back = Mkv.readFrames(mkv)
    assert(back.length == 5 &&
      back.zip(frames).forall(p => p._1.sameElements(p._2)))

    // sample-exact PCM across ~100ms block boundaries
    val Some((pcm, rate)) = Mkv.readAudio(mkv)
    assert(rate == 8000 && pcm.sameElements(samples))

    // subtitle cues on the ms grid
    assert(Mkv.readSubtitles(mkv) == cues)

    // tags: standard names mapped, custom passed through
    assert(Mkv.readTags(mkv).toMap ==
      Map("title" -> "T", "artist" -> "A", "CUSTOM_TAG" -> "x"))
  }

  test("webm doctype, cues index clusters, track typing") {
    val frames = (0 until 25).map(jpeg) // 12.5 s at 2 fps -> 2 clusters
    val mkv = Mkv.write(frames, 16, 12, 2, docType = "webm")
    assert(Mkv.readMeta(mkv).format == "WEBM")
    val cues = Mkv.segmentCues(mkv)
    assert(cues.length == 2) // one CuePoint per <=10 s cluster
    assert(cues.head._1 == 0.0 && math.abs(cues(1)._1 - 10.0) < 1e-9)
    val f = Mkv.parse(mkv)
    assert(f.docType == "webm")
    assert(f.tracks.map(_.kind) == Seq("video"))
    assert(f.tracks.head.codecId == "V_MJPEG")
  }

  test("audio-only file: meta reports audio, no geometry") {
    val samples = Array.tabulate(1600)(i => (i * 3 % 200).toShort)
    val mkv = Mkv.write(Seq.empty, 0, 0, 0, Some((samples, 16000)))
    val m = Mkv.readMeta(mkv)
    assert(m.width == 0 && m.codec == "PCM" && m.format == "MKV")
    assert(math.abs(m.duration_s - 0.1) < 1e-3)
    assert(Mkv.readAudio(mkv).get._1.sameElements(samples))
    assert(Mkv.extractAudioStream(mkv).isEmpty) // pcm is not a hand-off
  }

  test("compressed codec ids name correctly; decode fails fast") {
    // in-place equal-length codec-id swap (EBML sizes are explicit):
    // V_MJPEG (7 bytes) -> V_MPEG4 is not jpeg and must fail fast
    val mkv = Mkv.write(Seq(jpeg(1)), 16, 12, 1)
    assert(Mkv.readFrames(mkv).length == 1)
    val patched = new String(mkv, "ISO-8859-1")
      .replace("V_MJPEG", "V_MPEG4").getBytes("ISO-8859-1")
    val e = intercept[Exception](Mkv.readFrames(patched))
    assert(e.getMessage.contains("unsupported video decode codec"))
  }

  test("hand-built lacing: Xiph, fixed, and EBML lace to the same frames") {
    // Three frames on track 2, reassembled from each lacing mode.
    val f1 = Array[Byte](1, 2, 3, 4)
    val f2 = Array[Byte](5, 6, 7, 8, 9, 10, 11)
    val f3 = Array[Byte](12, 13, 14, 15, 16)
    // Xiph (flags 0x02): nFrames-1, then 255-stuffed sizes
    val xiph = Array[Byte](0x82.toByte, 0, 0, 0x02, 2, 4, 7) ++ f1 ++ f2 ++ f3
    // EBML (flags 0x06): first size plain vint, then signed-vint deltas
    // (+3 as 1-byte signed vint: 3 + 63 = 66, with marker -> 0xC2)
    val ebml = Array[Byte](0x82.toByte, 0, 0, 0x06, 2,
      0x84.toByte, (0x80 | 66).toByte) ++ f1 ++ f2 ++ f3
    // fixed (flags 0x04): equal split
    val g2 = Array[Byte](21, 22, 23, 24)
    val g3 = Array[Byte](25, 26, 27, 28)
    val fixed = Array[Byte](0x82.toByte, 0, 0, 0x04, 2) ++ f1 ++ g2 ++ g3

    // Base file via the muxer (audio track number 2), then cut at the
    // first Cluster and splice a hand-built cluster; the Segment size is
    // rewritten to unknown so the parse runs to EOF.
    val base = Mkv.write(Seq.empty, 0, 0, 0,
      Some((Array.tabulate(8)(_.toShort), 16000)))
    def indexOfBytes(hay: Array[Byte], needle: Array[Int]): Int = {
      var i = 0
      while (i + needle.length <= hay.length) {
        var j = 0
        while (j < needle.length && (hay(i + j) & 0xff) == needle(j)) j += 1
        if (j == needle.length) return i
        i += 1
      }
      -1
    }
    val clusterAt = indexOfBytes(base, Array(0x1F, 0x43, 0xB6, 0x75))
    assert(clusterAt > 0)
    val head = java.util.Arrays.copyOfRange(base, 0, clusterAt)

    def fileWith(payload: Array[Byte]): Array[Byte] = {
      val ts = Array[Byte](0xE7.toByte, 0x81.toByte, 0)
      val sb = Array[Byte](0xA3.toByte,
        (0x80 | payload.length).toByte) ++ payload
      val body = ts ++ sb
      val cluster = Array[Byte](0x1F, 0x43, 0xB6.toByte, 0x75,
        (0x80 | body.length).toByte) ++ body
      val segIdx = indexOfBytes(head, Array(0x18, 0x53, 0x80, 0x67))
      assert(segIdx > 0)
      val segSizeAt = segIdx + 4
      val b0 = head(segSizeAt) & 0xff
      var mask = 0x80
      var sizeLen = 1
      while ((b0 & mask) == 0) { mask >>= 1; sizeLen += 1 }
      val unknown = Array.tabulate(sizeLen)(i =>
        if (i == 0) ((0x80 >> (sizeLen - 1)) | (0xff >> sizeLen)).toByte
        else 0xff.toByte)
      val patched = head.clone()
      System.arraycopy(unknown, 0, patched, segSizeAt, sizeLen)
      patched ++ cluster
    }

    def audioBlocks(b: Array[Byte]): Seq[Seq[Byte]] = {
      val t = Mkv.parse(b).tracks.find(_.trackType == 2).get
      (0 until t.nBlocks).map(i => java.util.Arrays.copyOfRange(
        b, t.blockOffsets(i), t.blockOffsets(i) + t.blockSizes(i)).toSeq)
    }

    assert(audioBlocks(fileWith(xiph)) == Seq(f1.toSeq, f2.toSeq, f3.toSeq))
    assert(audioBlocks(fileWith(ebml)) == Seq(f1.toSeq, f2.toSeq, f3.toSeq))
    assert(audioBlocks(fileWith(fixed)) == Seq(f1.toSeq, g2.toSeq, g3.toSeq))
  }

  test("corrupt inputs fail fast: truncation and bit flips never hang") {
    val frames = (0 until 3).map(jpeg)
    val mkv = Mkv.write(frames, 16, 12, 5,
      Some((Array.tabulate(800)(_.toShort), 8000)),
      subtitles = Seq((0.0, 0.4, "x")), tags = Seq("title" -> "t"))
    val rnd = new scala.util.Random(42)
    (0 until 150).foreach { k =>
      val b =
        if (k % 3 == 0)
          java.util.Arrays.copyOfRange(mkv, 0, rnd.nextInt(mkv.length))
        else {
          val c = mkv.clone()
          c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
          c
        }
      // must terminate quickly with either a clean parse or an exception
      try {
        val f = Mkv.parse(b)
        f.tracks.foreach(t => assert(t.nBlocks <= 1000000))
        try Mkv.readFrames(b).foreach(x => assert(x.length <= mkv.length))
        catch { case _: Exception => () }
        try Mkv.readSubtitles(b)
        catch { case _: Exception => () }
      } catch { case _: Exception => () }
    }
  }

  test("vorbisPackets: corrupt Xiph lacing returns None, never throws") {
    val hdrs = Seq(Array.fill(30)(1.toByte), Array.fill(8)(3.toByte),
      Array.fill(60)(5.toByte))
    val webm = Mkv.writeVorbis(hdrs, Seq(Array.fill(12)(9.toByte)),
      8000, 1, 128)
    assert(Mkv.vorbisPackets(webm).exists(_.length == 4))
    // CodecPrivate data = [count 2, lace 30, lace 8, headers...] —
    // corrupt the laced LENGTH bytes so the walk runs past the end:
    // every mutation must yield None or a valid packet list, no IAE
    // from the trailing copyOfRange (the EBML structure is untouched)
    val at = webm.indexOfSlice(Array[Byte](2, 30, 8))
    assert(at > 0)
    val rnd = new scala.util.Random(7)
    (0 until 120).foreach { _ =>
      val m = webm.clone()
      m(at + rnd.nextInt(3)) = rnd.nextInt(256).toByte
      try Mkv.vorbisPackets(m).foreach(p => assert(p.length >= 3))
      catch { case _: Exception => fail("vorbisPackets threw") }
    }
  }
}
