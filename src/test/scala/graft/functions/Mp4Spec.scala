package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF mux→demux round-trips (reference media iterators run on MP4
  * via pyav — `functions/video/iterators.py:41-123`; here the muxer is
  * the fixture generator and the demuxer is under test, the same
  * write-then-read gating the AVI/FLAC/WAV codecs use).
  */
class Mp4Spec extends AnyFunSuite {

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb & 0xffffff)); g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("sniff: ftyp/moov/mdat-leading payloads are MP4, RIFF and JPEG are not") {
    val v = Mp4.write(Seq(jpeg(8, 6, 0xff0000)), 8, 6, 10)
    assert(Mp4.isMp4(v))
    assert(!Mp4.isMp4("RIFF....AVI LIST".getBytes))
    assert(!Mp4.isMp4(jpeg(4, 4, 0)))
    assert(!Mp4.isMp4(null))
    assert(!Mp4.isMp4(Array[Byte](1, 2, 3)))
  }

  test("video round-trip: meta (header-only) + bit-exact frame payloads") {
    val frames = Seq(jpeg(16, 12, 0xff0000), jpeg(16, 12, 0x00ff00),
      jpeg(16, 12, 0x0000ff))
    val v = Mp4.write(frames, 16, 12, 10)
    val m = Mp4.readMeta(v)
    assert(m.width == 16 && m.height == 12)
    assert(m.fps == 10.0 && m.frames == 3)
    assert(m.duration_s == 0.3 && m.codec == "JPEG" && m.format == "MP4")
    val back = Mp4.readFrames(v)
    assert(back.length == 3)
    back.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    // frames decode as the original solid colors
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(back(1)))
    val px = img.getRGB(8, 6)
    assert(((px >> 8) & 0xff) > 200 && (px & 0xff) < 60) // green frame
  }

  test("pcm audio round-trip: sowt track is sample-exact") {
    val samples = Array.tabulate(1600)(i => ((i * 7) % 2000 - 1000).toShort)
    val v = Mp4.write(Seq(jpeg(8, 8, 0x336699)), 8, 8, 5,
      audio = Some((samples, 16000)))
    val Some((back, rate)) = Mp4.readAudio(v)
    assert(rate == 16000)
    assert(back.toSeq == samples.toSeq)
    // audio does not disturb video
    assert(Mp4.readFrames(v).length == 1)
    assert(Mp4.readMeta(v).frames == 1)
  }

  test("audio-only mp4: metadata reports the sound track") {
    val samples = Array.fill[Short](8000)(123)
    val v = Mp4.write(Seq.empty, 0, 0, 0, audio = Some((samples, 8000)))
    val m = Mp4.readMeta(v)
    assert(m.width == 0 && m.height == 0)
    assert(m.duration_s == 1.0 && m.codec == "PCM")
    val Some((back, rate)) = Mp4.readAudio(v)
    assert(rate == 8000 && back.length == 8000 && back.forall(_ == 123))
  }

  test("mp3 track: elementary stream concatenates in sample order; readAudio passes") {
    val fakeFrames = Seq(Array.fill[Byte](104)(1), Array.fill[Byte](104)(2),
      Array.fill[Byte](105)(3))
    val v = Mp4.write(Seq.empty, 0, 0, 0,
      mp3 = Some((fakeFrames, 44100, 1152)))
    val tracks = Mp4.parseTracks(v)
    assert(tracks.length == 1 && tracks.head.codec == "mp3")
    assert(tracks.head.nSamples == 3)
    // media duration = frames × 1152 at 44100
    assert(math.abs(tracks.head.durationS - 3 * 1152.0 / 44100) < 1e-9)
    assert(Mp4.readAudio(v).isEmpty) // not pcm
    val Some((codec, es)) = Mp4.extractAudioStream(v)
    assert(codec == "mp3")
    assert(es.toSeq == fakeFrames.flatten.toSeq)
  }

  test("multi-track file: video + pcm + mp3 all resolve") {
    val samples = Array.tabulate(800)(i => (i % 100).toShort)
    val mp3Frames = Seq(Array.fill[Byte](96)(9))
    val v = Mp4.write(Seq(jpeg(8, 8, 0xffffff), jpeg(8, 8, 0)), 8, 8, 4,
      audio = Some((samples, 8000)), mp3 = Some((mp3Frames, 32000, 1152)))
    val ts = Mp4.parseTracks(v)
    assert(ts.map(_.handler) == Seq("vide", "soun", "soun"))
    assert(ts.map(_.codec) == Seq("jpeg", "pcm", "mp3"))
    assert(Mp4.readFrames(v).length == 2)
    assert(Mp4.readAudio(v).get._1.length == 800)
    assert(Mp4.extractAudioStream(v).get._2.length == 96)
  }

  test("non-jpeg video codec fails fast with the codec named") {
    // hand-build an avc1 entry by patching the muxed fourcc
    val v = Mp4.write(Seq(jpeg(8, 8, 0x112233)), 8, 8, 10)
    val s = new String(v, "ISO-8859-1")
    val at = s.indexOf("jpeg")
    assert(at > 0)
    val patched = v.clone()
    "avc1".getBytes.copyToArray(patched, at)
    assert(Mp4.readMeta(patched).codec == "H264")
    val e = intercept[IllegalArgumentException](Mp4.readFrames(patched))
    assert(e.getMessage.contains("h264"))
  }

  test("esds objectTypeIndication resolves mp4a/mp4v wrapper codecs") {
    // minimal esds: ES(0x03) → DecoderConfig(0x04) with OTI first
    def esds(oti: Int): Array[Byte] = {
      val dc = Array[Byte](0x04, 3, oti.toByte, 0x15, 0) // short body
      val es = Array[Byte](0x03, (3 + dc.length).toByte, 0, 1, 0) ++ dc
      val body = Array[Byte](0, 0, 0, 0) ++ es // FullBox v/f
      java.nio.ByteBuffer.allocate(8 + body.length)
        .putInt(8 + body.length).put("esds".getBytes).put(body).array()
    }
    // wrap in an mp4a sample entry inside a muxed file: patch .mp3 → mp4a
    // and splice esds after the 28-byte audio entry header
    val fake = Seq(Array.fill[Byte](10)(5))
    val v = Mp4.write(Seq.empty, 0, 0, 0, mp3 = Some((fake, 44100, 1152)))
    val s = new String(v, "ISO-8859-1")
    val entryAt = s.indexOf(".mp3") - 4 // box size field
    val entryLen = java.nio.ByteBuffer.wrap(v, entryAt, 4).getInt
    val ins = esds(0x40) // AAC
    val out = new java.io.ByteArrayOutputStream()
    out.write(v, 0, entryAt)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(entryLen + ins.length).array())
    out.write("mp4a".getBytes)
    out.write(v, entryAt + 8, entryLen - 8)
    out.write(ins)
    out.write(v, entryAt + entryLen, v.length - entryAt - entryLen)
    val patched = out.toByteArray
    // grow every enclosing box (stsd, stbl, minf, mdia, trak, moov)
    def grow(bytes: Array[Byte], typ: String): Unit = {
      val at = new String(bytes, "ISO-8859-1").indexOf(typ) - 4
      val old = java.nio.ByteBuffer.wrap(bytes, at, 4).getInt
      java.nio.ByteBuffer.wrap(bytes, at, 4).putInt(old + ins.length)
    }
    Seq("stsd", "stbl", "minf", "mdia", "trak", "moov").foreach(grow(patched, _))
    val t = Mp4.parseTracks(patched).head
    assert(t.codec == "aac")
    // stream extraction still works for the non-pcm track
    assert(Mp4.extractAudioStream(patched).get._1 == "aac")
  }
}
