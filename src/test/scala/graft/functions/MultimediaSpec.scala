package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Sniffed container metadata (reference `get_metadata` — the
  * ContainerMetadata/StreamMetadata shapes of `functions/util.py:40-110`)
  * across every readable container: MP4 (flat + fragmented + tagged),
  * AVI, WAV (pcm/mulaw/adpcm), FLAC, MP3.
  */
class MultimediaSpec extends AnyFunSuite {

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("mp4: video + audio streams, tags, bit rate") {
    val samples = Array.tabulate(4000)(i => (i % 50).toShort)
    val v = Mp4.write(Seq.fill(5)(jpeg(16, 12)), 16, 12, 10,
      audio = Some((samples, 8000)), tags = Seq("title" -> "T"))
    val m = Multimedia.containerMeta(v)
    assert(m.format == "MP4" && m.size == v.length)
    assert(m.metadata == Map("title" -> "T"))
    assert(m.streams.map(_.`type`) == Seq("video", "audio"))
    val vid = m.streams.head
    assert(vid.width.contains(16) && vid.height.contains(12))
    assert(vid.frames == 5 && vid.average_rate.contains(10.0))
    assert(vid.duration_seconds.contains(0.5))
    assert(vid.codec_context.name == "jpeg")
    val aud = m.streams(1)
    assert(aud.codec_context.channels.contains(1))
    assert(aud.codec_context.sample_rate.contains(8000))
    assert(aud.frames == 4000 && aud.duration_seconds.contains(0.5))
    assert(aud.time_base.contains(1.0 / 8000))
    // bit rate = bytes*8 / 0.5 s
    assert(m.bit_rate.contains(v.length * 8L * 2))
  }

  test("fragmented mp4 reports the same streams as its flat twin") {
    val frames = Seq.fill(6)(jpeg(8, 8))
    val flat = Multimedia.containerMeta(Mp4.write(frames, 8, 8, 3))
    val frag = Multimedia.containerMeta(
      Mp4.writeFragmented(frames, 8, 8, 3, framesPerFragment = 2))
    assert(frag.format == "MP4")
    assert(frag.streams.map(s => (s.`type`, s.frames, s.width, s.height,
      s.duration_seconds)) ==
      flat.streams.map(s => (s.`type`, s.frames, s.width, s.height,
        s.duration_seconds)))
  }

  test("avi: video + pcm audio streams") {
    val samples = Array.tabulate(1600)(i => (i % 9).toShort)
    val v = Avi.write(Seq.fill(4)(jpeg(16, 12)), 16, 12, 8,
      Some((samples, 3200)))
    val m = Multimedia.containerMeta(v)
    assert(m.format == "AVI")
    assert(m.streams.map(_.`type`) == Seq("video", "audio"))
    assert(m.streams.head.codec_context.name == "jpeg")
    assert(m.streams.head.frames == 4)
    assert(m.streams.head.average_rate.contains(8.0))
    assert(m.streams(1).frames == 1600)
    assert(m.streams(1).duration_seconds.contains(0.5))
  }

  test("wav flavors: pcm16, mulaw, adpcm frame counts") {
    val pcm = Audio.encodeWav(Array.tabulate(2400)(i => (i % 31).toShort), 2400f)
    val m1 = Multimedia.containerMeta(pcm)
    assert(m1.format == "WAV" && m1.streams.head.frames == 2400)
    assert(m1.streams.head.duration_seconds.contains(1.0))
    assert(m1.streams.head.codec_context.name == "pcm_s16le")

    val mu = AudioCodecs.writeWav(7, 1, 8000, 8, 1, 8000,
      Array.fill[Byte](8000)(0x55))
    val m2 = Multimedia.containerMeta(mu)
    assert(m2.streams.head.codec_context.name == "pcm_mulaw")
    assert(m2.streams.head.frames == 8000)
    assert(m2.streams.head.duration_seconds.contains(1.0))
  }

  test("flac: streaminfo fields surface") {
    val samples = Array.tabulate(4096)(i => ((i * 7) % 1000 - 500).toShort)
    val f = Flac.encode(samples, 1, 16000)
    val m = Multimedia.containerMeta(f)
    assert(m.format == "FLAC")
    val s = m.streams.head
    assert(s.frames == 4096 && s.duration.contains(4096L))
    assert(s.codec_context.sample_rate.contains(16000))
    assert(s.codec_context.channels.contains(1))
    assert(s.codec_context.name == "flac_s16")
    assert(s.duration_seconds.contains(4096.0 / 16000))
  }

  test("mp3: frame walk + id3 tags surface") {
    val tagged = Mp3.writeId3v2(Seq("artist" -> "Someone")) ++
      Mp3.writeTestStream(Seq(100, 100, 100))
    val m = Multimedia.containerMeta(tagged)
    assert(m.format == "MP3")
    assert(m.metadata == Map("artist" -> "Someone"))
    val s = m.streams.head
    assert(s.frames == 3 && s.duration.contains(3L * 1152))
    assert(s.codec_context.name == "mp3_l3")
    assert(s.codec_context.sample_rate.contains(44100))
  }

  test("unknown container fails fast") {
    val e = intercept[RuntimeException](
      Multimedia.containerMeta("not media at all!!".getBytes))
    assert(e.getMessage.contains("unrecognized media container"))
  }
}
