package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Ogg page framing (RFC 3533) + AVIF/HEIF meta-tree metadata — the
  * `get_metadata` families the reference opens via pyav/PIL
  * (`functions/util.py:40-110`).
  */
class OggHeifSpec extends AnyFunSuite {

  test("opus fixture: identity, preskip-corrected duration, page walk") {
    val ogg = Ogg.writeTestOgg("opus", 2, 48000, 5, 960, preSkip = 312)
    assert(Ogg.isOgg(ogg) && !Mkv.isMkv(ogg) && !Mp4.isMp4(ogg))
    val m = Ogg.readMeta(ogg)
    assert(m.codec == "opus" && m.channels == 2 && m.sampleRate == 48000)
    assert(m.totalSamples == 5 * 960) // last granule minus preskip
    assert(math.abs(m.durationS - 5 * 960 / 48000.0) < 1e-12)
    assert(m.nPages == 7) // BOS + comment header + 5 audio pages
    // EOS flag only on the last page
    val ps = Ogg.pages(ogg)
    assert(ps.count(p => (p.headerType & 0x04) != 0) == 1 &&
      (ps.last.headerType & 0x04) != 0)
    // packet hand-off skips the header page
    val (codec, stream) = Ogg.extractPackets(ogg)
    assert(codec == "opus" && stream.nonEmpty)
  }

  test("vorbis fixture: rate-based duration") {
    val ogg = Ogg.writeTestOgg("vorbis", 1, 16000, 3, 1600)
    val m = Ogg.readMeta(ogg)
    assert(m.codec == "vorbis" && m.channels == 1 && m.sampleRate == 16000)
    assert(m.totalSamples == 4800)
    assert(math.abs(m.durationS - 0.3) < 1e-12)
  }

  test("avif/heif meta tree: brand, codec, geometry, item count") {
    val avif = Heif.writeTest("AVIF", 320, 200, 3)
    assert(Heif.isHeif(avif))
    // HEIF sniff must win over the generic ftyp-based MP4 sniff
    assert(Mp4.isMp4(avif), "ftyp starts like an MP4 — order matters")
    val m = Heif.readMeta(avif)
    assert(m.format == "AVIF" && m.codec == "av1")
    assert(m.width == 320 && m.height == 200 && m.items == 3)
    assert(m.primaryItem == 1)

    val heic = Heif.readMeta(Heif.writeTest("HEIF", 64, 48, 1))
    assert(heic.format == "HEIF" && heic.codec == "hevc" &&
      heic.width == 64 && heic.items == 1)

    // real MP4s must NOT sniff as HEIF
    val jpeg = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    assert(!Heif.isHeif(Mp4.write(Seq(jpeg), 8, 6, 1)))
  }

  test("containerMetadata dispatch covers ogg and heif") {
    val om = Multimedia.containerMeta(Ogg.writeTestOgg("opus", 1, 24000, 2, 960))
    assert(om.format == "OGG" && om.streams.head.codec_context.name == "opus")
    assert(om.streams.head.codec_context.sample_rate.contains(24000))
    val im = Multimedia.containerMeta(Heif.writeTest("HEIF", 30, 20, 2))
    assert(im.format == "HEIF" && im.streams.head.width.contains(30))
    assert(im.streams.head.codec_context.name == "hevc")
  }

  test("vorbis-comment tags: ogg comment header + flac splice round-trip") {
    // Ogg: OpusTags and vorbis comment headers through the sniffed reader
    val opus = Ogg.writeTestOgg("opus", 1, 48000, 2, 960,
      tags = Seq("title" -> "Tïtle", "artist" -> "A", "CUSTOM" -> "x"))
    assert(Ogg.readTags(opus).toMap ==
      Map("title" -> "Tïtle", "artist" -> "A", "CUSTOM" -> "x"))
    val vorb = Ogg.writeTestOgg("vorbis", 2, 16000, 2, 800,
      tags = Seq("album" -> "Al", "track" -> "7"))
    assert(Ogg.readTags(vorb).toMap == Map("album" -> "Al", "track" -> "7"))
    // tagless stream still parses clean
    assert(Ogg.readTags(Ogg.writeTestOgg("opus", 1, 48000, 1, 960)).isEmpty)
    // metadata dict carries them
    assert(Multimedia.containerMeta(opus).metadata("title") == "Tïtle")

    // FLAC: withTags splices a VORBIS_COMMENT block; the stream still
    // decodes bit-exact and STREAMINFO-based metadata is unchanged
    val samples = Array.tabulate(1200)(i => ((i * 7) % 300 - 150).toShort)
    val flac = Flac.encode(samples, 1, 8000)
    val tagged = Flac.withTags(flac, Seq("title" -> "FT", "genre" -> "g"))
    assert(Flac.readTags(tagged).toMap == Map("title" -> "FT", "genre" -> "g"))
    assert(Flac.readTags(flac).isEmpty)
    val dec = Flac.decode(tagged)
    assert(dec.md5Ok && dec.samples.map(_.toShort).sameElements(samples))
    assert(Multimedia.containerMeta(tagged).metadata("title") == "FT")
    assert(Multimedia.containerMeta(tagged).streams.head
      .codec_context.sample_rate.contains(8000))
  }

  test("corrupt inputs fail fast: truncations and bit flips never hang") {
    val rnd = new scala.util.Random(77)
    val ogg = Ogg.writeTestOgg("opus", 2, 48000, 4, 960, preSkip = 100)
    val heif = Heif.writeTest("AVIF", 100, 80, 2)
    def poke(f: => Any): Unit =
      try { f; () } catch { case _: Exception => () }
    (0 until 80).foreach { _ =>
      val t1 = ogg.take(rnd.nextInt(ogg.length))
      poke(Ogg.pages(t1)); poke(Ogg.readMeta(t1)); poke(Ogg.extractPackets(t1)); poke(Ogg.readTags(t1))
      val c1 = ogg.clone(); c1(rnd.nextInt(c1.length)) = rnd.nextInt(256).toByte
      poke(Ogg.pages(c1)); poke(Ogg.readMeta(c1)); poke(Ogg.extractPackets(c1)); poke(Ogg.readTags(c1))
      val t2 = heif.take(rnd.nextInt(heif.length))
      poke(Heif.isHeif(t2)); poke(Heif.readMeta(t2))
      val c2 = heif.clone(); c2(rnd.nextInt(c2.length)) = rnd.nextInt(256).toByte
      poke(Heif.isHeif(c2)); poke(Heif.readMeta(c2))
    }
  }
}
