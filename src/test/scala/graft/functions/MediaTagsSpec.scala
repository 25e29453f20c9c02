package graft.functions

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite

/** Media tag extraction — MP4 `udta/meta/ilst` atoms and MP3 ID3v2/v1
  * (the tag dict the reference surfaces via ffprobe format metadata in
  * `get_metadata`; both writers here are fixture generators for the
  * readers under test).
  */
class MediaTagsSpec extends AnyFunSuite {

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("mp4 ilst round-trip: text atoms, unicode, track pair") {
    val tags = Seq("title" -> "Naïve Song — übertest", "artist" -> "A B",
      "album" -> "Col",  "date" -> "2021-03-04", "genre" -> "spoken",
      "comment" -> "c", "encoder" -> "graft", "track" -> "3/12")
    val v = Mp4.write(Seq(jpeg(8, 6)), 8, 6, 10, tags = tags)
    assert(Mp4.readTags(v).toMap == tags.toMap)
    // tags don't disturb demux
    assert(Mp4.readMeta(v).frames == 1)
    assert(Mp4.readFrames(v).length == 1)
    // track without total renders bare
    val v2 = Mp4.write(Seq(jpeg(8, 6)), 8, 6, 10, tags = Seq("track" -> "7"))
    assert(Mp4.readTags(v2) == Seq("track" -> "7"))
    // no tags → empty
    assert(Mp4.readTags(Mp4.write(Seq(jpeg(8, 6)), 8, 6, 10)).isEmpty)
    assert(intercept[RuntimeException](
      Mp4.write(Seq(jpeg(8, 6)), 8, 6, 10, tags = Seq("bogus" -> "x")))
      .getMessage.contains("unknown tag"))
  }

  test("id3v2.3 round-trip over a real frame stream") {
    val tags = Seq("title" -> "Tïtle", "artist" -> "Ärtist",
      "album" -> "Al", "date" -> "1999", "genre" -> "g",
      "track" -> "5", "encoder" -> "graft", "TCOM" -> "composer")
    val stream = Mp3.writeTestStream(Seq(100, 100))
    val tagged = Mp3.writeId3v2(tags) ++ stream
    assert(Mp3.isMp3(tagged))
    assert(Mp3.readTags(tagged).toMap == tags.toMap)
    // frames still parse past the tag
    assert(Mp3.frames(tagged).length == 2)
    // no tag and no trailer → empty
    assert(Mp3.readTags(stream).isEmpty)
  }

  test("id3v2.4 syncsafe frame sizes parse (sizes < 128 are shared encoding)") {
    val tagged = Mp3.writeId3v2(Seq("title" -> "t4", "artist" -> "a4")) ++
      Mp3.writeTestStream(Seq(90))
    tagged(3) = 4 // major version 2.3 → 2.4: same bytes, syncsafe reader
    assert(Mp3.readTags(tagged).toMap ==
      Map("title" -> "t4", "artist" -> "a4"))
  }

  test("id3v2.4 extended header size is syncsafe (>=128 bytes)") {
    // v2.4 stores the ext-header size syncsafe and self-inclusive; a
    // 160-byte ext header is (0,0,1,32) syncsafe but 288 read plain —
    // the plain read would start the frame loop mid-header
    def frame4(id: String, text: String): Array[Byte] = {
      val body = Array[Byte](0) ++ text.getBytes("ISO-8859-1")
      id.getBytes("US-ASCII") ++
        Array[Byte](0, 0, ((body.length >> 7) & 0x7f).toByte,
          (body.length & 0x7f).toByte) ++ Array[Byte](0, 0) ++ body
    }
    val ehLen = 160
    val eh = new Array[Byte](ehLen)
    eh(0) = 0; eh(1) = 0; eh(2) = ((ehLen >> 7) & 0x7f).toByte
    eh(3) = (ehLen & 0x7f).toByte
    eh(4) = 1 // one flag byte
    val frames = frame4("TIT2", "ext-ok")
    val body = eh ++ frames
    val out = new ByteArrayOutputStream()
    out.write("ID3".getBytes); out.write(4); out.write(0); out.write(0x40)
    out.write((body.length >> 21) & 0x7f); out.write((body.length >> 14) & 0x7f)
    out.write((body.length >> 7) & 0x7f); out.write(body.length & 0x7f)
    out.write(body)
    val tagged = out.toByteArray ++ Mp3.writeTestStream(Seq(80))
    assert(Mp3.readTags(tagged).toMap == Map("title" -> "ext-ok"))
  }

  test("id3v2.2 three-char frames parse") {
    // hand-build: TT2 (title) + TP1 (artist), ISO-8859-1 encoding byte 0
    def frame22(id: String, text: String): Array[Byte] = {
      val body = Array[Byte](0) ++ text.getBytes("ISO-8859-1")
      id.getBytes("US-ASCII") ++
        Array[Byte](0, (body.length >> 8).toByte, (body.length & 0xff).toByte) ++
        body
    }
    val frames = frame22("TT2", "two-two") ++ frame22("TP1", "someone")
    val out = new ByteArrayOutputStream()
    out.write("ID3".getBytes); out.write(2); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write((frames.length >> 7) & 0x7f)
    out.write(frames.length & 0x7f)
    out.write(frames)
    val tagged = out.toByteArray ++ Mp3.writeTestStream(Seq(80))
    assert(Mp3.readTags(tagged).toMap ==
      Map("title" -> "two-two", "artist" -> "someone"))
  }

  test("unsynchronized tag body is de-stuffed before frame parse") {
    // craft a title whose UTF-8 bytes contain 0xFF via a raw frame
    val inner = new ByteArrayOutputStream()
    inner.write("TIT2".getBytes)
    val text = Array[Byte](0, 'a', 0xff.toByte, 0xe0.toByte, 'b') // enc=ISO
    inner.write(0); inner.write(0); inner.write(0); inner.write(text.length)
    inner.write(0); inner.write(0)
    inner.write(text)
    val raw = inner.toByteArray
    // apply unsynchronization: FF → FF 00
    val stuffed = new ByteArrayOutputStream()
    raw.foreach { b =>
      stuffed.write(b)
      if ((b & 0xff) == 0xff) stuffed.write(0)
    }
    val body = stuffed.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("ID3".getBytes); out.write(3); out.write(0); out.write(0x80)
    out.write(0); out.write(0); out.write((body.length >> 7) & 0x7f)
    out.write(body.length & 0x7f)
    out.write(body)
    val tags = Mp3.readTags(out.toByteArray)
    assert(tags.toMap.get("title").contains("aÿàb"))
  }

  test("utf-16 text frames decode via their BOM") {
    val inner = new ByteArrayOutputStream()
    inner.write("TIT2".getBytes)
    val text = Array[Byte](1) ++ ("\uFEFF" + "wide").getBytes("UTF-16BE")
    inner.write(0); inner.write(0); inner.write(0); inner.write(text.length)
    inner.write(0); inner.write(0)
    inner.write(text)
    val body = inner.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("ID3".getBytes); out.write(3); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write((body.length >> 7) & 0x7f)
    out.write(body.length & 0x7f)
    out.write(body)
    assert(Mp3.readTags(out.toByteArray).toMap == Map("title" -> "wide"))
  }

  test("id3v1 trailer fallback when no v2 tag exists") {
    val stream = Mp3.writeTestStream(Seq(70, 70))
    val v1 = new Array[Byte](128)
    "TAG".getBytes.copyToArray(v1, 0)
    "Old Title".getBytes.copyToArray(v1, 3)
    "Old Artist".getBytes.copyToArray(v1, 33)
    "Old Album".getBytes.copyToArray(v1, 63)
    "1987".getBytes.copyToArray(v1, 93)
    val tagged = stream ++ v1
    assert(Mp3.readTags(tagged).toMap == Map("title" -> "Old Title",
      "artist" -> "Old Artist", "album" -> "Old Album", "date" -> "1987"))
    // v2 takes precedence when present
    val both = Mp3.writeId3v2(Seq("title" -> "New")) ++ tagged
    assert(Mp3.readTags(both).toMap == Map("title" -> "New"))
  }

  test("subtitle documents flow through the content-sniffed dispatch") {
    val srt = Subtitles.formatSrt(Seq((0.0, 1.0, "<i>Hello</i> there"),
      (1.5, 2.0, "- Bye.")))
    assert(Office.documentToText(srt.getBytes("UTF-8")) ==
      "Hello there\nBye.")
    val vtt = Subtitles.formatVtt(Seq((0.0, 1.0, "v t t")))
    assert(Office.documentToText(vtt.getBytes("UTF-8")) == "v t t")
    // near-miss plain text stays plain: number line + non-clock line
    val plain = "1\nnot a timestamp\nmore text"
    assert(Office.documentToText(plain.getBytes("UTF-8")) == plain)
  }
}
