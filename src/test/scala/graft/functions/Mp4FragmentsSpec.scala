package graft.functions

import java.nio.ByteBuffer
import org.scalatest.funsuite.AnyFunSuite

/** Fragmented MP4 (CMAF/DASH `moov(mvex) | (moof mdat)*`) demux — the
  * reference opens fragmented files transparently via pyav
  * (`functions/video/iterators.py:41`); here `writeFragmented` is the
  * fixture generator for the CMAF layout our own muxer emits, and
  * hand-assembled moofs cover the foreign layouts it doesn't (explicit
  * base_data_offset, trex-inherited defaults, offset-less second trun).
  */
class Mp4FragmentsSpec extends AnyFunSuite {

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

  private val colors =
    Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff, 0xff00ff, 0x808080)

  test("fragmented video round-trip matches the flat mux (all fragment sizes)") {
    val frames = colors.map(jpeg(16, 12, _))
    val flat = Mp4.write(frames, 16, 12, 10)
    for (fpf <- Seq(1, 2, 3, 7, 100)) {
      val frag = Mp4.writeFragmented(frames, 16, 12, 10, framesPerFragment = fpf)
      assert(Mp4.isMp4(frag))
      val m = Mp4.readMeta(frag)
      val mf = Mp4.readMeta(flat)
      assert(m.width == mf.width && m.height == mf.height)
      assert(m.fps == mf.fps && m.frames == mf.frames)
      assert(m.duration_s == mf.duration_s && m.codec == mf.codec)
      val back = Mp4.readFrames(frag)
      assert(back.length == frames.length)
      back.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }

  test("fragmented audio slices re-assemble sample-exact across fragments") {
    val frames = (0 until 10).map(i => jpeg(8, 8, colors(i % colors.length)))
    val samples = Array.tabulate(8000)(i => ((i * 13) % 5000 - 2500).toShort)
    for (fpf <- Seq(1, 3, 4, 10)) {
      val frag = Mp4.writeFragmented(frames, 8, 8, 5,
        audio = Some((samples, 4000)), framesPerFragment = fpf)
      val Some((back, rate)) = Mp4.readAudio(frag)
      assert(rate == 4000)
      assert(back.toSeq == samples.toSeq, s"fpf=$fpf")
      assert(Mp4.readFrames(frag).length == 10)
    }
  }

  test("sniffed Video surface accepts fragmented payloads end to end") {
    val frames = colors.take(4).map(jpeg(16, 12, _))
    val samples = Array.tabulate(1600)(i => (i % 300).toShort)
    val frag = Mp4.writeFragmented(frames, 16, 12, 4,
      audio = Some((samples, 1600)), framesPerFragment = 2)
    val m = Video.readMetaAny(frag)
    assert(m.frames == 4 && m.format == "MP4" && m.codec == "JPEG")
    assert(Video.readFramesAny(frag).length == 4)
    assert(Video.readAudioAny(frag).get._1.length == 1600)
  }

  // ------------------------------------------------ hand-built layouts

  private def u32(i: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(i.toInt).array()
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.empty[Byte])(_ ++ _)
    u32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
  }
  private def fullBox(typ: String, version: Int, flags: Int,
      payload: Array[Byte]*): Array[Byte] =
    box(typ, Array[Byte](version.toByte, ((flags >> 16) & 0xff).toByte,
      ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++
      payload.foldLeft(Array.empty[Byte])(_ ++ _))

  /** ftyp+moov init-segment prefix of a fragmented file (no fragments). */
  private def initSegment(frames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int): Array[Byte] = {
    val whole = Mp4.writeFragmented(frames, w, h, fps,
      framesPerFragment = frames.length)
    // moov ends where the first moof begins
    val s = new String(whole, "ISO-8859-1")
    val moofAt = s.indexOf("moof") - 4
    assert(moofAt > 0)
    whole.take(moofAt)
  }

  test("explicit base_data_offset + offset-less second trun resolve") {
    val frames = colors.take(4).map(jpeg(8, 8, _))
    val init = initSegment(frames, 8, 8, 2)

    // one moof with TWO truns: trun1 carries a data offset, trun2 none
    // (spec: continues at the cursor); tfhd uses an EXPLICIT 64-bit
    // base_data_offset (flag 0x01) instead of default-base-is-moof.
    val payload = frames.foldLeft(Array.empty[Byte])(_ ++ _)
    def moofAt(absBase: Long): Array[Byte] = {
      val tfhd = fullBox("tfhd", 0, 0x000019, // base-offset|def-dur|def-size
        u32(1), ByteBuffer.allocate(8).putLong(absBase).array(),
        u32(1), u32(0)) // default duration 1, size 0 (sizes in trun)
      val trun1 = fullBox("trun", 0, 0x201, // data-offset | sizes
        u32(2), u32(0), // offset 0 relative to the EXPLICIT base
        u32(frames(0).length.toLong), u32(frames(1).length.toLong))
      val trun2 = fullBox("trun", 0, 0x200, // sizes only: cursor continues
        u32(2),
        u32(frames(2).length.toLong), u32(frames(3).length.toLong))
      box("moof", fullBox("mfhd", 0, 0, u32(1)),
        box("traf", tfhd,
          fullBox("tfdt", 1, 0, ByteBuffer.allocate(8).putLong(0L).array()),
          trun1, trun2))
    }
    val probe = moofAt(0L)
    val base = init.length.toLong + probe.length + 8 // into the mdat payload
    val moof = moofAt(base)
    assert(moof.length == probe.length)
    val file = init ++ moof ++ box("mdat", payload)

    val back = Mp4.readFrames(file)
    assert(back.length == 4)
    back.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(Mp4.readMeta(file).frames == 4)
    assert(Mp4.readMeta(file).duration_s == 2.0) // 4 frames at 2 fps
  }

  test("trex-inherited default duration applies when tfhd omits it") {
    val frames = colors.take(2).map(jpeg(8, 8, _))
    val init0 = initSegment(frames, 8, 8, 4)
    // patch trex default_sample_duration 0 → 1 so tfhd can omit it
    val patched = init0.clone()
    val trexAt = new String(patched, "ISO-8859-1").indexOf("trex") + 4
    // payload: v/f(4) trackId(4) descIdx(4) defaultDuration(4) …
    ByteBuffer.wrap(patched, trexAt + 12, 4).putInt(1)
    val tfhd = fullBox("tfhd", 0, 0x020000, u32(1)) // base-is-moof only
    val trun = fullBox("trun", 0, 0x201,
      u32(2), u32(0), // placeholder offset, fixed below
      u32(frames(0).length.toLong), u32(frames(1).length.toLong))
    val moof0 = box("moof", fullBox("mfhd", 0, 0, u32(1)),
      box("traf", tfhd,
        fullBox("tfdt", 1, 0, ByteBuffer.allocate(8).putLong(0L).array()),
        trun))
    // rewrite the trun data offset (last 12 bytes are n,off,sz,sz → the
    // offset sits 12 bytes after the trun header start)
    val trunAt = new String(moof0, "ISO-8859-1").indexOf("trun") + 4
    ByteBuffer.wrap(moof0, trunAt + 8, 4).putInt(moof0.length + 8)
    val payload = frames.foldLeft(Array.empty[Byte])(_ ++ _)
    val file = patched ++ moof0 ++ box("mdat", payload)

    val t = Mp4.parseTracks(file).find(_.handler == "vide").get
    assert(t.nSamples == 2)
    assert(t.sampleDeltas.toSeq == Seq(1, 1)) // from trex, not tfhd
    val back = Mp4.readFrames(file)
    back.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("raw media segment without init segment fails with the informative error") {
    val frames = Seq(jpeg(8, 8, 0x123456))
    val whole = Mp4.writeFragmented(frames, 8, 8, 1, framesPerFragment = 1)
    val moofAt = new String(whole, "ISO-8859-1").indexOf("moof") - 4
    val segment = whole.drop(moofAt) // starts with the moof box
    assert(Mp4.isMp4(segment))
    val e = intercept[RuntimeException](Mp4.parseTracks(segment))
    assert(e.getMessage.contains("init segment"))
  }

  test("re-mux chain: flat → fragmented → flat is payload-identical") {
    val frames = colors.take(5).map(jpeg(16, 12, _))
    val samples = Array.tabulate(2000)(i => ((i * 31) % 999).toShort)
    val flat = Mp4.write(frames, 16, 12, 5, Some((samples, 2000)))
    val frag = Mp4.writeFragmented(Mp4.readFrames(flat), 16, 12, 5,
      Mp4.readAudio(flat), framesPerFragment = 2)
    val flat2 = Mp4.write(Mp4.readFrames(frag), 16, 12, 5,
      Mp4.readAudio(frag))
    assert(flat2.sameElements(flat))
  }
}
