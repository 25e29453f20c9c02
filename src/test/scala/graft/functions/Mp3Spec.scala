package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** MPEG audio framing (reference reads MP3 via pyav — `functions/
  * audio.py`): header grammar, frame walk, ID3 skip, Xing detection,
  * metadata closed forms, and the side-info loudness profile.
  */
class Mp3Spec extends AnyFunSuite {

  test("fixture frames parse back: count, bitrate, rate, duration closed forms") {
    // bitrateIdx 9 = 128 kbps @ 44100 → frame length 417 bytes, 1152 spf
    val s = Mp3.writeTestStream(Seq.fill(10)(100))
    val fs = Mp3.frames(s)
    assert(fs.length == 10)
    assert(fs.forall(f => f.bitrateKbps == 128 && f.sampleRate == 44100 &&
      f.samplesPerFrame == 1152 && f.channels == 1 && !f.hasCrc))
    assert(fs.forall(_.length == 417))
    assert(fs.head.versionName == "MPEG1" && fs.head.layer == 3)
    val m = Mp3.readMeta(s)
    assert(m.frames == 10 && m.samples == 11520L)
    assert(math.abs(m.duration_s - 11520.0 / 44100) < 1e-12)
    assert(!m.vbr && m.format == "MP3")
  }

  test("bitrate/samplerate tables: every MPEG1-L3 index round-trips") {
    val expected = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
      256, 320)
    (1 to 14).foreach { idx =>
      val s = Mp3.writeTestStream(Seq(50), bitrateIdx = idx, srIdx = 2)
      val f = Mp3.frames(s).head
      assert(f.bitrateKbps == expected(idx - 1) && f.sampleRate == 32000)
      assert(f.length == 144 * f.bitrateKbps * 1000 / 32000)
    }
  }

  test("ID3v2 tag is skipped; sniff accepts ID3- and sync-led payloads") {
    val tagged = Mp3.writeTestStream(Seq(90, 90), id3 = true)
    assert(new String(tagged, 0, 3, "US-ASCII") == "ID3")
    assert(Mp3.frames(tagged).length == 2)
    assert(Mp3.isMp3(tagged))
    assert(Mp3.isMp3(Mp3.writeTestStream(Seq(90, 90))))
    assert(!Mp3.isMp3("RIFF....WAVE".getBytes))
    assert(!Mp3.isMp3(null))
    // a lone 0xFF byte in junk does not fake a stream
    assert(!Mp3.isMp3(Array[Byte](0xff.toByte, 0x01, 0x02, 0x03)))
  }

  test("resync: junk between frames is stepped over") {
    val a = Mp3.writeTestStream(Seq(80))
    val b = Mp3.writeTestStream(Seq(81))
    val glued = a ++ Array.fill[Byte](7)(0x55) ++ b
    val fs = Mp3.frames(glued)
    assert(fs.length == 2)
    assert(fs(1).offset == a.length + 7)
  }

  test("frameGains reads global_gain out of the side info, both channel modes") {
    val gains = Seq(10, 100, 200, 255, 0)
    val s = Mp3.writeTestStream(gains)
    val gs = Mp3.frameGains(s)
    assert(gs.map(_._3) == gains.map(_.toDouble))
    // frame timestamps advance by 1152/44100
    val dt = 1152.0 / 44100
    gs.zipWithIndex.foreach { case ((i, t, _), k) =>
      assert(i == k && math.abs(t - k * dt) < 1e-12)
    }
    // stereo: two granules × two channels all carry the gain
    val st = Mp3.writeTestStream(Seq(123), mono = false)
    assert(Mp3.frames(st).head.channels == 2)
    assert(Mp3.frameGains(st).head._3 == 123.0)
  }

  test("loudSegments: silence-bounded runs with min length") {
    // profile: 3 loud, 2 silent, 4 loud, 1 silent, 2 loud(tail)
    val gains = Seq(200, 210, 190, 5, 5, 180, 180, 185, 200, 5, 150, 150)
    val s = Mp3.writeTestStream(gains)
    val dt = 1152.0 / 44100
    val segs = Mp3.loudSegments(s, threshold = 50.0, minFrames = 3)
    assert(segs.length == 2)
    assert(math.abs(segs(0)._1 - 0.0) < 1e-12 && math.abs(segs(0)._2 - 3 * dt) < 1e-12)
    assert(math.abs(segs(1)._1 - 5 * dt) < 1e-12 && math.abs(segs(1)._2 - 9 * dt) < 1e-12)
    // tail run below min length is dropped; raising minFrames drops all
    assert(Mp3.loudSegments(s, 50.0, 5).isEmpty)
  }

  test("VBR: mixed bitrates flagged; CBR not") {
    val cbr = Mp3.writeTestStream(Seq.fill(4)(100), bitrateIdx = 9)
    assert(!Mp3.readMeta(cbr).vbr)
    val vbr = Mp3.writeTestStream(Seq(100), bitrateIdx = 9) ++
      Mp3.writeTestStream(Seq(100), bitrateIdx = 11) ++
      Mp3.writeTestStream(Seq(100), bitrateIdx = 9)
    val m = Mp3.readMeta(vbr)
    assert(m.vbr && m.frames == 3)
  }

  test("Xing header frame is detected and excluded from the audio count") {
    // build a Xing frame by hand: fixture frame + tag at 4+17 (mono MPEG1)
    val base = Mp3.writeTestStream(Seq(0, 100, 100, 100))
    val frameLen = 417
    val withXing = base.clone()
    val at = 4 + 17
    "Xing".getBytes.copyToArray(withXing, at)
    // flags: frames present
    withXing(at + 4) = 0; withXing(at + 5) = 0; withXing(at + 6) = 0
    withXing(at + 7) = 1
    // frame count: 3
    withXing(at + 8) = 0; withXing(at + 9) = 0; withXing(at + 10) = 0
    withXing(at + 11) = 3
    val m = Mp3.readMeta(withXing)
    assert(m.frames == 3 && m.vbr) // "Xing" tag implies VBR
    assert(m.samples == 3 * 1152L)
    assert(withXing.length == 4 * frameLen)
  }

  test("MP4 hand-off: mp3 track ES extracted from MP4 parses as frames") {
    val mpegFrames = Mp3.writeTestStream(Seq(60, 70, 80))
    val perFrame = Mp3.frames(mpegFrames).map(f =>
      java.util.Arrays.copyOfRange(mpegFrames, f.offset, f.offset + f.length))
    val mp4 = Mp4.write(Seq.empty, 0, 0, 0,
      mp3 = Some((perFrame, 44100, 1152)))
    val Some((codec, es)) = Mp4.extractAudioStream(mp4)
    assert(codec == "mp3")
    val back = Mp3.frames(es)
    assert(back.length == 3)
    assert(Mp3.frameGains(es).map(_._3) == Seq(60.0, 70.0, 80.0))
  }
}
