package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Codec-exactness pins for the WAV breadth layer (`AudioCodecs`):
  * G.711 decode against ITU known vectors and the closed-form bit
  * decomposition, encode/decode round-trip identities, IMA ADPCM known
  * behavior + quality bounds, PCM width conversions, and container
  * round-trips through the shared `Audio.decodePcm` entry.
  */
class AudioCodecsSpec extends AnyFunSuite {
  import AudioCodecs._

  // ---------------- G.711 μ-law ----------------

  test("mu-law known vectors and closed-form equivalence over all codes") {
    assert(mulawDecode(0xff.toByte) === 0)     // positive zero
    assert(mulawDecode(0x7f.toByte) === 0)     // negative zero
    assert(mulawDecode(0x80.toByte) === 32124) // max positive
    assert(mulawDecode(0x00.toByte) === -32124)
    assert(mulawEncode(32124) === 0x80.toByte)
    assert(mulawEncode(0) === 0xff.toByte)
    // independent closed form: u = 255-c; t = ((u&15)<<3 + 132) << ((u&112)>>4)
    for (c <- 0 to 255) {
      val u = 255 - c
      val t = (((u & 15) << 3) + 132) << ((u & 112) >> 4)
      val expect = if ((u & 128) != 0) 132 - t else t - 132
      assert(mulawDecode(c.toByte) === expect, s"code $c")
    }
  }

  test("mu-law decode values are fixed points of encode∘decode") {
    for (c <- 0 to 255) {
      val v = mulawDecode(c.toByte)
      assert(mulawDecode(mulawEncode(v)) === v, s"code $c value $v")
    }
  }

  test("mu-law quantization error bound tracks the segment step") {
    var s = Short.MinValue.toInt
    while (s <= Short.MaxValue) {
      val rt = mulawDecode(mulawEncode(s.toShort)).toInt
      // truncating encoder: error < one mantissa step ≈ 7% of |s| (+ clip)
      val bound = 40 + 0.07 * math.abs(s)
      assert(math.abs(rt - s) <= bound, s"s=$s rt=$rt")
      s += 7 // sweep coverage without 64k assertions
    }
  }

  // ---------------- G.711 A-law ----------------

  test("a-law known vectors and closed-form equivalence over all codes") {
    assert(alawDecode(0x55.toByte) === -8)    // code 0 pre-mask
    assert(alawDecode(0xd5.toByte) === 8)     // sign bit = positive
    assert(alawDecode(0xaa.toByte) === 32256)  // max positive
    assert(alawDecode(0x2a.toByte) === -32256) // max negative
    for (c <- 0 to 255) {
      val a = c ^ 0x55
      val seg = (a & 112) >> 4
      val t0 = (a & 15) << 4
      val t = if (seg == 0) t0 + 8 else (t0 + 264) << (seg - 1)
      val expect = if ((a & 128) != 0) t else -t
      assert(alawDecode(c.toByte) === expect, s"code $c")
    }
  }

  test("a-law decode values are fixed points of encode∘decode") {
    for (c <- 0 to 255) {
      val v = alawDecode(c.toByte)
      assert(alawDecode(alawEncode(v)) === v, s"code $c value $v")
    }
  }

  // ---------------- IMA ADPCM ----------------

  test("adpcm: header carries sample 0 exactly; silence encodes to silence") {
    val silence = new Array[Short](2048)
    val dec = adpcmDecode(adpcmEncodeMono(silence), 1024, 1, 2048)
    assert(dec.length === 2048)
    assert(dec.forall(_ == 0))
    val dc = Array.fill[Short](100)(1234)
    val decDc = adpcmDecode(adpcmEncodeMono(dc), 1024, 1, 100)
    assert(decDc(0) === 1234) // block header is the literal first sample
  }

  test("adpcm round-trip on a tone: exact length, first sample, rms bound") {
    val rate = 16000
    val tone = Array.tabulate(2048)(i =>
      (math.sin(2 * math.Pi * 440 * i / rate) * 16383).toShort)
    val dec = adpcmDecode(adpcmEncodeMono(tone), 1024, 1, 2048)
    assert(dec.length === 2048)
    assert(dec(0) === tone(0))
    val rms = math.sqrt(tone.indices.map { i =>
      val d = (tone(i) - dec(i)).toDouble; d * d
    }.sum / tone.length)
    assert(rms < 1000, s"adpcm rms error $rms") // step-tracking quality
    assert(rms > 0) // lossy — a zero error would mean we compared a to a
  }

  test("adpcm stereo: channels decode independently and interleave") {
    // hand-build one stereo block: L = all-zero nibbles from 100,
    // R = all-zero nibbles from -200; nibble 0 decodes to pred + step>>3
    val blockAlign = 16 // per channel: 4 hdr + 4 payload ⇒ 9 samples/ch
    val data = new java.io.ByteArrayOutputStream()
    def hdr(pred: Int, idx: Int): Unit = {
      data.write(pred & 0xff); data.write((pred >> 8) & 0xff)
      data.write(idx); data.write(0)
    }
    hdr(100, 0); hdr(-200 & 0xffff, 0)
    (0 until 8).foreach(_ => data.write(0)) // 4 bytes L group + 4 bytes R group
    val dec = adpcmDecode(data.toByteArray, blockAlign, 2, 9)
    assert(dec.length === 18)
    assert(dec(0) === 100 && dec(1) === -200)
    // nibble 0 with index 0: step 7 ⇒ +0 (7>>3=0)... predictor stays, index -1→0
    assert(dec(2) === 100 && dec(3) === -200)
  }

  test("adpcm samples-per-block math") {
    assert(adpcmSamplesPerBlock(1024, 1) === 2041)
    assert(adpcmSamplesPerBlock(1024, 2) === 1017)
    assert(adpcmSamplesPerBlock(256, 1) === 505)
  }

  // ---------------- PCM widths + float ----------------

  test("pcm8/24/32/float32 decode through the WAV container") {
    // 8-bit unsigned: 128 → 0, 129 → 256, 0 → -32768
    val w8 = writeWav(1, 1, 8000, 8, 1, 3, Array[Byte](128.toByte, 129.toByte, 0))
    assert(decodeToPcm16(w8)._3.toSeq === Seq[Short](0, 256, -32768))
    // 24-bit LE: (lo, mid, hi) → top 16 bits
    val w24 = writeWav(1, 1, 8000, 24, 3, 2,
      Array[Byte](0xff.toByte, 0x34, 0x12, 0x00, 0x00, 0x80.toByte))
    assert(decodeToPcm16(w24)._3.toSeq === Seq[Short](0x1234, Short.MinValue))
    // 32-bit LE int → top 16
    val w32 = writeWav(1, 1, 8000, 32, 4, 1,
      Array[Byte](0, 0, 0x34, 0x12))
    assert(decodeToPcm16(w32)._3.toSeq === Seq[Short](0x1234))
    // float32: ±1.0 scale to ±32767 (clipped symmetric)
    val fb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fb.putFloat(1.0f); fb.putFloat(-0.5f)
    val wf = writeWav(3, 1, 8000, 32, 4, 2, fb.array())
    assert(decodeToPcm16(wf)._3.toSeq === Seq[Short](32767, -16384))
  }

  // ---------------- container + transcode through Audio ops ----------------

  test("transcode ulaw/alaw/adpcm/pcm8 and decode through Audio.decodePcm") {
    val tone = Audio.sineWav(0.128, 440.0)
    val (fmtRef, ref) = Audio.decodePcm(tone)
    for (codec <- Seq("ulaw", "alaw", "adpcm", "pcm8")) {
      val enc = AudioCodecs.transcode(tone, codec)
      val (fmt, dec) = Audio.decodePcm(enc)
      assert(fmt.getSampleRate === fmtRef.getSampleRate, codec)
      assert(dec.length === ref.length, codec)
      val rms = math.sqrt(ref.indices.map { i =>
        val d = (ref(i) - dec(i)).toDouble; d * d
      }.sum / ref.length)
      val bound = codec match {
        case "ulaw" => 300.0; case "alaw" => 400.0
        case "adpcm" => 1000.0; case "pcm8" => 400.0
      }
      assert(rms < bound, s"$codec rms $rms")
    }
    // pcm16 transcode is exact
    val rt = Audio.decodePcm(AudioCodecs.transcode(tone, "pcm16"))._2
    assert(rt.toSeq === ref.toSeq)
  }

  test("audio ops run transparently over compressed input") {
    val mu = AudioCodecs.transcode(Audio.sineWav(0.1, 440.0), "ulaw")
    // rms of a 0.5-amplitude sine ≈ 0.5/√2 ≈ 0.3536
    val (_, s) = Audio.decodePcm(mu)
    val rms = math.sqrt(s.map(x => (x.toDouble / Short.MaxValue) *
      (x.toDouble / Short.MaxValue)).sum / s.length)
    assert(math.abs(rms - 0.3536) < 0.01)
  }

  test("extensible WAVE (0xFFFE) resolves the real tag from the GUID") {
    val tone = Audio.sineWav(0.01, 440.0)
    val w = parseWav(tone)
    // rebuild with an extensible fmt chunk wrapping PCM
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val guid = le16(1) ++ le16(0) ++ le32(0) ++
      Array[Byte](0x80.toByte, 0, 0, 0xaa.toByte, 0, 0x38, 0x9b.toByte, 0x71)
    val fmtBody = le16(0xfffe) ++ le16(1) ++ le32(w.sampleRate) ++
      le32(w.sampleRate * 2) ++ le16(2) ++ le16(16) ++ le16(22) ++
      le16(16) ++ le32(1) ++ guid
    val chunks = "WAVE".getBytes ++ "fmt ".getBytes ++ le32(fmtBody.length) ++
      fmtBody ++ "data".getBytes ++ le32(w.data.length) ++ w.data
    val ext = "RIFF".getBytes ++ le32(chunks.length) ++ chunks
    val p = parseWav(ext)
    assert(p.formatTag === 1 && p.bitsPerSample === 16)
    assert(decodeToPcm16(ext)._3.toSeq === decodeToPcm16(tone)._3.toSeq)
  }
}
