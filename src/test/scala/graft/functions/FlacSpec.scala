package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec pins: the format is lossless, so every round-trip asserts
  * BIT-EXACT equality; CRCs pin against the standard check vectors; the
  * decoder's LPC and multi-byte-frame-number paths exercise through the
  * encoder's explicit modes.
  */
class FlacSpec extends AnyFunSuite {
  import Flac._

  private def tone(n: Int, freq: Double, rate: Double = 16000,
      amp: Double = 16383): Array[Short] =
    Array.tabulate(n)(i => (math.sin(2 * math.Pi * freq * i / rate) * amp).toShort)

  /** deterministic integer "noise" — the closed form q164 also uses */
  private def saw(n: Int): Array[Short] =
    Array.tabulate(n)(i => (((i * 193) % 8191) - 4095).toShort)

  test("crc polynomials match the standard check vectors") {
    val check = "123456789".getBytes
    assert(crc8(check, 0, check.length) === 0xf4)   // CRC-8 (poly 0x07)
    assert(crc16(check, 0, check.length) === 0xfee8) // CRC-16/BUYPASS (0x8005)
  }

  test("mono round-trip is bit-exact: tone, sawtooth, partial final frame") {
    for (s <- Seq(tone(8192, 440), saw(10000), tone(4095, 997), saw(1))) {
      val enc = encode(s, 1, 16000)
      val dec = decode(enc)
      assert(dec.sampleRate === 16000 && dec.channels === 1)
      assert(dec.totalSamples === s.length)
      assert(dec.samples.toSeq === s.map(_.toInt).toSeq)
      assert(dec.md5Ok, "stream MD5 must verify")
    }
  }

  test("stereo round-trip is bit-exact (independent channels)") {
    val n = 5000
    val inter = new Array[Short](2 * n)
    for (i <- 0 until n) {
      inter(2 * i) = ((i * 193 % 8191) - 4095).toShort
      inter(2 * i + 1) = (math.sin(2 * math.Pi * 313 * i / 16000) * 12000).toShort
    }
    val dec = decode(encode(inter, 2, 16000))
    assert(dec.channels === 2 && dec.totalSamples === n)
    assert(dec.samples.toSeq === inter.map(_.toInt).toSeq)
    assert(dec.md5Ok)
  }

  test("LPC subframes decode exactly (explicit coefficients + shift)") {
    val s = saw(6000)
    for (spec <- Seq(LpcSpec(Array(2, -1), 0, 5),
        LpcSpec(Array(3, -3, 1), 1, 6),
        LpcSpec(Array(7, -5, 2, -1), 2, 8))) {
      val dec = decode(encode(s, 1, 16000, lpc = Some(spec)))
      assert(dec.samples.toSeq === s.map(_.toInt).toSeq,
        s"order ${spec.coefs.length}")
      assert(dec.md5Ok)
    }
  }

  test("analyzed LPC engages on AR signals: smaller than FIXED-only, still exact") {
    // speech-like AR(2) process with a deterministic LCG excitation
    val n = 16384
    val x = new Array[Short](n)
    var s = 12345L
    var x1 = 0.0; var x2 = 0.0
    for (i <- 0 until n) {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      val noise = ((s >>> 40).toInt - (1 << 23)) / (1 << 14) // small, centered
      val v = 1.6 * x1 - 0.81 * x2 + noise
      x2 = x1; x1 = v
      x(i) = math.max(-30000.0, math.min(30000.0, v)).toShort
    }
    val enc = encode(x, 1, 16000)
    val dec = decode(enc)
    assert(dec.samples.toSeq === x.map(_.toInt).toSeq)
    assert(dec.md5Ok)
    // force the fixed-only path via an explicit trivial LPC? No — compare
    // against verbatim size: a resonant AR signal must compress well
    assert(enc.length < n * 2 * 0.8,
      s"LPC should compress the AR signal: ${enc.length} vs ${n * 2}")
  }

  test("small blocks exercise multi-byte UTF-8 frame numbers") {
    val s = saw(13000) // blockSize 64 → 204 frames, numbers past 0x7f
    val dec = decode(encode(s, 1, 16000, blockSize = 64))
    assert(dec.samples.toSeq === s.map(_.toInt).toSeq)
    assert(dec.md5Ok)
  }

  test("blockSize outside [1, 65536] fails fast (16-bit field would truncate)") {
    val s = saw(100)
    intercept[IllegalArgumentException](encode(s, 1, 16000, blockSize = 0))
    intercept[IllegalArgumentException](encode(s, 1, 16000, blockSize = 65537))
    // the max legal size still round-trips
    val dec = decode(encode(s, 1, 16000, blockSize = 65536))
    assert(dec.samples.toSeq === s.map(_.toInt).toSeq)
  }

  test("silence compresses to CONSTANT subframes and stays exact") {
    val s = new Array[Short](8192)
    val enc = encode(s, 1, 16000)
    assert(enc.length < 200, s"constant blocks should be tiny: ${enc.length}")
    assert(decode(enc).samples.forall(_ == 0))
  }

  test("corruption is detected by the frame CRCs") {
    val enc = encode(saw(5000), 1, 16000)
    // flip a byte well inside the first frame's payload
    val bad = enc.clone()
    bad(enc.length / 2) = (bad(enc.length / 2) ^ 0x40).toByte
    val e = intercept[Exception](decode(bad))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("sync"),
      e.getMessage)
  }

  test("foreign metadata blocks (padding, vorbis-comment) are skipped") {
    val enc = encode(saw(3000), 1, 16000)
    // un-set STREAMINFO's last-metadata flag and splice a PADDING block
    // (type 1) and a fake VORBIS_COMMENT (type 4) before the frames
    val headEnd = 4 + 4 + 34 // magic + block header + streaminfo body
    val out = new java.io.ByteArrayOutputStream()
    out.write(enc, 0, headEnd)
    val b = out.toByteArray
    b(4) = (b(4) & 0x7f).toByte // clear last flag on STREAMINFO
    out.reset(); out.write(b)
    out.write(Array[Byte](1, 0, 0, 8)); out.write(new Array[Byte](8)) // padding
    out.write(Array[Byte](0x84.toByte, 0, 0, 4)) // vorbis, LAST flag set
    out.write("test".getBytes)
    out.write(enc, headEnd, enc.length - headEnd)
    val dec = decode(out.toByteArray)
    assert(dec.samples.toSeq === saw(3000).map(_.toInt).toSeq)
    assert(dec.md5Ok)
  }

  test("flac rides the shared audio surface: transcode + ops decode it") {
    val wav = Audio.sineWav(0.25, 440.0)
    val flacBytes = AudioCodecs.transcode(wav, "flac")
    assert(new String(flacBytes, 0, 4) == "fLaC")
    val (fmt, dec) = Audio.decodePcm(flacBytes)
    val (fmtRef, ref) = Audio.decodePcm(wav)
    assert(fmt.getSampleRate === fmtRef.getSampleRate)
    assert(dec.toSeq === ref.toSeq, "lossless transcode must be bit-exact")
    // compression actually engaged on tonal content
    assert(flacBytes.length < wav.length * 0.9,
      s"flac ${flacBytes.length} vs wav ${wav.length}")
  }
}
