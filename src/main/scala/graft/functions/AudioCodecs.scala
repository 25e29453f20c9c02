package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** WAV codec breadth beyond the JDK's PCM-16 reader — the compressed /
  * narrow encodings real-world WAV corpora actually carry, decoded to the
  * library's PCM-16 interchange form (the reference gets these free from
  * libavcodec via `audio.py`'s av-based container probe,
  * `/root/reference/pixeltable/functions/audio.py:26-80`; this is the
  * pure-JVM subset with exact integer algorithms):
  *
  *  - format tag 1 (PCM) at 8-bit unsigned, 16/24/32-bit signed LE;
  *  - tag 3 (IEEE float32) scaled to full-range PCM-16;
  *  - tag 6 (G.711 A-law) and tag 7 (G.711 μ-law) — the ITU tables via
  *    their closed-form bit decompositions (seg/mantissa), so a SQL
  *    oracle can recompute the decode independently with bit arithmetic;
  *  - tag 0x11 (IMA/DVI ADPCM), block-wise with the standard 89-entry
  *    step table, mono and stereo (interleaved 4-byte channel groups).
  *
  * Encoders for μ-law / A-law / IMA ADPCM / PCM-8 exist too (fixture
  * synthesis and the `transcodeWav` sink surface); all are deterministic
  * integer algorithms, so encode→decode round-trips pin exactly in specs
  * and gates. The container walk is the canonical RIFF chunk scan (fmt
  * before data, fact/LIST chunks skipped, word alignment respected).
  */
object AudioCodecs {

  // ---------------- RIFF/WAVE container ----------------

  final case class WavInfo(formatTag: Int, channels: Int, sampleRate: Int,
      bitsPerSample: Int, blockAlign: Int, data: Array[Byte])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a WAVE payload into its fmt fields + raw data bytes. */
  def parseWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "WAVE", "not a RIFF/WAVE payload")
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None
    var data: Option[Array[Byte]] = None
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = fourcc(bytes, pos)
      val size = u32(bytes, pos + 4).toInt
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          // WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real tag is the first
          // 2 bytes of the 16-byte SubFormat GUID at offset 24
          val rawTag = u16(bytes, body)
          val tag = if (rawTag == 0xfffe && size >= 40) u16(bytes, body + 24)
            else rawTag
          fmt = Some((tag, u16(bytes, body + 2), u32(bytes, body + 4).toInt,
            u16(bytes, body + 14), u16(bytes, body + 12)))
        case "data" =>
          val end = math.min(body + size, bytes.length)
          data = Some(java.util.Arrays.copyOfRange(bytes, body, end))
        case _ => // fact, LIST, cue, ... — skip
      }
      pos = body + size + (size & 1) // word alignment
    }
    val (tag, ch, rate, bits, align) = fmt.getOrElse(
      throw new IllegalArgumentException("WAVE without fmt chunk"))
    WavInfo(tag, ch, rate, bits, align,
      data.getOrElse(throw new IllegalArgumentException("WAVE without data chunk")))
  }

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Write a WAVE container for an arbitrary format tag. Compressed tags
    * get the spec's `fact` chunk carrying the per-channel sample count.
    */
  def writeWav(tag: Int, channels: Int, sampleRate: Int, bitsPerSample: Int,
      blockAlign: Int, samplesPerChannel: Int, data: Array[Byte]): Array[Byte] = {
    val avgBps =
      if (tag == 0x11) { // block-quantized rate
        val spb = adpcmSamplesPerBlock(blockAlign, channels)
        (sampleRate.toLong * blockAlign / spb).toInt
      } else sampleRate * blockAlign
    val fact =
      if (tag == 1) Array.emptyByteArray
      else "fact".getBytes ++ le32(4) ++ le32(samplesPerChannel)
    val fmtBody = le16(tag) ++ le16(channels) ++ le32(sampleRate) ++
      le32(avgBps) ++ le16(blockAlign) ++ le16(bitsPerSample) ++ le16(0)
    val chunks = "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(fmtBody.length) ++ fmtBody ++ fact ++
      "data".getBytes ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    "RIFF".getBytes ++ le32(chunks.length) ++ chunks
  }

  // ---------------- G.711 (ITU-T, exact bit decomposition) ----------------

  private val Bias = 0x84
  private val Clip = 32635

  /** μ-law byte → linear PCM-16 (ulaw2linear closed form). */
  def mulawDecode(code: Byte): Short = {
    val u = (~code) & 0xff
    val t = (((u & 0x0f) << 3) + Bias) << ((u & 0x70) >> 4)
    (if ((u & 0x80) != 0) Bias - t else t - Bias).toShort
  }

  /** linear PCM-16 → μ-law byte (linear2ulaw). */
  def mulawEncode(sample: Short): Byte = {
    var s = sample.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > Clip) s = Clip
    s += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val man = (s >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | man)).toByte
  }

  /** A-law byte → linear PCM-16 (alaw2linear closed form; sign bit 1 is
    * POSITIVE in A-law, and the byte is XOR-masked with 0x55).
    */
  def alawDecode(code: Byte): Short = {
    val a = (code ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    t = if (seg == 0) t + 8 else (t + 0x108) << (seg - 1)
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** linear PCM-16 → A-law byte (linear2alaw). */
  def alawEncode(sample: Short): Byte = {
    var s = sample.toInt
    val sign = if (s >= 0) 0x80 else { s = -s - 1; 0 }
    if (s > 0x7fff) s = 0x7fff
    var seg = 0
    var v = s >> 4
    while (v > 0x0f && seg < 7) { v >>= 1; seg += 1 }
    val man = if (seg == 0) (s >> 4) & 0x0f else (s >> (seg + 3)) & 0x0f
    ((sign | (seg << 4) | man) ^ 0x55).toByte
  }

  // ---------------- IMA / DVI ADPCM (format tag 0x11) ----------------

  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Per-channel samples held by one ADPCM block of `blockAlign` bytes:
    * the 4-byte channel header carries sample 0; every following byte
    * carries two nibbles.
    */
  def adpcmSamplesPerBlock(blockAlign: Int, channels: Int): Int =
    (blockAlign - 4 * channels) * 2 / channels + 1

  private final class AdpcmState(var predictor: Int, var index: Int) {
    def decodeNibble(n: Int): Short = {
      val step = StepTable(index)
      var diff = step >> 3
      if ((n & 1) != 0) diff += step >> 2
      if ((n & 2) != 0) diff += step >> 1
      if ((n & 4) != 0) diff += step
      predictor = math.max(-32768,
        math.min(32767, if ((n & 8) != 0) predictor - diff else predictor + diff))
      index = math.max(0, math.min(88, index + IndexTable(n & 7)))
      predictor.toShort
    }
    def encodeSample(s: Short): Int = {
      val step = StepTable(index)
      var delta = s - predictor
      var n = if (delta < 0) { delta = -delta; 8 } else 0
      var diff = step >> 3
      if (delta >= step) { n |= 4; delta -= step; diff += step }
      if (delta >= (step >> 1)) { n |= 2; delta -= step >> 1; diff += step >> 1 }
      if (delta >= (step >> 2)) { n |= 1; diff += step >> 2 }
      predictor = math.max(-32768,
        math.min(32767, if ((n & 8) != 0) predictor - diff else predictor + diff))
      index = math.max(0, math.min(88, index + IndexTable(n & 7)))
      n
    }
  }

  /** Decode IMA ADPCM data bytes (mono or stereo interleaved) to
    * channel-interleaved PCM-16; `samplesPerChannel` (from the fact
    * chunk or Int.MaxValue) truncates the final partial block.
    */
  def adpcmDecode(data: Array[Byte], blockAlign: Int, channels: Int,
      samplesPerChannel: Int = Int.MaxValue): Array[Short] = {
    require(channels == 1 || channels == 2, s"ADPCM channels=$channels")
    val out = new scala.collection.mutable.ArrayBuffer[Short]()
    var block = 0
    var emitted = 0
    while ((block + 1) * blockAlign <= data.length && emitted < samplesPerChannel) {
      val base = block * blockAlign
      val states = Array.tabulate(channels) { c =>
        val o = base + 4 * c
        val pred = (u16(data, o) << 16) >> 16 // sign-extend
        new AdpcmState(pred, data(o + 2) & 0xff)
      }
      val blockSamples = math.min(adpcmSamplesPerBlock(blockAlign, channels),
        samplesPerChannel - emitted)
      // sample 0 per channel is the header predictor itself
      states.foreach(st => out += st.predictor.toShort)
      var produced = 1
      var pos = base + 4 * channels
      // nibble payload: per channel, 4-byte (8-nibble) groups interleaved
      while (produced < blockSamples && pos < base + blockAlign) {
        var c = 0
        val groupSamples = new Array[Array[Short]](channels)
        while (c < channels) {
          val g = new Array[Short](8)
          var i = 0
          while (i < 4) {
            val b = data(pos + i) & 0xff
            g(2 * i) = states(c).decodeNibble(b & 0x0f)
            g(2 * i + 1) = states(c).decodeNibble(b >> 4)
            i += 1
          }
          groupSamples(c) = g
          pos += 4
          c += 1
        }
        var k = 0
        while (k < 8 && produced < blockSamples) {
          var cc = 0
          while (cc < channels) { out += groupSamples(cc)(k); cc += 1 }
          produced += 1
          k += 1
        }
      }
      emitted += blockSamples
      block += 1
    }
    out.toArray
  }

  /** Encode mono PCM-16 to IMA ADPCM blocks of `blockAlign` bytes. */
  def adpcmEncodeMono(samples: Array[Short], blockAlign: Int = 1024): Array[Byte] = {
    require(samples.nonEmpty, "empty input")
    val spb = adpcmSamplesPerBlock(blockAlign, 1)
    val out = new java.io.ByteArrayOutputStream()
    var base = 0
    var index = 0
    while (base < samples.length) {
      val st = new AdpcmState(samples(base), index)
      out.write(le16(samples(base) & 0xffff))
      out.write(st.index)
      out.write(0)
      var i = base + 1
      val end = math.min(base + spb, samples.length)
      var nibbles = 0
      var pending = 0
      while (i < end) {
        val n = st.encodeSample(samples(i))
        if (nibbles % 2 == 0) pending = n & 0x0f
        else out.write(pending | ((n & 0x0f) << 4))
        nibbles += 1
        i += 1
      }
      if (nibbles % 2 == 1) out.write(pending)
      // pad the block to full blockAlign with zero nibbles (silence hold)
      val written = 4 + (nibbles + 1) / 2
      (written until blockAlign).foreach(_ => out.write(0))
      index = st.index
      base += spb
    }
    out.toByteArray
  }

  // ---------------- decode dispatch ----------------

  /** Decode any supported WAVE payload to (sampleRate, channels,
    * channel-interleaved PCM-16). The JDK reader keeps the fast path for
    * plain PCM-16; everything else lands here via `Audio.decodePcm`'s
    * fallback.
    */
  def decodeToPcm16(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val w = parseWav(bytes)
    val samples: Array[Short] = (w.formatTag, w.bitsPerSample) match {
      case (1, 16) =>
        val s = new Array[Short](w.data.length / 2)
        ByteBuffer.wrap(w.data).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer().get(s)
        s
      case (1, 8) => // 8-bit WAV PCM is UNSIGNED; widen to full scale
        w.data.map(b => (((b & 0xff) - 128) << 8).toShort)
      case (1, 24) =>
        Array.tabulate(w.data.length / 3) { i =>
          // take the top 16 of the 24: bytes are LE (lo, mid, hi)
          ((w.data(3 * i + 1) & 0xff) | (w.data(3 * i + 2) << 8)).toShort
        }
      case (1, 32) =>
        Array.tabulate(w.data.length / 4) { i =>
          ((w.data(4 * i + 2) & 0xff) | (w.data(4 * i + 3) << 8)).toShort
        }
      case (3, 32) =>
        val fb = ByteBuffer.wrap(w.data).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
        Array.tabulate(fb.remaining()) { i =>
          val v = math.rint(fb.get(i) * 32767.0)
          math.max(-32768, math.min(32767, v)).toShort
        }
      case (6, _) => w.data.map(alawDecode)
      case (7, _) => w.data.map(mulawDecode)
      case (0x11, _) =>
        val spc = factSamples(bytes).getOrElse(Int.MaxValue)
        adpcmDecode(w.data, w.blockAlign, w.channels, spc)
      case (tag, bits) =>
        throw new IllegalArgumentException(
          s"unsupported WAVE format tag=$tag bits=$bits")
    }
    (w.sampleRate, w.channels, samples)
  }

  /** The fact chunk's per-channel sample count, when present. */
  private def factSamples(bytes: Array[Byte]): Option[Int] = {
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = fourcc(bytes, pos)
      val size = u32(bytes, pos + 4).toInt
      if (id == "fact" && size >= 4) return Some(u32(bytes, pos + 8).toInt)
      pos += 8 + size + (size & 1)
    }
    None
  }

  // ---------------- transcode surface ----------------

  /** Re-encode a (decodable) WAV to the named codec — the sink half of
    * codec breadth. Mono output for adpcm (the encoder's scope); G.711 and
    * pcm8 preserve channel count byte-for-byte positionally.
    */
  def transcode(bytes: Array[Byte], codec: String): Array[Byte] = {
    val (rate, channels, s) = decodeAny(bytes)
    codec match {
      case "ulaw" =>
        writeWav(7, channels, rate, 8, channels, s.length / channels,
          s.map(mulawEncode))
      case "alaw" =>
        writeWav(6, channels, rate, 8, channels, s.length / channels,
          s.map(alawEncode))
      case "pcm8" =>
        writeWav(1, channels, rate, 8, channels, s.length / channels,
          s.map(x => (((x >> 8) + 128) & 0xff).toByte))
      case "adpcm" =>
        require(channels == 1, "adpcm transcode is mono")
        val blockAlign = 1024
        writeWav(0x11, 1, rate, 4, blockAlign, s.length,
          adpcmEncodeMono(s, blockAlign))
      case "pcm16" =>
        val raw = new Array[Byte](s.length * 2)
        ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer().put(s)
        writeWav(1, channels, rate, 16, 2 * channels, s.length / channels, raw)
      case "flac" => Flac.encode(s, channels, rate)
      case other => throw new IllegalArgumentException(s"unknown codec '$other'")
    }
  }

  /** WAV via this parser; AIFF/AU/other containers via the JDK reader. */
  def decodeAny(bytes: Array[Byte]): (Int, Int, Array[Short]) =
    if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF") decodeToPcm16(bytes)
    else {
      val (fmt, s) = Audio.decodePcm(bytes)
      (fmt.getSampleRate.toInt, fmt.getChannels, s)
    }
}
