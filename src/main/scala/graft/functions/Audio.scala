package graft.functions

import org.apache.spark.sql.functions.udf
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio operations over binary WAV payloads (reference audio family,
  * `/root/reference/pixeltable/functions/audio.py:26-763`), built on the
  * JDK's javax.sound.sampled — no external codec dependency. PCM 16-bit
  * WAV is the interchange encoding; compressed/narrow WAV encodings
  * (G.711 μ-law/A-law, IMA ADPCM, PCM-8/24/32, float32) decode through
  * `AudioCodecs` transparently in every op below.
  *
  * `audioSplitter` reproduces the reference's silence-detection splitting
  * shape: segments bounded by runs of below-threshold RMS.
  */
object Audio {

  private val Rate = 16000f

  private[graft] def decodePcm(bytes: Array[Byte]): (AudioFormat, Array[Short]) = {
    // RIFF/WAVE goes through the codec-aware parser (PCM-8/16/24/32,
    // float32, G.711 a/μ-law, IMA ADPCM — `AudioCodecs`); FLAC through
    // the pure-JVM lossless decoder; AIFF/AU and other JDK-native
    // containers keep the javax.sound path.
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F') {
      val (rate, channels, samples) = AudioCodecs.decodeToPcm16(bytes)
      return (new AudioFormat(rate.toFloat, 16, channels, true, false), samples)
    }
    if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
        bytes(2) == 'a' && bytes(3) == 'C') {
      val fs = Flac.decode(bytes)
      // widen/narrow to the PCM-16 interchange depth
      val shift = fs.bitsPerSample - 16
      val s16 =
        if (shift == 0) fs.samples.map(_.toShort)
        else if (shift > 0) fs.samples.map(v => (v >> shift).toShort)
        else fs.samples.map(v => (v << -shift).toShort)
      return (new AudioFormat(fs.sampleRate.toFloat, 16, fs.channels, true,
        false), s16)
    }
    if (Ogg.isOgg(bytes) && Ogg.readMeta(bytes).codec == "vorbis") {
      val d = Vorbis.decodeOgg(bytes)
      return (new AudioFormat(d.info.sampleRate.toFloat, 16,
        d.info.channels, true, false), Vorbis.toPcm16(d.pcm))
    }
    if (Mkv.isMkv(bytes)) {
      Mkv.vorbisPackets(bytes).foreach { pkts =>
        val d = Vorbis.decode(pkts)
        return (new AudioFormat(d.info.sampleRate.toFloat, 16,
          d.info.channels, true, false), Vorbis.toPcm16(d.pcm))
      }
    }
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16, s"expect 16-bit PCM, got $fmt")
    val raw = in.readAllBytes()
    val samples = new Array[Short](raw.length / 2)
    val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN
    java.nio.ByteBuffer.wrap(raw).order(order).asShortBuffer().get(samples)
    (fmt, samples)
  }

  /** Re-encode a WAV to a named codec (ulaw/alaw/adpcm/pcm8/pcm16) —
    * `AudioCodecs.transcode`, the format-conversion sink.
    */
  val transcodeWav = udf { (bytes: Array[Byte], codec: String) =>
    AudioCodecs.transcode(bytes, codec)
  }

  /** Mono 16 kHz WAV whose DATA bytes are exactly `codes` under the named
    * 8-bit encoding (ulaw/alaw/pcm8) — codec-gate fixture: the decode of a
    * known code sequence is a closed form a SQL oracle recomputes with bit
    * arithmetic.
    */
  val makeCodedWav = udf { (codes: Seq[Int], codec: String) =>
    val tag = codec match {
      case "ulaw" => 7
      case "alaw" => 6
      case "pcm8" => 1
      case other  => throw new IllegalArgumentException(s"makeCodedWav: $other")
    }
    AudioCodecs.writeWav(tag, 1, Rate.toInt, 8, 1, codes.length,
      codes.map(_.toByte).toArray)
  }

  /** Deterministic integer sawtooth WAV — sample i is
    * `((i*step + offset) % 8191) - 4095`, a pure-integer closed form a SQL
    * oracle recomputes exactly (no transcendentals, no float rounding).
    */
  val makeSawWav = udf { (n: Int, step: Int, offset: Int) =>
    encodeWav(Array.tabulate(n)(i =>
      (((i.toLong * step + offset) % 8191) - 4095).toShort))
  }

  /** Exact integer sum of the decoded PCM-16 samples — the decode proof
    * column for codec gates.
    */
  val sampleSum = udf { (bytes: Array[Byte]) =>
    decodePcm(bytes)._2.foldLeft(0L)(_ + _)
  }

  /** Decoded PCM-16 sample count (clip-length proof column). */
  val sampleCount = udf { (bytes: Array[Byte]) =>
    decodePcm(bytes)._2.length.toLong
  }

  /** RMS sample difference between two decodable payloads (lossy-codec
    * round-trip quality metric; deterministic integer decode, so stable).
    */
  val pcmRmsDiff = udf { (a: Array[Byte], b: Array[Byte]) =>
    val sa = decodePcm(a)._2
    val sb = decodePcm(b)._2
    require(sa.length == sb.length, s"length mismatch ${sa.length} vs ${sb.length}")
    if (sa.isEmpty) 0.0
    else math.sqrt(sa.indices.map { i =>
      val d = (sa(i) - sb(i)).toDouble; d * d
    }.sum / sa.length)
  }

  private[graft] def encodeWav(samples: Array[Short], rate: Float = Rate): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(samples)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, samples.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** WAVE container overhead of encodeWav (canonical 44-byte RIFF header)
    * — measured, not assumed, so max_size budgeting stays exact if the
    * platform writer ever emits extension chunks. */
  private[graft] lazy val WavHeaderBytes: Long =
    encodeWav(Array.empty[Short]).length.toLong

  /** deterministic mono 16 kHz sine WAV — test/demo audio source */
  def sineWav(seconds: Double, freqHz: Double, amplitude: Double = 0.5): Array[Byte] = {
    val n = (seconds * Rate).toInt
    val samples = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freqHz * i / Rate) * amplitude * Short.MaxValue).toShort)
    encodeWav(samples)
  }

  val makeSineWav = udf { (seconds: Double, freqHz: Double) => sineWav(seconds, freqHz) }

  /** deterministic A-gap-B-gap-A-gap-B two-tone WAV — a two-"speaker"
    * diarization test source (alternating pitches separated by silence)
    */
  val makeTwoToneWav = udf { (freqA: Double, freqB: Double, toneSecs: Double, gapSecs: Double) =>
    def tone(freq: Double): Array[Short] =
      Array.tabulate((Rate * toneSecs).toInt)(i =>
        (math.sin(2 * math.Pi * freq * i / Rate) * 0.5 * Short.MaxValue).toShort)
    val gap = new Array[Short]((Rate * gapSecs).toInt)
    encodeWav(tone(freqA) ++ gap ++ tone(freqB) ++ gap ++ tone(freqA) ++ gap ++ tone(freqB))
  }

  /** (sample_rate, channels, n_samples, duration_seconds) */
  val getMetadata = udf { (bytes: Array[Byte]) =>
    val (fmt, samples) = decodePcm(bytes)
    val perChannel = samples.length / fmt.getChannels
    (fmt.getSampleRate.toInt, fmt.getChannels, perChannel,
      perChannel.toDouble / fmt.getSampleRate)
  }

  /** MP3 stream metadata (frame walk only — never inflates audio):
    * exact frame/sample counts, duration, mean bitrate, VBR flag.
    */
  val mp3Metadata = udf { (bytes: Array[Byte]) => Mp3.readMeta(bytes) }

  /** Content-sniffed media TAGS (title/artist/album/date/…): MP4
    * `udta/meta/ilst` atoms, Matroska `Tags`, or MP3 ID3v2 (ID3v1
    * fallback) — the tag dict the reference surfaces through ffprobe's
    * format metadata. Header-only either way; unknown formats → empty
    * map.
    */
  val mediaTags = udf { (bytes: Array[Byte]) =>
    if (bytes == null) Map.empty[String, String]
    else if (Mp4.isMp4(bytes)) Mp4.readTags(bytes).toMap
    else if (Mkv.isMkv(bytes)) Mkv.readTags(bytes).toMap
    else if (Ogg.isOgg(bytes)) Ogg.readTags(bytes).toMap
    else if (bytes.length > 8 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C') Flac.readTags(bytes).toMap
    else if (Mp3.isMp3(bytes)) Mp3.readTags(bytes).toMap
    else Map.empty[String, String]
  }

  /** audio_splitter's segmentation shape on MP3 WITHOUT PCM decode:
    * silence-bounded loud runs from the side-info `global_gain`
    * loudness proxy — (start_s, end_s) pairs.
    */
  val mp3LoudSegments = udf { (bytes: Array[Byte], threshold: Double,
      minFrames: Int) =>
    Mp3.loudSegments(bytes, threshold, minFrames)
  }

  /** extract [startSec, endSec) as a new WAV (reference `clip`) */
  val clip = udf { (bytes: Array[Byte], startSec: Double, endSec: Double) =>
    val (fmt, samples) = decodePcm(bytes)
    val from = math.max((startSec * fmt.getSampleRate).toInt, 0)
    val until = math.min((endSec * fmt.getSampleRate).toInt, samples.length)
    encodeWav(samples.slice(from, until), fmt.getSampleRate)
  }

  /** root-mean-square level in [0, 1] */
  val rms = udf { (bytes: Array[Byte]) =>
    val (_, samples) = decodePcm(bytes)
    if (samples.isEmpty) 0.0
    else math.sqrt(samples.map(s => (s.toDouble / Short.MaxValue) *
      (s.toDouble / Short.MaxValue)).sum / samples.length)
  }

  /** scale amplitude (reference `multiply_volume`), clipping at full scale */
  val multiplyVolume = udf { (bytes: Array[Byte], factor: Double) =>
    val (fmt, samples) = decodePcm(bytes)
    encodeWav(samples.map(s => math.max(math.min(s * factor, Short.MaxValue),
      Short.MinValue).toShort), fmt.getSampleRate)
  }

  /** fade_in over the first `seconds` (linear amplitude ramp) */
  val fadeIn = udf { (bytes: Array[Byte], seconds: Double) =>
    val (fmt, samples) = decodePcm(bytes)
    val n = math.max((seconds * fmt.getSampleRate).toInt, 1)
    encodeWav(samples.zipWithIndex.map { case (s, i) =>
      if (i >= n) s else (s * (i.toDouble / n)).toShort
    }, fmt.getSampleRate)
  }

  /** fade_out over the last `seconds` */
  val fadeOut = udf { (bytes: Array[Byte], seconds: Double) =>
    val (fmt, samples) = decodePcm(bytes)
    val n = math.max((seconds * fmt.getSampleRate).toInt, 1)
    val total = samples.length
    encodeWav(samples.zipWithIndex.map { case (s, i) =>
      if (i < total - n) s else (s * ((total - 1 - i).toDouble / n)).toShort
    }, fmt.getSampleRate)
  }

  /** normalize: scale so the peak hits `peak` of full scale (no-op on
    * silence).
    */
  val normalize = udf { (bytes: Array[Byte], peak: Double) =>
    val (fmt, samples) = decodePcm(bytes)
    val maxAbs = if (samples.isEmpty) 0 else samples.map(s => math.abs(s.toInt)).max
    if (maxAbs == 0) encodeWav(samples, fmt.getSampleRate)
    else {
      val factor = peak * Short.MaxValue / maxAbs
      encodeWav(samples.map(s => math.max(math.min(s * factor, Short.MaxValue),
        Short.MinValue).toShort), fmt.getSampleRate)
    }
  }

  /** encode_audio as re-sampling to a target rate (linear interpolation) —
    * the format-conversion op reduced to what PCM WAV supports.
    */
  val resample = udf { (bytes: Array[Byte], targetRate: Int) =>
    val (fmt, samples) = decodePcm(bytes)
    val srcRate = fmt.getSampleRate
    val outLen = math.max((samples.length.toLong * targetRate / srcRate).toInt, 1)
    encodeWav(Array.tabulate(outLen) { i =>
      val pos = i.toDouble * srcRate / targetRate
      val j = math.min(pos.toInt, samples.length - 1)
      val k = math.min(j + 1, samples.length - 1)
      val frac = pos - j
      (samples(j) * (1 - frac) + samples(k) * frac).toShort
    }, targetRate.toFloat)
  }

  /** concatenate two WAVs (rates must match) */
  val concatAudio = udf { (a: Array[Byte], b: Array[Byte]) =>
    val (fa, sa) = decodePcm(a)
    val (fb, sb) = decodePcm(b)
    require(fa.getSampleRate == fb.getSampleRate, "sample-rate mismatch")
    encodeWav(sa ++ sb, fa.getSampleRate)
  }

  /** One audio_splitter budget-mode output row (reference `audio.py:400`
    * AudioSegment fields).
    */
  final case class AudioSegment(segment_start: Double, segment_end: Double,
      audio_segment: Array[Byte])

  /** audio_splitter's budget modes (reference `audio.py:400-472`): segments
    * sized by `durationS` seconds (with optional `overlapS`) or by
    * `maxSizeBytes` FILE bytes — exactly one of the two > 0. Like the
    * reference (audio.py:544, an `overhead_reserve` for the container
    * header/trailer), the WAV header is subtracted from the byte budget
    * before mapping to samples at 2 B/sample PCM-16 mono, so the emitted
    * segment FILE — header included — never exceeds max_size bytes. With `minSilenceSec` > 0 each segment ends at
    * the LATEST silence (20 ms windows whose RMS < `silenceRms`, run length
    * ≥ minSilenceSec) at or before its budget — segments don't end
    * mid-speech; without a qualifying silence the cut lands exactly on the
    * budget. `trimLeadingSilence` drops silent windows from each segment's
    * start. Returns AudioSegment structs for posexplode.
    */
  val audioSegments = udf { (bytes: Array[Byte], durationS: Double,
      overlapS: Double, maxSizeBytes: Long, silenceRms: Double,
      minSilenceSec: Double, trimLeadingSilence: Boolean) =>
    require((durationS > 0) ^ (maxSizeBytes > 0),
      "exactly one of duration/maxSize must be set")
    require(overlapS <= 0 || durationS > 0, "overlap requires duration mode")
    val (fmt, samples) = decodePcm(bytes)
    val rate = fmt.getSampleRate
    val budget =
      if (durationS > 0) math.max(1, math.round(durationS * rate).toInt)
      else math.max(1, math.min((maxSizeBytes - WavHeaderBytes) / 2,
        Int.MaxValue.toLong).toInt)
    val overlap =
      if (overlapS > 0) math.min(math.round(overlapS * rate).toInt, budget - 1)
      else 0
    val win = math.max((rate * 0.02).toInt, 1)
    val silentWin: Array[Boolean] =
      if (minSilenceSec > 0 || trimLeadingSilence)
        samples.grouped(win).map { w =>
          math.sqrt(w.map(s => (s.toDouble / Short.MaxValue) *
            (s.toDouble / Short.MaxValue)).sum / w.length) < silenceRms
        }.toArray
      else Array.empty
    val minSilentWins = math.max((minSilenceSec / 0.02).toInt, 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
    var start = 0
    while (start < samples.length) {
      var segStart = start
      if (trimLeadingSilence) {
        while (segStart / win < silentWin.length &&
            silentWin(segStart / win) &&
            segStart + win <= samples.length) segStart += win
        if (segStart >= samples.length) segStart = start // fully silent tail
      }
      val hardEnd = math.min(samples.length, segStart + budget)
      var end = hardEnd
      if (minSilenceSec > 0 && hardEnd < samples.length) {
        // latest window e with a full silent run [e-minSilentWins+1, e]
        // ending at or before the budget and after the segment start
        val lastWin = hardEnd / win - 1
        val firstWin = segStart / win
        var e = lastWin
        var found = -1
        while (e >= firstWin + minSilentWins - 1 && found < 0) {
          val runOk = (e - minSilentWins + 1 to e).forall(silentWin(_))
          if (runOk) found = e else e -= 1
        }
        if (found >= 0) end = math.min(hardEnd, (found + 1) * win)
      }
      if (end <= segStart) end = hardEnd // degenerate: keep progress
      out += AudioSegment(segStart / rate.toDouble, end / rate.toDouble,
        encodeWav(samples.slice(segStart, end), rate))
      val next = end - overlap
      start = if (next > start) next else end
      if (end >= samples.length) start = samples.length
    }
    out.toSeq
  }

  /** audio_splitter (reference `audio.py:357-763`): split on silence —
    * windows whose RMS falls below `silenceRms` for at least
    * `minSilenceSec` separate segments. Returns (idx, start_sec, end_sec,
    * wav) structs for posexplode into a component view.
    */
  val audioSplitter = udf { (bytes: Array[Byte], silenceRms: Double, minSilenceSec: Double) =>
    val (fmt, samples) = decodePcm(bytes)
    val rate = fmt.getSampleRate
    val win = math.max((rate * 0.02).toInt, 1) // 20 ms analysis windows
    val winRms = samples.grouped(win).map { w =>
      math.sqrt(w.map(s => (s.toDouble / Short.MaxValue) *
        (s.toDouble / Short.MaxValue)).sum / w.length)
    }.toArray
    val minSilentWins = math.max((minSilenceSec / 0.02).toInt, 1)
    // find segment boundaries: maximal non-silent spans
    val segments = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var segStart = -1
    var silentRun = 0
    winRms.indices.foreach { i =>
      if (winRms(i) < silenceRms) {
        silentRun += 1
        if (segStart >= 0 && silentRun >= minSilentWins) {
          segments += ((segStart, i - silentRun + 1)); segStart = -1
        }
      } else {
        if (segStart < 0) segStart = i
        silentRun = 0
      }
    }
    if (segStart >= 0) segments += ((segStart, winRms.length))
    segments.zipWithIndex.map { case ((s, e), idx) =>
      (idx, s * win / rate.toDouble, math.min(e * win, samples.length) / rate.toDouble,
        encodeWav(samples.slice(s * win, math.min(e * win, samples.length)),
          fmt.getSampleRate))
    }.toSeq
  }
}
