package graft.functions

import org.apache.spark.sql.functions.udf

/** Container-level metadata across every media format graft reads — the
  * reference's `get_metadata` surface (`functions/util.py:40-110`
  * `ContainerMetadata`/`StreamMetadata`/`CodecContextMetadata`, produced
  * there by pyav/ffprobe): overall size/bit-rate, the container tag
  * dict, and one typed entry per stream with codec, geometry, timing and
  * frame counts. Header-only where the container allows it (MP4 moov
  * walk, WAV fmt chunk, FLAC STREAMINFO; MP3 walks frame headers, AVI
  * audio stats touch the stream chunks) — a metadata scan over a
  * 100 TB corpus is a map-only column op either way.
  */
object Multimedia {

  /** `CodecContextMetadata` analog: codec name + 4-char tag, audio
    * channels/rate when applicable.
    */
  final case class CodecMeta(name: String, codec_tag: String,
      channels: Option[Int], sample_rate: Option[Int])

  /** `StreamMetadata` analog. `duration` is in `time_base` ticks. */
  final case class StreamMeta(`type`: String, duration: Option[Long],
      time_base: Option[Double], duration_seconds: Option[Double],
      frames: Int, codec_context: CodecMeta,
      width: Option[Int], height: Option[Int], average_rate: Option[Double])

  /** `ContainerMetadata` analog. `metadata` is the tag dict (ilst/ID3). */
  final case class ContainerMeta(format: String, size: Long,
      bit_rate: Option[Long], metadata: Map[String, String],
      streams: Seq[StreamMeta])

  def containerMeta(bytes: Array[Byte]): ContainerMeta = {
    require(bytes != null && bytes.length >= 12, "not a media payload")
    if (Heif.isHeif(bytes)) heifMeta(bytes) // ftyp brand — before isMp4
    else if (Mp4.isMp4(bytes)) mp4Meta(bytes)
    else if (Mkv.isMkv(bytes)) mkvMeta(bytes)
    else if (Ogg.isOgg(bytes)) oggMeta(bytes)
    else if (isRiff(bytes, "AVI ")) aviMeta(bytes)
    else if (isRiff(bytes, "WAVE")) wavMeta(bytes)
    else if (isFlac(bytes)) flacMeta(bytes)
    else if (Mp3.isMp3(bytes)) mp3Meta(bytes)
    else sys.error("unrecognized media container " +
      "(expected MP4/Matroska/Ogg/AVIF/AVI/WAV/FLAC/MP3)")
  }

  private def isRiff(b: Array[Byte], kind: String): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && new String(b, 8, 4, "US-ASCII") == kind

  private def isFlac(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  private def bitRate(size: Long, seconds: Double): Option[Long] =
    if (seconds > 0) Some(math.round(size * 8 / seconds)) else None

  private def mp4Meta(bytes: Array[Byte]): ContainerMeta = {
    val tracks = Mp4.parseTracks(bytes)
    val streams = tracks.map { t =>
      val kind = t.handler match {
        case "vide" => "video"
        case "soun" => "audio"
        case "text" | "sbtl" | "subt" => "subtitle"
        case other => other.trim // meta/hint tracks keep their handler
      }
      StreamMeta(kind,
        duration = Some(t.mediaDuration),
        time_base = if (t.timescale > 0) Some(1.0 / t.timescale) else None,
        duration_seconds = Some(t.durationS),
        frames = t.nSamples,
        codec_context = CodecMeta(t.codec, t.entryFourcc,
          channels = if (kind == "audio") Some(t.channels) else None,
          sample_rate = if (kind == "audio") Some(t.sampleRate) else None),
        width = if (kind == "video") Some(t.width) else None,
        height = if (kind == "video") Some(t.height) else None,
        average_rate = if (kind == "video") Some(t.rate) else None)
    }
    val dur = streams.flatMap(_.duration_seconds).foldLeft(0.0)(math.max)
    ContainerMeta("MP4", bytes.length, bitRate(bytes.length, dur),
      Mp4.readTags(bytes).toMap, streams)
  }

  private def oggMeta(bytes: Array[Byte]): ContainerMeta = {
    val m = Ogg.readMeta(bytes)
    // Opus granules run at 48 kHz regardless of the declared input rate
    val granuleRate = if (m.codec == "opus") 48000 else m.sampleRate
    ContainerMeta("OGG", bytes.length, bitRate(bytes.length, m.durationS),
      Ogg.readTags(bytes).toMap, Seq(StreamMeta("audio",
        duration = Some(m.totalSamples),
        time_base = if (granuleRate > 0) Some(1.0 / granuleRate) else None,
        duration_seconds = Some(m.durationS), frames = m.nPages,
        codec_context = CodecMeta(m.codec, "OggS",
          Some(m.channels), Some(m.sampleRate)),
        width = None, height = None, average_rate = None)))
  }

  private def heifMeta(bytes: Array[Byte]): ContainerMeta = {
    val m = Heif.readMeta(bytes)
    ContainerMeta(m.format, bytes.length, None, Map.empty,
      Seq(StreamMeta("image",
        duration = None, time_base = None, duration_seconds = None,
        frames = m.items,
        codec_context = CodecMeta(m.codec, m.format.toLowerCase,
          None, None),
        width = Some(m.width), height = Some(m.height),
        average_rate = None)))
  }

  private def mkvMeta(bytes: Array[Byte]): ContainerMeta = {
    val mkv = Mkv.parse(bytes)
    val streams = mkv.tracks.map { t =>
      val kind = t.kind
      StreamMeta(kind,
        // Matroska timestamps are in timestamp-scale units (default 1 ms)
        duration = Some(math.round(
          t.durationS * 1e9 / mkv.timestampScaleNs)),
        time_base = Some(mkv.timestampScaleNs / 1e9),
        duration_seconds = Some(t.durationS),
        frames = t.nBlocks,
        codec_context = CodecMeta(t.codec, t.codecId,
          channels = if (kind == "audio") Some(t.channels) else None,
          sample_rate =
            if (kind == "audio") Some(math.round(t.sampleRate).toInt)
            else None),
        width = if (kind == "video") Some(t.width) else None,
        height = if (kind == "video") Some(t.height) else None,
        average_rate = if (kind == "video") Some(t.rate) else None)
    }
    val fmt = if (mkv.docType == "webm") "WEBM" else "MKV"
    ContainerMeta(fmt, bytes.length, bitRate(bytes.length, mkv.durationS),
      Mkv.readTags(bytes).toMap, streams)
  }

  private def aviMeta(bytes: Array[Byte]): ContainerMeta = {
    val m = Avi.readMeta(bytes)
    val video = StreamMeta("video",
      duration = Some(m.frames.toLong),
      time_base = if (m.fps > 0) Some(1.0 / m.fps) else None,
      duration_seconds = Some(m.duration_s), frames = m.frames,
      codec_context = CodecMeta(
        if (m.codec == "MJPG") "jpeg" else m.codec.toLowerCase, m.codec,
        None, None),
      width = Some(m.width), height = Some(m.height),
      average_rate = Some(m.fps))
    val audio = Avi.readAudio(bytes).map { case (samples, rate) =>
      StreamMeta("audio",
        duration = Some(samples.length.toLong),
        time_base = if (rate > 0) Some(1.0 / rate) else None,
        duration_seconds =
          if (rate > 0) Some(samples.length.toDouble / rate) else None,
        frames = samples.length,
        codec_context = CodecMeta("pcm", "01wb", Some(1), Some(rate)),
        width = None, height = None, average_rate = None)
    }
    ContainerMeta("AVI", bytes.length,
      bitRate(bytes.length, m.duration_s), Map.empty,
      video +: audio.toSeq)
  }

  private def wavMeta(bytes: Array[Byte]): ContainerMeta = {
    val w = AudioCodecs.parseWav(bytes)
    val codec = w.formatTag match {
      case 1 => s"pcm_s${w.bitsPerSample}le"
      case 3 => "pcm_f32le"
      case 6 => "pcm_alaw"
      case 7 => "pcm_mulaw"
      case 2 | 0x11 => "adpcm"
      case t => s"wav_0x${t.toHexString}"
    }
    // frame count (samples per channel) from the data size
    val bytesPerFrame = math.max(1,
      if (w.formatTag == 6 || w.formatTag == 7) w.channels
      else if (w.formatTag == 2 || w.formatTag == 0x11) w.blockAlign
      else w.channels * math.max(1, w.bitsPerSample / 8))
    val frames =
      if (w.formatTag == 2 || w.formatTag == 0x11)
        (w.data.length / math.max(1, w.blockAlign)) *
          AudioCodecs.adpcmSamplesPerBlock(w.blockAlign, w.channels)
      else w.data.length / bytesPerFrame
    val durS = if (w.sampleRate > 0) frames.toDouble / w.sampleRate else 0.0
    ContainerMeta("WAV", bytes.length, bitRate(bytes.length, durS),
      Map.empty, Seq(StreamMeta("audio",
        duration = Some(frames.toLong),
        time_base = if (w.sampleRate > 0) Some(1.0 / w.sampleRate) else None,
        duration_seconds = Some(durS), frames = frames,
        codec_context = CodecMeta(codec, "fmt ",
          Some(w.channels), Some(w.sampleRate)),
        width = None, height = None, average_rate = None)))
  }

  private def flacMeta(bytes: Array[Byte]): ContainerMeta = {
    // STREAMINFO is the mandatory first metadata block (34-byte body):
    // minBlock(16) maxBlock(16) minFrame(24) maxFrame(24) rate(20)
    // channels-1(3) bits-1(5) totalSamples(36) md5(128)
    require(bytes.length >= 42, "truncated FLAC")
    def u(off: Int): Long = bytes(off) & 0xffL
    val at = 8 // "fLaC" + block header (4)
    val rate = ((u(at + 10) << 12) | (u(at + 11) << 4) |
      (u(at + 12) >> 4)).toInt
    val channels = (((u(at + 12) >> 1) & 0x7) + 1).toInt
    val bits = ((((u(at + 12) & 1) << 4) | (u(at + 13) >> 4)) + 1).toInt
    val total = ((u(at + 13) & 0xf) << 32) | (u(at + 14) << 24) |
      (u(at + 15) << 16) | (u(at + 16) << 8) | u(at + 17)
    val durS = if (rate > 0) total.toDouble / rate else 0.0
    ContainerMeta("FLAC", bytes.length, bitRate(bytes.length, durS),
      Flac.readTags(bytes).toMap, Seq(StreamMeta("audio",
        duration = Some(total),
        time_base = if (rate > 0) Some(1.0 / rate) else None,
        duration_seconds = Some(durS), frames = total.toInt,
        codec_context = CodecMeta(s"flac_s${bits}", "fLaC",
          Some(channels), Some(rate)),
        width = None, height = None, average_rate = None)))
  }

  private def mp3Meta(bytes: Array[Byte]): ContainerMeta = {
    val m = Mp3.readMeta(bytes)
    ContainerMeta("MP3", bytes.length,
      Some(math.round(m.bitrate_kbps * 1000)),
      Mp3.readTags(bytes).toMap, Seq(StreamMeta("audio",
        duration = Some(m.samples),
        time_base = if (m.sample_rate > 0) Some(1.0 / m.sample_rate) else None,
        duration_seconds = Some(m.duration_s), frames = m.frames,
        codec_context = CodecMeta(s"mp3_l${m.layer}", m.version,
          Some(m.channels), Some(m.sample_rate)),
        width = None, height = None, average_rate = None)))
  }

  /** The sniffed `get_metadata` column op (nested struct column). */
  val containerMetadata = udf { (bytes: Array[Byte]) => containerMeta(bytes) }
}
