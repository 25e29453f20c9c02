package graft.functions

import java.io.ByteArrayOutputStream

/** Pure-JVM MPEG audio (MP3) frame-level parsing: sync walk, header
  * decode, ID3v2 skip, Xing/Info VBR detection, per-frame loudness
  * profile, and a structural frame writer for fixtures (the reference
  * reads MP3 through pyav/libav — `functions/audio.py`; here the
  * container/framing layer is fully implemented from the public
  * ISO/IEC 11172-3 / 13818-3 header grammar).
  *
  * What is and isn't here (the honest boundary, mirrored in COVERAGE):
  * header/side-info/bitrate/duration/VBR parsing is spec-complete for
  * MPEG-1/2/2.5 Layers I–III and works on real-world files; full
  * Layer III PCM reconstruction (Huffman tables, synthesis window) is
  * adjudicated — those static spec tables cannot be verified in this
  * offline environment, and a silently wrong table corrupts audio. The
  * per-frame `global_gain` loudness proxy gives splitting/segmentation
  * (the audio_splitter shape) WITHOUT full decode: it reads only side
  * info, so profiling a 100 TB corpus is a map-only column op that
  * never inflates PCM.
  */
object Mp3 {

  /** kbps by (versionRow, layerRow, bitrateIndex 1..14); row 0 = MPEG1. */
  private[functions] val BitrateKbps: Array[Array[Array[Int]]] = Array(
    Array( // MPEG1: L1, L2, L3
      Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
    Array( // MPEG2/2.5: L1, L2+L3 share a row
      Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  private[functions] val SampleRates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  /** One parsed frame: absolute position, byte length, and the header
    * fields downstream metadata/profiling needs.
    */
  final case class FrameInfo(
      offset: Int, length: Int, versionBits: Int, layer: Int,
      bitrateKbps: Int, sampleRate: Int, channels: Int,
      samplesPerFrame: Int, hasCrc: Boolean) {
    def versionName: String = versionBits match {
      case 3 => "MPEG1"
      case 2 => "MPEG2"
      case 0 => "MPEG2.5"
      case _ => "reserved"
    }
  }

  private def parseHeader(bytes: Array[Byte], pos: Int): Option[FrameInfo] = {
    if (pos + 4 > bytes.length) return None
    val h = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
      ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None // 11-bit sync
    val versionBits = (h >>> 19) & 3
    if (versionBits == 1) return None // reserved
    val layerBits = (h >>> 17) & 3
    if (layerBits == 0) return None // reserved
    val layer = 4 - layerBits // 3→L1, 2→L2, 1→L3
    val hasCrc = ((h >>> 16) & 1) == 0
    val brIdx = (h >>> 12) & 0xf
    if (brIdx == 0 || brIdx == 15) return None // free-format unsupported
    val srIdx = (h >>> 10) & 3
    if (srIdx == 3) return None
    val padding = (h >>> 9) & 1
    val mode = (h >>> 6) & 3
    val channels = if (mode == 3) 1 else 2
    val vRow = if (versionBits == 3) 0 else 1
    val kbps = BitrateKbps(vRow)(layer - 1)(brIdx - 1)
    val srBase = SampleRates(versionBits)(srIdx)
    val (spf, len) = layer match {
      case 1 => (384, (12 * kbps * 1000 / srBase + padding) * 4)
      case 2 => (1152, 144 * kbps * 1000 / srBase + padding)
      case 3 =>
        if (versionBits == 3) (1152, 144 * kbps * 1000 / srBase + padding)
        else (576, 72 * kbps * 1000 / srBase + padding)
    }
    if (len < 4 || pos + len > bytes.length) return None
    Some(FrameInfo(pos, len, versionBits, layer, kbps, srBase, channels,
      spf, hasCrc))
  }

  /** Bytes consumed by an ID3v2 tag at position 0 (0 if none). */
  private def id3v2Size(bytes: Array[Byte]): Int = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return 0
    // syncsafe 28-bit size, excludes the 10-byte header
    val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    10 + size + (if ((bytes(5) & 0x10) != 0) 10 else 0) // footer flag
  }

  // ------------------------------------------------------------ ID3 tags

  /** Friendly name for the well-known ID3v2.3/2.4 (4-char) and v2.2
    * (3-char) text-frame ids; other `T…` frames keep their raw id.
    */
  private val FrameNames = Map(
    "TIT2" -> "title", "TT2" -> "title",
    "TPE1" -> "artist", "TP1" -> "artist",
    "TALB" -> "album", "TAL" -> "album",
    "TDRC" -> "date", "TYER" -> "date", "TYE" -> "date",
    "TCON" -> "genre", "TCO" -> "genre",
    "TRCK" -> "track", "TRK" -> "track",
    "TSSE" -> "encoder", "TSS" -> "encoder")

  private def decodeText(raw: Array[Byte]): String = {
    if (raw.isEmpty) return ""
    val enc = raw(0) & 0xff
    val body = java.util.Arrays.copyOfRange(raw, 1, raw.length)
    val cs = enc match {
      case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
      case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-aware
      case 2 => java.nio.charset.StandardCharsets.UTF_16BE
      case _ => java.nio.charset.StandardCharsets.UTF_8
    }
    new String(body, cs).takeWhile(_ != '\u0000').trim
  }

  /** (name, value) text tags out of the leading ID3v2 tag (v2.2 3-char
    * and v2.3/2.4 4-char frames, unsynchronization undone, extended
    * header skipped), falling back to a trailing 128-byte ID3v1 block
    * when no v2 text frames exist. Missing/absent tags → empty.
    */
  def readTags(bytes: Array[Byte]): Seq[(String, String)] = {
    if (bytes == null || bytes.length < 10) return readId3v1(bytes)
    if (!(bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'))
      return readId3v1(bytes)
    val major = bytes(3) & 0xff
    val flags = bytes(5) & 0xff
    val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    var body = java.util.Arrays.copyOfRange(bytes, 10,
      math.min(10 + size, bytes.length))
    if ((flags & 0x80) != 0) { // unsynchronization: FF 00 → FF
      val out = new ByteArrayOutputStream(body.length)
      var i = 0
      while (i < body.length) {
        out.write(body(i))
        if ((body(i) & 0xff) == 0xff && i + 1 < body.length &&
          body(i + 1) == 0) i += 1
        i += 1
      }
      body = out.toByteArray
    }
    val idLen = if (major <= 2) 3 else 4
    val szLen = if (major <= 2) 3 else 4
    val flagLen = if (major <= 2) 0 else 2
    var pos = 0
    if (major >= 3 && (flags & 0x40) != 0 && body.length >= 4) {
      // extended header: leading 32-bit size. v2.3 stores it plain
      // big-endian and EXCLUDES its own 4 bytes; v2.4 stores it
      // SYNCSAFE and includes them — both advance past the block.
      val ehSize =
        if (major == 3)
          ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
            ((body(2) & 0xff) << 8) | (body(3) & 0xff)
        else
          ((body(0) & 0x7f) << 21) | ((body(1) & 0x7f) << 14) |
            ((body(2) & 0x7f) << 7) | (body(3) & 0x7f)
      pos = if (major == 3) 4 + ehSize else ehSize
    }
    val out = Seq.newBuilder[(String, String)]
    while (pos + idLen + szLen + flagLen <= body.length &&
      body(pos) != 0) {
      val id = new String(body, pos, idLen, "US-ASCII")
      val fsz =
        if (major <= 2)
          ((body(pos + 3) & 0xff) << 16) | ((body(pos + 4) & 0xff) << 8) |
            (body(pos + 5) & 0xff)
        else if (major == 3)
          ((body(pos + 4) & 0xff) << 24) | ((body(pos + 5) & 0xff) << 16) |
            ((body(pos + 6) & 0xff) << 8) | (body(pos + 7) & 0xff)
        else // v2.4: syncsafe
          ((body(pos + 4) & 0x7f) << 21) | ((body(pos + 5) & 0x7f) << 14) |
            ((body(pos + 6) & 0x7f) << 7) | (body(pos + 7) & 0x7f)
      val at = pos + idLen + szLen + flagLen
      if (fsz < 0 || at + fsz > body.length) pos = body.length
      else {
        if (id.startsWith("T") && fsz > 0)
          out += ((FrameNames.getOrElse(id, id),
            decodeText(java.util.Arrays.copyOfRange(body, at, at + fsz))))
        pos = at + fsz
      }
    }
    val v2 = out.result().filter(_._2.nonEmpty)
    if (v2.nonEmpty) v2 else readId3v1(bytes)
  }

  /** Trailing 128-byte ID3v1 block (title/artist/album/year). */
  private def readId3v1(bytes: Array[Byte]): Seq[(String, String)] = {
    if (bytes == null || bytes.length < 128) return Seq.empty
    val at = bytes.length - 128
    if (!(bytes(at) == 'T' && bytes(at + 1) == 'A' && bytes(at + 2) == 'G'))
      return Seq.empty
    def field(off: Int, len: Int): String =
      new String(bytes, at + off, len,
        java.nio.charset.StandardCharsets.ISO_8859_1)
        .takeWhile(_ != '\u0000').trim
    Seq("title" -> field(3, 30), "artist" -> field(33, 30),
      "album" -> field(63, 30), "date" -> field(93, 4))
      .filter(_._2.nonEmpty)
  }

  /** An ID3v2.3 tag block holding the given text tags (friendly names
    * from `FrameNames` or raw 4-char frame ids), UTF-8 encoded — the
    * fixture writer `readTags` round-trips against.
    */
  def writeId3v2(tags: Seq[(String, String)]): Array[Byte] = {
    val inv = FrameNames.collect { case (id, nm) if id.length == 4 => nm -> id }
    val frames = new ByteArrayOutputStream()
    tags.foreach { case (name, value) =>
      val id = inv.getOrElse(name,
        { require(name.length == 4 && name.startsWith("T"),
            s"unknown tag '$name' (use a friendly name or a T… frame id)")
          name })
      val text = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      frames.write(id.getBytes("US-ASCII"))
      val fsz = text.length + 1 // encoding byte
      frames.write((fsz >> 24) & 0xff); frames.write((fsz >> 16) & 0xff)
      frames.write((fsz >> 8) & 0xff); frames.write(fsz & 0xff)
      frames.write(0); frames.write(0) // frame flags
      frames.write(3) // UTF-8
      frames.write(text)
    }
    val body = frames.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("ID3".getBytes); out.write(3); out.write(0); out.write(0)
    val sz = body.length
    out.write((sz >> 21) & 0x7f); out.write((sz >> 14) & 0x7f)
    out.write((sz >> 7) & 0x7f); out.write(sz & 0x7f)
    out.write(body)
    out.toByteArray
  }

  /** Every frame in stream order (ID3v2 skipped; resyncs across junk;
    * an ID3v1 'TAG' trailer is ignored).
    */
  def frames(bytes: Array[Byte]): Seq[FrameInfo] = {
    require(bytes != null && bytes.length >= 4, "not an MP3 payload")
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameInfo]
    var pos = id3v2Size(bytes)
    while (pos + 4 <= bytes.length) {
      parseHeader(bytes, pos) match {
        case Some(f) => out += f; pos += f.length
        case None => pos += 1 // resync
      }
    }
    out.toSeq
  }

  /** `true` if the payload starts with ID3v2 or a valid frame followed by
    * another valid frame (two-header confirmation kills false syncs).
    */
  def isMp3(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 4) return false
    if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') return true
    parseHeader(bytes, 0).exists(f =>
      f.offset + f.length == bytes.length ||
        parseHeader(bytes, f.offset + f.length).isDefined)
  }

  final case class Mp3Meta(
      version: String, layer: Int, bitrate_kbps: Double, sample_rate: Int,
      channels: Int, frames: Int, samples: Long, duration_s: Double,
      vbr: Boolean, format: String = "MP3")

  /** Xing/Info frame count, if the first frame carries a VBR header. */
  private def xingFrames(bytes: Array[Byte], f: FrameInfo): Option[(Int, Boolean)] = {
    val sideInfo =
      if (f.versionBits == 3) { if (f.channels == 1) 17 else 32 }
      else { if (f.channels == 1) 9 else 17 }
    val at = f.offset + 4 + (if (f.hasCrc) 2 else 0) + sideInfo
    if (at + 8 > bytes.length) return None
    val tag = new String(bytes, at, 4, "US-ASCII")
    if (tag != "Xing" && tag != "Info") return None
    val flags = ((bytes(at + 4) & 0xff) << 24) | ((bytes(at + 5) & 0xff) << 16) |
      ((bytes(at + 6) & 0xff) << 8) | (bytes(at + 7) & 0xff)
    if ((flags & 1) == 0) return None
    val n = ((bytes(at + 8) & 0xff) << 24) | ((bytes(at + 9) & 0xff) << 16) |
      ((bytes(at + 10) & 0xff) << 8) | (bytes(at + 11) & 0xff)
    Some((n, tag == "Xing")) // Xing = VBR, Info = CBR-written-by-lame
  }

  /** Stream metadata from the frame walk: exact frame/sample counts,
    * duration from samples/rate, mean bitrate, VBR from header variance
    * or a Xing tag. Never inflates audio.
    */
  def readMeta(bytes: Array[Byte]): Mp3Meta = {
    val fs = frames(bytes)
    require(fs.nonEmpty, "no MPEG audio frames found")
    val f0 = fs.head
    val xing = xingFrames(bytes, f0)
    // a Xing/Info header frame is metadata, not audio — exclude it
    val audioFrames = if (xing.isDefined) fs.drop(1) else fs
    val n = audioFrames.length
    val samples = audioFrames.map(_.samplesPerFrame.toLong).sum
    val durS = if (f0.sampleRate > 0) samples.toDouble / f0.sampleRate else 0.0
    val meanKbps =
      if (durS > 0) audioFrames.map(_.length.toLong).sum * 8.0 / durS / 1000.0
      else f0.bitrateKbps.toDouble
    val vbr = xing.map(_._2)
      .getOrElse(audioFrames.map(_.bitrateKbps).distinct.length > 1)
    Mp3Meta(f0.versionName, f0.layer, math.rint(meanKbps * 10) / 10,
      f0.sampleRate, f0.channels, n, samples, durS, vbr)
  }

  // ----------------------------------------------------- loudness profile

  /** global_gain bit offsets inside the Layer III side info, relative to
    * the side-info start: MPEG1 blocks are 59 bits per granule-channel
    * after main_data_begin(9)+private+scfsi; MPEG2/2.5 are 63 bits per
    * channel after main_data_begin(8)+private. global_gain sits 21 bits
    * into each block (after part2_3_length(12)+big_values(9)).
    */
  private def gainBitOffsets(f: FrameInfo): Seq[Int] =
    if (f.layer != 3) Seq.empty
    else if (f.versionBits == 3) {
      val base = 9 + (if (f.channels == 1) 5 else 3) + 4 * f.channels
      (0 until 2 * f.channels).map(i => base + i * 59 + 21)
    } else {
      val base = 8 + (if (f.channels == 1) 1 else 2)
      (0 until f.channels).map(i => base + i * 63 + 21)
    }

  private def bitsAt(bytes: Array[Byte], baseByte: Int, bitOff: Int,
      nBits: Int): Int = {
    var v = 0
    var i = 0
    while (i < nBits) {
      val b = bitOff + i
      val byteAt = baseByte + (b >> 3)
      val bit = (bytes(byteAt) >> (7 - (b & 7))) & 1
      v = (v << 1) | bit
      i += 1
    }
    v
  }

  /** Per-frame loudness proxy: mean `global_gain` over granules/channels
    * (Layer III side info — 0..255, log-domain; silence encodes with
    * very low gains). One (frame_idx, time_s, gain) triple per frame.
    */
  def frameGains(bytes: Array[Byte]): Seq[(Int, Double, Double)] = {
    val fs = frames(bytes)
    fs.zipWithIndex.flatMap { case (f, i) =>
      val offs = gainBitOffsets(f)
      if (offs.isEmpty) None
      else {
        val sideStart = f.offset + 4 + (if (f.hasCrc) 2 else 0)
        val gains = offs.map(o => bitsAt(bytes, sideStart, o, 8).toDouble)
        val t = fs.take(i).map(_.samplesPerFrame.toLong).sum.toDouble /
          math.max(f.sampleRate, 1)
        Some((i, t, gains.sum / gains.length))
      }
    }
  }

  /** Silence-bounded segments over the gain profile (the audio_splitter
    * shape without PCM decode): maximal runs of frames with gain >
    * `threshold`, at least `minFrames` long, as (start_s, end_s) pairs.
    */
  def loudSegments(bytes: Array[Byte], threshold: Double,
      minFrames: Int): Seq[(Double, Double)] = {
    val gs = frameGains(bytes)
    if (gs.isEmpty) return Seq.empty
    val perFrameS = {
      val fs = frames(bytes)
      fs.head.samplesPerFrame.toDouble / math.max(fs.head.sampleRate, 1)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var runStart = -1
    gs.foreach { case (i, t, g) =>
      if (g > threshold) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) {
        if (i - runStart >= minFrames)
          out += ((runStart * perFrameS, i * perFrameS))
        runStart = -1
      }
    }
    if (runStart >= 0 && gs.length - runStart >= minFrames)
      out += ((runStart * perFrameS, gs.length * perFrameS))
    out.toSeq
  }

  // ----------------------------------------------------- fixture writer

  /** Structurally valid MPEG1 Layer III frames for fixtures: correct
    * header (CRC-less, mono/stereo, chosen bitrate/rate indices) and a
    * side info carrying the requested per-frame `global_gain` in every
    * granule-channel block; main data zero-filled. Real parsers (this
    * one included) read headers/side info off these exactly; the zeroed
    * main data encodes digital silence under any conformant decoder
    * (all-zero Huffman regions decode to zero spectral values).
    */
  def writeTestStream(gains: Seq[Int], bitrateIdx: Int = 9, srIdx: Int = 0,
      mono: Boolean = true, id3: Boolean = false): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrateIdx $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"srIdx $srIdx")
    require(gains.forall(g => g >= 0 && g <= 255), "gains are 8-bit")
    val kbps = BitrateKbps(0)(2)(bitrateIdx - 1)
    val sr = SampleRates(3)(srIdx)
    val frameLen = 144 * kbps * 1000 / sr // no padding
    val channels = if (mono) 1 else 2
    val out = new ByteArrayOutputStream()
    if (id3) { // minimal empty ID3v2.3 tag with a 16-byte body
      out.write("ID3".getBytes); out.write(3); out.write(0); out.write(0)
      out.write(0); out.write(0); out.write(0); out.write(16)
      out.write(new Array[Byte](16))
    }
    gains.foreach { gain =>
      val frame = new Array[Byte](frameLen)
      // header: sync + MPEG1(11) + LIII(01) + no-CRC(1) + br + sr +
      // nopad/priv(00) + mode + modeext/copy/orig/emph(0000 00)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte
      frame(2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
      frame(3) = (if (mono) 0xc0 else 0x00).toByte
      // side info: all zero except global_gain in each granule-channel
      val f = parseHeader(frame, 0).getOrElse(sys.error("bad fixture header"))
      val sideStart = 4
      gainBitOffsets(f).foreach { bitOff =>
        var i = 0
        while (i < 8) {
          val b = bitOff + i
          if (((gain >> (7 - i)) & 1) == 1)
            frame(sideStart + (b >> 3)) =
              (frame(sideStart + (b >> 3)) | (1 << (7 - (b & 7)))).toByte
          i += 1
        }
      }
      out.write(frame)
    }
    out.toByteArray
  }
}
