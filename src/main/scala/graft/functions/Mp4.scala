package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO-BMFF (MP4) container demux + mux (reference
  * `functions/video/iterators.py:41-123` and `iterators/video.py` run on
  * arbitrary containers via pyav; this is the MP4 sibling of the `Avi`
  * RIFF path, built directly on the public ISO/IEC 14496-12 box grammar —
  * `ftyp/moov/trak/mdia/minf/stbl` with the classic
  * `stsd/stts/stsc/stsz/stco|co64` sample-table walk).
  *
  * Demux is header-only until samples are pulled: `readMeta` touches just
  * the `moov` tree (never `mdat`), so metadata over a 100 TB corpus reads
  * a few KB per file. Codec naming covers the real-world sample entries
  * (`avc1/hvc1/hev1/vp09/av01/jpeg/mp4v/mp4a/.mp3/sowt/twos/lpcm`, with
  * `esds` objectTypeIndication resolution for the mp4v/mp4a wrappers);
  * DECODE support is jpeg (video) + pcm (audio) + the mp3 elementary
  * stream hand-off — H.264/AAC decode is an explicit COVERAGE
  * adjudication, not an implicit absence.
  *
  * The muxer writes `ftyp | mdat | moov` (offsets known before the moov
  * tables are emitted) with MJPEG video as a `jpeg` visual sample entry
  * (one JPEG per sample, the QuickTime MJPEG convention) and audio as
  * `sowt` PCM-16LE or a `.mp3` track (one MPEG frame per sample) — the
  * re-mux twin the q167 gate and the AVI interop tests ride.
  */
object Mp4 {

  // ----------------------------------------------------------- box reader

  /** (type, payloadFrom, payloadUntil) for each box in [from, until). */
  private[functions] def boxes(b: ByteBuffer, from: Int, until: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var pos = from
    while (pos + 8 <= until) {
      val size32 = b.getInt(pos).toLong & 0xffffffffL
      val typ = fourcc(b, pos + 4)
      val (payload, end) =
        if (size32 == 1L && pos + 16 <= until) {
          val size64 = b.getLong(pos + 8)
          (pos + 16, pos + size64)
        } else if (size32 == 0L) (pos + 8, until.toLong) // box runs to EOF
        else (pos + 8, pos + size32)
      if (size32 != 1L && size32 != 0L && size32 < 8) return out.toSeq // corrupt
      if (end > until || end < payload) return out.toSeq
      out += ((typ, payload, end.toInt))
      pos = end.toInt
    }
    out.toSeq
  }

  private[functions] def fourcc(b: ByteBuffer, pos: Int): String = {
    val a = new Array[Byte](4)
    var i = 0
    while (i < 4) { a(i) = b.get(pos + i); i += 1 }
    // ISO-8859-1, not ASCII: iTunes-style tag atoms use © (0xA9)
    new String(a, "ISO-8859-1")
  }

  private[functions] def child(b: ByteBuffer, from: Int, until: Int,
      typ: String): Option[(Int, Int)] =
    boxes(b, from, until).collectFirst { case (t, f, u) if t == typ => (f, u) }

  private[functions] def children(b: ByteBuffer, from: Int, until: Int,
      typ: String): Seq[(Int, Int)] =
    boxes(b, from, until).collect { case (t, f, u) if t == typ => (f, u) }

  /** `true` for plausible ISO-BMFF payloads (box 0 is `ftyp`/`moov`/
    * `mdat`/`free`/`wide`/`skip` — real files open with one of these —
    * or the DASH media-segment leaders `styp`/`moof`/`sidx`, so a raw
    * segment without its init segment reaches the informative error
    * rather than "not an MP4").
    */
  def isMp4(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 12) return false
    val t = new String(bytes, 4, 4, "US-ASCII")
    Set("ftyp", "moov", "mdat", "free", "wide", "skip",
      "styp", "moof", "sidx")(t)
  }

  /** Top-level box types in file order (`ftyp moov moof mdat …`) — the
    * container-layout fingerprint (flat vs fragmented is visible here).
    */
  def topLevelBoxTypes(bytes: Array[Byte]): Seq[String] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    boxes(b, 0, bytes.length).map(_._1)
  }

  // -------------------------------------------------------- track parsing

  /** One fully resolved media track: identity, codec, geometry/audio
    * shape, timing, and the absolute (offset, size, delta) of every
    * sample — everything downstream ops need, computed once.
    */
  final case class Track(
      trackId: Int, handler: String, codec: String, entryFourcc: String,
      width: Int, height: Int, channels: Int, sampleRate: Int,
      timescale: Long, mediaDuration: Long,
      sampleOffsets: Array[Long], sampleSizes: Array[Int],
      sampleDeltas: Array[Int]) {
    def nSamples: Int = sampleSizes.length
    def durationS: Double =
      if (timescale > 0) mediaDuration.toDouble / timescale else 0.0
    /** samples/s from the dominant stts delta (fps for video tracks) */
    def rate: Double = {
      if (sampleDeltas.isEmpty || timescale == 0) return 0.0
      val delta = sampleDeltas.groupBy(identity).maxBy(_._2.length)._1
      if (delta > 0) timescale.toDouble / delta else 0.0
    }
  }

  private[functions] def fullBoxVersion(b: ByteBuffer, from: Int): Int = b.get(from) & 0xff

  /** Upper bound on any expanded sample count — far above real files
    * (100M+ samples) but small enough that a corrupt count field fails
    * fast instead of driving an uncatchable multi-GB allocation.
    */
  private val MaxSamples = 1 << 27

  /** map a sample-entry fourcc (+ optional esds OTI) to a codec name */
  private[functions] def codecName(entry: String, oti: Int): String = entry match {
    case "avc1" | "avc3" => "h264"
    case "hvc1" | "hev1" => "hevc"
    case "vp09" => "vp9"
    case "vp08" => "vp8"
    case "av01" => "av1"
    case "jpeg" | "mjpa" => "jpeg"
    case "sowt" | "twos" | "lpcm" | "raw " => "pcm"
    case ".mp3" | "mp3 " => "mp3"
    case "ac-3" => "ac3"
    case "Opus" => "opus"
    case "fLaC" => "flac"
    case "wvtt" => "webvtt"
    case "tx3g" => "mov_text"
    case "stpp" => "ttml"
    case "mp4v" => oti match {
      case 0x6C => "jpeg"
      case 0x20 => "mpeg4"
      case 0x61 | 0x60 | 0x62 | 0x63 | 0x64 | 0x65 => "mpeg2"
      case _ => "mp4v"
    }
    case "mp4a" => oti match {
      case 0x40 | 0x66 | 0x67 | 0x68 => "aac"
      case 0x69 | 0x6B => "mp3"
      case _ => "mp4a"
    }
    case other => other.trim
  }

  /** objectTypeIndication out of an `esds` box payload (walks the
    * MPEG-4 descriptor tags: 0x03 ES → 0x04 DecoderConfig, whose first
    * byte is the OTI; descriptor lengths are 7-bit big-endian varints).
    */
  private def esdsOti(b: ByteBuffer, from: Int, until: Int): Int = {
    var pos = from + 4 // skip FullBox version/flags
    def readLen(): Int = {
      var len = 0; var more = true
      while (more && pos < until) {
        val v = b.get(pos) & 0xff; pos += 1
        len = (len << 7) | (v & 0x7f); more = (v & 0x80) != 0
      }
      len
    }
    while (pos < until) {
      val tag = b.get(pos) & 0xff; pos += 1
      val len = readLen()
      val bodyEnd = pos + len
      tag match {
        case 0x03 => // ES_Descriptor: ES_ID(2) + flags(1), then nested
          pos += 3
          val flags = b.get(pos - 1) & 0xff
          if ((flags & 0x80) != 0) pos += 2 // dependsOn_ES_ID
          if ((flags & 0x40) != 0) pos += 1 + (b.get(pos) & 0xff) // URL
          if ((flags & 0x20) != 0) pos += 2 // OCR_ES_ID
        case 0x04 => return b.get(pos) & 0xff // DecoderConfig: OTI first
        case _ => pos = bodyEnd
      }
    }
    0
  }

  /** All media tracks with resolved sample tables. Fragmented files
    * (CMAF/DASH: `moov` holds empty sample tables + `mvex` defaults,
    * samples live in `moof`/`traf`/`trun` runs) are resolved by walking
    * every top-level `moof` and merging its runs into the track arrays,
    * so downstream ops see one uniform Track shape either way. Corrupt
    * tracks (no samples anywhere) come back with empty sample arrays but
    * intact identity, so metadata still reports them.
    */
  def parseTracks(bytes: Array[Byte]): Seq[Track] = {
    require(isMp4(bytes), "not an ISO-BMFF (MP4) payload")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val top = boxes(b, 0, bytes.length)
    val (moovF, moovU) = top.collectFirst { case ("moov", f, u) => (f, u) }
      .getOrElse(sys.error(
        if (top.exists(_._1 == "moof"))
          "media segment without an init segment (moof but no moov)"
        else "no moov box (truncated MP4)"))
    val base = children(b, moovF, moovU, "trak").flatMap {
      case (trakF, trakU) => parseTrak(b, trakF, trakU)
    }
    val moofs = top.collect { case ("moof", f, u) => (f, u) }
    if (moofs.isEmpty) base
    else mergeFragments(b, base, trexDefaults(b, moovF, moovU), moofs)
  }

  // -------------------------------------------------- fragmented (CMAF)

  /** trackId → (default_sample_duration, default_sample_size) out of
    * `moov/mvex/trex` (ISO 14496-12 §8.8.3).
    */
  private def trexDefaults(b: ByteBuffer, moovF: Int,
      moovU: Int): Map[Int, (Int, Int)] =
    child(b, moovF, moovU, "mvex").map { case (f, u) =>
      children(b, f, u, "trex").map { case (tf, _) =>
        (b.getInt(tf + 4), (b.getInt(tf + 12), b.getInt(tf + 16)))
      }.toMap
    }.getOrElse(Map.empty)

  /** Walk every `moof`, resolve each `traf`'s runs to absolute
    * (offset, size, delta) triples, and append them to the matching
    * track. Base-data-offset handling covers the three real-world
    * layouts: explicit `base_data_offset` (tfhd flag 0x01),
    * `default-base-is-moof` (0x020000 — CMAF's required shape), and the
    * spec default (first traf: moof start; later trafs: end of the
    * previous traf's data).
    */
  private def mergeFragments(b: ByteBuffer, base: Seq[Track],
      trex: Map[Int, (Int, Int)],
      moofs: Seq[(Int, Int)]): Seq[Track] = {
    val offs = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    val sizes = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    val deltas = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    def buf[T](m: scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[T]],
        id: Int) = m.getOrElseUpdate(id, scala.collection.mutable.ArrayBuffer.empty[T])

    moofs.foreach { case (moofF, moofU) =>
      // True box start: normally payload-8, but a largesize header puts
      // the payload at boxStart+16 (size32==1, type, size64) — detect it
      // so default-base-is-moof offsets aren't 8 bytes off.
      val moofStart: Long =
        if (moofF >= 16 && b.getInt(moofF - 16) == 1 &&
            fourcc(b, moofF - 12) == "moof") moofF - 16L
        else moofF - 8L
      var prevTrafEnd = -1L      // spec-default base for traf n+1
      children(b, moofF, moofU, "traf").foreach { case (trafF, trafU) =>
        val (tfhdF, _) = child(b, trafF, trafU, "tfhd")
          .getOrElse(sys.error("traf without tfhd"))
        val tfFlags = b.getInt(tfhdF) & 0xffffff
        val trackId = b.getInt(tfhdF + 4)
        var p = tfhdF + 8
        val explicitBase =
          if ((tfFlags & 0x01) != 0) { val v = b.getLong(p); p += 8; Some(v) }
          else None
        if ((tfFlags & 0x02) != 0) p += 4 // sample_description_index
        val defDur =
          if ((tfFlags & 0x08) != 0) { val v = b.getInt(p); p += 4; v }
          else trex.get(trackId).map(_._1).getOrElse(0)
        val defSize =
          if ((tfFlags & 0x10) != 0) { val v = b.getInt(p); p += 4; v }
          else trex.get(trackId).map(_._2).getOrElse(0)
        val baseDataOffset = explicitBase.getOrElse {
          if ((tfFlags & 0x020000) != 0) moofStart            // default-base-is-moof
          else if (prevTrafEnd >= 0) prevTrafEnd              // after prior traf
          else moofStart                                      // first traf default
        }
        var cursor = baseDataOffset
        children(b, trafF, trafU, "trun").foreach { case (trunF, trunU) =>
          val trFlags = b.getInt(trunF) & 0xffffff
          val n = b.getInt(trunF + 4)
          // corrupt-count guard: per-sample fields must fit in the box
          // (4 bytes/field; an all-defaults trun is bounded separately)
          val perSample = Seq(0x100, 0x200, 0x400, 0x800)
            .count(f => (trFlags & f) != 0) * 4
          require(n >= 0 && n <= MaxSamples &&
            (perSample == 0 || 8L + n.toLong * perSample <= trunU - trunF),
            s"corrupt trun: $n samples in ${trunU - trunF} bytes")
          var q = trunF + 8
          if ((trFlags & 0x01) != 0) { cursor = baseDataOffset + b.getInt(q); q += 4 }
          if ((trFlags & 0x04) != 0) q += 4 // first_sample_flags
          var i = 0
          while (i < n) {
            val dur =
              if ((trFlags & 0x100) != 0) { val v = b.getInt(q); q += 4; v }
              else defDur
            val sz =
              if ((trFlags & 0x200) != 0) { val v = b.getInt(q); q += 4; v }
              else defSize
            if ((trFlags & 0x400) != 0) q += 4 // sample_flags
            if ((trFlags & 0x800) != 0) q += 4 // composition offset
            buf(offs, trackId) += cursor
            buf(sizes, trackId) += sz
            buf(deltas, trackId) += dur
            cursor += sz
            i += 1
          }
        }
        prevTrafEnd = cursor
      }
    }

    base.map { t =>
      offs.get(t.trackId) match {
        case None => t
        case Some(o) =>
          val d = deltas(t.trackId)
          val fragDur = d.foldLeft(0L)(_ + _)
          t.copy(
            sampleOffsets = t.sampleOffsets ++ o,
            sampleSizes = t.sampleSizes ++ sizes(t.trackId),
            sampleDeltas = t.sampleDeltas ++ d,
            mediaDuration = math.max(t.mediaDuration,
              t.sampleDeltas.foldLeft(0L)(_ + _) + fragDur))
      }
    }
  }

  private def parseTrak(b: ByteBuffer, trakF: Int, trakU: Int): Option[Track] = {
    val (tkhdF, _) = child(b, trakF, trakU, "tkhd").getOrElse(return None)
    val tkhdV = fullBoxVersion(b, tkhdF)
    // tkhd v0: v/f(4) create(4) mod(4) id(4) …; v1: 8-byte times
    val trackId = if (tkhdV == 1) b.getInt(tkhdF + 20) else b.getInt(tkhdF + 12)
    // width/height: 16.16 fixed, last 8 bytes of the 80/92-byte body
    val tkhdBodyEnd = tkhdF + (if (tkhdV == 1) 96 else 84)
    val width = b.getInt(tkhdBodyEnd - 8) >>> 16
    val height = b.getInt(tkhdBodyEnd - 4) >>> 16

    val (mdiaF, mdiaU) = child(b, trakF, trakU, "mdia").getOrElse(return None)
    val (mdhdF, _) = child(b, mdiaF, mdiaU, "mdhd").getOrElse(return None)
    val mdhdV = fullBoxVersion(b, mdhdF)
    val (timescale, mediaDuration) =
      if (mdhdV == 1) (b.getInt(mdhdF + 20).toLong & 0xffffffffL, b.getLong(mdhdF + 24))
      else (b.getInt(mdhdF + 12).toLong & 0xffffffffL,
        b.getInt(mdhdF + 16).toLong & 0xffffffffL)
    val handler = child(b, mdiaF, mdiaU, "hdlr")
      .map { case (f, _) => fourcc(b, f + 8) }.getOrElse("????")

    val (minfF, minfU) = child(b, mdiaF, mdiaU, "minf").getOrElse(return None)
    val (stblF, stblU) = child(b, minfF, minfU, "stbl").getOrElse(return None)

    // stsd: first sample entry decides the codec
    val (stsdF, stsdU) = child(b, stblF, stblU, "stsd").getOrElse(return None)
    val entries = boxes(b, stsdF + 8, stsdU)
    if (entries.isEmpty) return None
    val (entryTyp, entF, entU) = entries.head
    // sample-entry body: 6 reserved + 2 data_reference_index, then
    // visual (70 bytes to the optional child boxes) or audio (20 bytes)
    val (channels, sampleRate, childBoxFrom) =
      if (handler == "soun") {
        val ch = b.getShort(entF + 16) & 0xffff
        val sr = b.getInt(entF + 24) >>> 16
        (ch, sr, entF + 28)
      } else if (handler == "vide") (0, 0, entF + 78)
      else (0, 0, entF + 8) // plain sample entry (text/subtitle tracks)
    val oti =
      if (childBoxFrom < entU)
        child(b, childBoxFrom, entU, "esds")
          .map { case (f, u) => esdsOti(b, f, u) }.getOrElse(0)
      else 0
    val codec = codecName(entryTyp, oti)

    // Corrupt-input guard for every count-prefixed table below: a
    // flipped byte in a count field must fail fast, not drive a
    // multi-GB allocation (OOM is not catchable) — each count must be
    // JUSTIFIED by the bytes that follow it, and expanded run totals
    // are capped.
    def sane(n: Int, f: Int, u: Int, bytesPer: Int, header: Int): Int = {
      require(n >= 0 && header + n.toLong * bytesPer <= u - f,
        s"corrupt sample table: $n entries in ${u - f} bytes")
      n
    }

    // sample timing: stts runs → per-sample deltas
    val deltas: Array[Int] = child(b, stblF, stblU, "stts").map { case (f, u) =>
      val n = sane(b.getInt(f + 4), f, u, 8, 8)
      var total = 0L
      var i = 0
      while (i < n) {
        total += math.max(b.getInt(f + 8 + i * 8), 0); i += 1
      }
      require(total <= MaxSamples, s"corrupt stts: $total samples")
      val out = Array.newBuilder[Int]
      out.sizeHint(total.toInt)
      i = 0
      while (i < n) {
        val count = b.getInt(f + 8 + i * 8)
        val delta = b.getInt(f + 12 + i * 8)
        var j = 0
        while (j < count) { out += delta; j += 1 }
        i += 1
      }
      out.result()
    }.getOrElse(Array.empty)

    // sample sizes: stsz (uniform or per-sample)
    val sizes: Array[Int] = child(b, stblF, stblU, "stsz").map { case (f, u) =>
      val uniform = b.getInt(f + 4)
      val n = b.getInt(f + 8)
      if (uniform != 0) {
        require(n >= 0 && n <= MaxSamples, s"corrupt stsz: $n samples")
        Array.fill(n)(uniform)
      } else {
        sane(n, f, u, 4, 12)
        Array.tabulate(n)(i => b.getInt(f + 12 + i * 4))
      }
    }.getOrElse(Array.empty)

    // chunk offsets: stco (u32) or co64 (u64)
    val chunkOffsets: Array[Long] =
      child(b, stblF, stblU, "stco").map { case (f, u) =>
        val n = sane(b.getInt(f + 4), f, u, 4, 8)
        Array.tabulate(n)(i => b.getInt(f + 8 + i * 4).toLong & 0xffffffffL)
      }.orElse(child(b, stblF, stblU, "co64").map { case (f, u) =>
        val n = sane(b.getInt(f + 4), f, u, 8, 8)
        Array.tabulate(n)(i => b.getLong(f + 8 + i * 8))
      }).getOrElse(Array.empty)

    // stsc runs → samples-per-chunk for each chunk, then absolute offsets
    val offsets: Array[Long] = {
      val stsc: Seq[(Int, Int)] = child(b, stblF, stblU, "stsc").map { case (f, u) =>
        val n = sane(b.getInt(f + 4), f, u, 12, 8)
        (0 until n).map(i =>
          (b.getInt(f + 8 + i * 12), b.getInt(f + 12 + i * 12)))
      }.getOrElse(Seq.empty)
      val out = new Array[Long](sizes.length)
      var sample = 0
      var run = 0
      var chunk = 1 // 1-based
      while (chunk <= chunkOffsets.length && sample < sizes.length) {
        while (run + 1 < stsc.length && stsc(run + 1)._1 <= chunk) run += 1
        val perChunk = if (stsc.isEmpty) sizes.length else stsc(run)._2
        var off = chunkOffsets(chunk - 1)
        var j = 0
        while (j < perChunk && sample < sizes.length) {
          out(sample) = off
          off += sizes(sample)
          sample += 1; j += 1
        }
        chunk += 1
      }
      out
    }

    Some(Track(trackId, handler, codec, entryTyp, width, height, channels,
      sampleRate, timescale, mediaDuration, offsets, sizes, deltas))
  }

  // ------------------------------------------------------------ tag atoms

  /** iTunes-style tag atom ↔ friendly name (the subset ffprobe surfaces
    * as format tags; © is 0xA9).
    */
  private val TagAtoms = Seq(
    "©nam" -> "title", "©ART" -> "artist", "©alb" -> "album",
    "©day" -> "date", "©gen" -> "genre", "©cmt" -> "comment",
    "©too" -> "encoder", "trkn" -> "track")
  private val TagAtomByName = TagAtoms.map(_.swap).toMap

  /** (name, value) tags out of `moov/udta/meta/ilst` (the iTunes-style
    * metadata the reference surfaces via ffprobe's format tags). `meta`
    * is a FullBox, so its children start 4 bytes in; each ilst item
    * holds a `data` box whose payload is type(4) + locale(4) + value.
    * Text types (1 = UTF-8) decode directly; `trkn`'s binary pair
    * becomes "track" / "track/total". Absent tree → empty.
    */
  def readTags(bytes: Array[Byte]): Seq[(String, String)] = {
    require(isMp4(bytes), "not an ISO-BMFF (MP4) payload")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val atomName = TagAtoms.toMap
    (for {
      (moovF, moovU) <- child(b, 0, bytes.length, "moov").toSeq
      (udtaF, udtaU) <- children(b, moovF, moovU, "udta")
      (metaF, metaU) <- children(b, udtaF, udtaU, "meta")
      (itemTyp, itemF, itemU) <- boxes(b, metaF + 4, metaU)
        .collectFirst { case ("ilst", f, u) => boxes(b, f, u) }
        .getOrElse(Seq.empty)
      (dataF, dataU) <- child(b, itemF, itemU, "data").toSeq
      if dataU - dataF >= 8
    } yield {
      val dtype = b.getInt(dataF)
      val value =
        if (dtype == 1) { // UTF-8 text
          val raw = new Array[Byte](dataU - dataF - 8)
          var i = 0
          while (i < raw.length) { raw(i) = b.get(dataF + 8 + i); i += 1 }
          new String(raw, java.nio.charset.StandardCharsets.UTF_8)
        } else if (itemTyp == "trkn" && dataU - dataF >= 14) {
          val track = b.getShort(dataF + 10) & 0xffff
          val total = b.getShort(dataF + 12) & 0xffff
          if (total > 0) s"$track/$total" else s"$track"
        } else ""
      (atomName.getOrElse(itemTyp, itemTyp), value)
    }).filter(_._2.nonEmpty)
  }

  /** A `udta(meta(hdlr, ilst))` box for the muxer: friendly tag names
    * (see `TagAtoms`) plus "track" (as `trkn`, "n" or "n/total").
    */
  private def udtaBox(tags: Seq[(String, String)]): Array[Byte] = {
    val items = tags.map { case (name, value) =>
      if (name == "track") {
        val parts = value.split('/')
        val track = parts(0).trim.toInt
        val total = if (parts.length > 1) parts(1).trim.toInt else 0
        box("trkn", box("data", u32(0), u32(0),
          u16(0), u16(track), u16(total), u16(0)))
      } else {
        val atom = TagAtomByName.getOrElse(name,
          sys.error(s"unknown tag '$name' (use: " +
            s"${TagAtomByName.keys.toSeq.sorted.mkString("/")}/track)"))
        box(atom, box("data", u32(1), u32(0),
          value.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
    }
    val hdlr = fullBox("hdlr", 0, 0,
      u32(0), "mdir".getBytes("ISO-8859-1"), "appl".getBytes("ISO-8859-1"),
      u32(0), u32(0), Array[Byte](0))
    box("udta", fullBox("meta", 0, 0, hdlr,
      box("ilst", items: _*)))
  }

  // ------------------------------------------------------------ demux API

  /** Video-track metadata in the shared `AviMeta` shape (format="MP4") —
    * moov-only, never touches `mdat`. Audio-only files report the audio
    * track's rate/duration with zero geometry.
    */
  def readMeta(bytes: Array[Byte]): Avi.AviMeta = {
    val tracks = parseTracks(bytes)
    tracks.find(_.handler == "vide") match {
      case Some(v) =>
        Avi.AviMeta(v.width, v.height, v.rate, v.nSamples, v.durationS,
          v.codec.toUpperCase, "MP4")
      case None =>
        val a = tracks.find(_.handler == "soun")
          .getOrElse(sys.error("MP4 has no video or audio track"))
        Avi.AviMeta(0, 0, 0.0, a.nSamples, a.durationS,
          a.codec.toUpperCase, "MP4")
    }
  }

  /** Fail fast on out-of-file sample spans (a corrupt co64 entry or
    * tfhd base_data_offset must not wrap through `.toInt` into a
    * plausible-but-wrong index).
    */
  private def checkedOffset(off: Long, size: Int, fileLen: Int): Int = {
    require(off >= 0 && size >= 0 && off + size <= fileLen,
      s"corrupt sample span: [$off, ${off + size}) in $fileLen-byte file")
    off.toInt
  }

  private def samplesOf(bytes: Array[Byte], t: Track): Seq[Array[Byte]] =
    (0 until t.nSamples).map { i =>
      val off = checkedOffset(t.sampleOffsets(i), t.sampleSizes(i), bytes.length)
      java.util.Arrays.copyOfRange(bytes, off, off + t.sampleSizes(i))
    }

  /** JPEG payloads of the video track (requires the jpeg codec — the
    * decode boundary; H.264 etc. fail fast with the codec named).
    */
  def readFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val v = parseTracks(bytes).find(_.handler == "vide")
      .getOrElse(sys.error("MP4 has no video track"))
    require(v.codec == "jpeg",
      s"unsupported video decode codec '${v.codec}' (jpeg/MJPEG only; " +
        "see COVERAGE adjudication)")
    samplesOf(bytes, v)
  }

  /** PCM-16 samples of the first audio track: `sowt` (LE) / `twos` (BE) /
    * `lpcm`/`raw ` decode natively; an mp3 track returns None here (use
    * `extractAudioStream` for the elementary stream).
    */
  def readAudio(bytes: Array[Byte]): Option[(Array[Short], Int)] = {
    val a = parseTracks(bytes).find(_.handler == "soun").getOrElse(return None)
    if (a.codec != "pcm") return None
    // coalesce contiguous sample runs (PCM samples are 2 bytes each —
    // per-sample copies would allocate one tiny array per audio sample)
    val raw = {
      val out = new ByteArrayOutputStream()
      var i = 0
      while (i < a.nSamples) {
        val start = a.sampleOffsets(i)
        var end = start + a.sampleSizes(i)
        while (i + 1 < a.nSamples && a.sampleOffsets(i + 1) == end) {
          i += 1; end += a.sampleSizes(i)
        }
        out.write(bytes, checkedOffset(start, (end - start).toInt, bytes.length),
          (end - start).toInt)
        i += 1
      }
      out.toByteArray
    }
    // sowt is LE, twos is BE; lpcm defaults LE here
    val order = if (a.entryFourcc == "twos") ByteOrder.BIG_ENDIAN
      else ByteOrder.LITTLE_ENDIAN
    val samples = new Array[Short](raw.length / 2)
    ByteBuffer.wrap(raw).order(order).asShortBuffer().get(samples)
    Some((samples, a.sampleRate))
  }

  /** (codec, concatenated elementary stream) of the first NON-pcm audio
    * track — the mp3 hand-off (`Mp3` parses/decodes the result), and the
    * honest boundary for aac/opus (stream extraction works; decode is
    * adjudicated).
    */
  def extractAudioStream(bytes: Array[Byte]): Option[(String, Array[Byte])] =
    parseTracks(bytes).find(t => t.handler == "soun" && t.codec != "pcm")
      .map(t => (t.codec, samplesOf(bytes, t).toArray.flatten))

  /** Cues of the first subtitle track — WebVTT (ISO 14496-30: `wvtt`
    * entry; each sample is a `vttc(payl)` cue box or a `vtte` gap box)
    * or QuickTime/iTunes `tx3g` mov_text (each sample is a 16-bit text
    * length + UTF-8 text; empty text = gap), timed by the stts deltas.
    * Returns (start_s, end_s, text) in timeline order; no subtitle
    * track → empty.
    */
  def readSubtitles(bytes: Array[Byte]): Seq[(Double, Double, String)] = {
    val track = parseTracks(bytes).find(t =>
      Set("text", "sbtl", "subt")(t.handler) &&
        Set("webvtt", "mov_text")(t.codec))
      .getOrElse(return Seq.empty)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val ts = math.max(1L, track.timescale).toDouble
    val out = Seq.newBuilder[(Double, Double, String)]
    var time = 0L
    var i = 0
    while (i < track.nSamples) {
      val sz = track.sampleSizes(i)
      val off = checkedOffset(track.sampleOffsets(i), sz, bytes.length)
      val delta = if (i < track.sampleDeltas.length) track.sampleDeltas(i) else 0
      if (track.codec == "webvtt") {
        boxes(b, off, off + sz).foreach {
          case ("vttc", f, u) =>
            child(b, f, u, "payl").foreach { case (pf, pu) =>
              val text = new String(bytes, pf, pu - pf,
                java.nio.charset.StandardCharsets.UTF_8)
              out += ((time / ts, (time + delta) / ts, text))
            }
          case _ => () // vtte gaps and foreign boxes
        }
      } else if (sz >= 2) { // mov_text: u16 length + UTF-8 (+ style boxes)
        val len = math.min(b.getShort(off) & 0xffff, sz - 2)
        if (len > 0) {
          val text = new String(bytes, off + 2, len,
            java.nio.charset.StandardCharsets.UTF_8)
          out += ((time / ts, (time + delta) / ts, text))
        }
      }
      time += delta
      i += 1
    }
    out.result()
  }

  /** One `sidx` segment reference: byte size of the referenced
    * (moof+mdat) span, its duration in seconds, and whether it starts
    * with a stream access point.
    */
  final case class SegmentRef(sizeBytes: Long, durationS: Double,
      startsWithSap: Boolean)

  /** The `sidx` segment index of a fragmented file (ISO 14496-12
    * §8.16.3) — the byte-range map DASH players (and a 100 TB range-read
    * planner) use to fetch one media segment without scanning the file.
    * Empty when the file carries no sidx.
    */
  def segmentIndex(bytes: Array[Byte]): Seq[SegmentRef] = {
    require(isMp4(bytes), "not an ISO-BMFF (MP4) payload")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    boxes(b, 0, bytes.length).collectFirst { case ("sidx", f, u) =>
      val version = fullBoxVersion(b, f)
      val timescale = b.getInt(f + 8).toLong & 0xffffffffL
      // earliest_presentation_time + first_offset: 32-bit (v0) / 64-bit
      val refsAt = f + (if (version == 0) 20 else 28) + 4
      val n = b.getShort(refsAt - 2) & 0xffff
      // corrupt-count guard: the 12-byte references must fit in the box
      require(refsAt + n.toLong * 12 <= u,
        s"corrupt sidx: $n references in ${u - f}-byte box")
      (0 until n).map { i =>
        val at = refsAt + i * 12
        val sizeWord = b.getInt(at)
        val dur = b.getInt(at + 4).toLong & 0xffffffffL
        val sap = b.getInt(at + 8)
        SegmentRef(sizeWord & 0x7fffffffL,
          if (timescale > 0) dur.toDouble / timescale else 0.0,
          (sap >>> 31) == 1)
      }
    }.getOrElse(Seq.empty)
  }

  // -------------------------------------------------------------- muxer

  private def u32(i: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(i.toInt).array()
  private def u16(i: Int): Array[Byte] =
    ByteBuffer.allocate(2).putShort(i.toShort).array()
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.empty[Byte])(_ ++ _)
    // ISO-8859-1: tag atoms (©nam …) carry 0xA9 in the type field
    u32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }
  private def fullBox(typ: String, version: Int, flags: Int,
      payload: Array[Byte]*): Array[Byte] =
    box(typ, Array[Byte](version.toByte,
      ((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte,
      (flags & 0xff).toByte) ++
      payload.foldLeft(Array.empty[Byte])(_ ++ _))

  /** One track's mux inputs with the sample table spelled out:
    * `chunkData` is the single chunk's payload, `sttsRuns` the
    * (count, delta) timing runs, `sizes` per-sample byte sizes (or
    * Left(uniform) for constant-size samples like PCM-16).
    */
  private final case class MuxTrack(
      handler: String, entry: Array[Byte], timescale: Long,
      chunkData: Array[Byte], nSamples: Int,
      sttsRuns: Seq[(Int, Int)], sizes: Either[Int, Seq[Int]],
      width: Int, height: Int) {
    def mediaDuration: Long = sttsRuns.map { case (n, d) => n.toLong * d }.sum
  }

  /** Assemble an MP4: MJPEG frames (all `w`×`h` at `fps`) and/or a
    * PCM-16 mono track and/or an MP3 track (one MPEG frame per sample,
    * `mp3SamplesPerFrame` media samples each at `mp3Rate`) and/or a
    * WebVTT subtitle track (ISO 14496-30 — (start_s, end_s, text) cues
    * become `vttc(payl)` samples with `vtte` gap fillers on a 1 kHz
    * timescale).
    */
  def write(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      audio: Option[(Array[Short], Int)] = None,
      mp3: Option[(Seq[Array[Byte]], Int, Int)] = None,
      tags: Seq[(String, String)] = Seq.empty,
      subtitles: Seq[(Double, Double, String)] = Seq.empty): Array[Byte] = {
    require(frames.nonEmpty || audio.isDefined || mp3.isDefined,
      "empty MP4: no video frames and no audio")
    require(frames.isEmpty || fps > 0, s"bad fps $fps")

    val videoTrack = if (frames.isEmpty) None else Some {
      // VisualSampleEntry 'jpeg': QuickTime MJPEG — one JPEG per sample
      val entry = box("jpeg",
        Array.fill[Byte](6)(0), u16(1), // reserved + data_reference_index
        u16(0), u16(0), Array.fill[Byte](12)(0), // pre_defined/reserved
        u16(w), u16(h),
        u32(0x00480000L), u32(0x00480000L), // 72 dpi
        u32(0), u16(1), // reserved, frame_count
        Array.fill[Byte](32)(0), // compressorname
        u16(24), u16(0xffff)) // depth, pre_defined(-1)
      MuxTrack("vide", entry, fps.toLong,
        frames.foldLeft(Array.empty[Byte])(_ ++ _), frames.length,
        Seq((frames.length, 1)), Right(frames.map(_.length)), w, h)
    }
    val pcmTrack = audio.map { case (samples, rate) =>
      val entry = box("sowt",
        Array.fill[Byte](6)(0), u16(1),
        Array.fill[Byte](8)(0), // reserved
        u16(1), u16(16), // channels, samplesize
        u16(0), u16(0), // pre_defined, reserved
        u32(rate.toLong << 16)) // 16.16 sample rate
      val raw = new Array[Byte](samples.length * 2)
      ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        .asShortBuffer().put(samples)
      // one media sample per PCM sample: uniform size 2, delta 1
      MuxTrack("soun", entry, rate.toLong, raw, samples.length,
        Seq((samples.length, 1)), Left(2), 0, 0)
    }
    val mp3Track = mp3.map { case (mpegFrames, rate, samplesPerFrame) =>
      val entry = box(".mp3",
        Array.fill[Byte](6)(0), u16(1),
        Array.fill[Byte](8)(0),
        u16(1), u16(16), u16(0), u16(0),
        u32(rate.toLong << 16))
      MuxTrack("soun", entry, rate.toLong,
        mpegFrames.foldLeft(Array.empty[Byte])(_ ++ _), mpegFrames.length,
        Seq((mpegFrames.length, samplesPerFrame)),
        Right(mpegFrames.map(_.length)), 0, 0)
    }
    val textTrack = if (subtitles.isEmpty) None else Some {
      val sorted = subtitles.sortBy(_._1)
      val entry = box("wvtt",
        Array.fill[Byte](6)(0), u16(1), // reserved + data_reference_index
        box("vttC", "WEBVTT".getBytes("UTF-8")))
      val data = new ByteArrayOutputStream()
      val runs = Seq.newBuilder[(Int, Int)]
      val sizes = Seq.newBuilder[Int]
      var t = 0L
      sorted.foreach { case (s, e, text) =>
        val sMs = math.round(s * 1000.0)
        val eMs = math.round(e * 1000.0)
        require(eMs > sMs, s"empty cue [$s,$e)")
        require(sMs >= t, s"overlapping cue at ${s}s")
        if (sMs > t) { // gap: one empty vtte sample
          val gap = box("vtte")
          data.write(gap); sizes += gap.length
          runs += ((1, (sMs - t).toInt))
        }
        val cue = box("vttc", box("payl", text.getBytes("UTF-8")))
        data.write(cue); sizes += cue.length
        runs += ((1, (eMs - sMs).toInt))
        t = eMs
      }
      val sz = sizes.result()
      MuxTrack("text", entry, 1000L, data.toByteArray, sz.length,
        runs.result(), Right(sz), 0, 0)
    }
    val tracks = Seq(videoTrack, pcmTrack, mp3Track, textTrack).flatten

    val ftyp = box("ftyp", "isom".getBytes, u32(0x200L),
      "isom".getBytes, "mp42".getBytes)

    // mdat: one chunk per track; remember each track's chunk offset
    val mdatHeaderAt = ftyp.length
    val mdatPayload = new ByteArrayOutputStream()
    val chunkOffsets: Seq[Long] = tracks.map { t =>
      val off = mdatHeaderAt + 8L + mdatPayload.size()
      mdatPayload.write(t.chunkData)
      off
    }
    val mdat = box("mdat", mdatPayload.toByteArray)

    val movieTimescale = 1000L
    val movieDuration = tracks.map { t =>
      if (t.timescale > 0) t.mediaDuration * movieTimescale / t.timescale
      else 0L
    }.foldLeft(0L)(math.max)

    val mvhd = fullBox("mvhd", 0, 0,
      u32(0), u32(0), // creation/modification (epoch: deterministic)
      u32(movieTimescale), u32(movieDuration),
      u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L), // identity matrix
      Array.fill[Byte](24)(0), // pre_defined
      u32(tracks.length + 1L)) // next_track_ID

    val traks = tracks.zipWithIndex.map { case (t, ti) =>
      val mediaDur = t.mediaDuration
      val tkDur = if (t.timescale > 0)
        mediaDur * movieTimescale / t.timescale else 0L
      val tkhd = fullBox("tkhd", 0, 7, // enabled|in-movie|in-preview
        u32(0), u32(0), u32(ti + 1L), u32(0), u32(tkDur),
        u32(0), u32(0), u16(0), u16(0),
        u16(if (t.handler == "soun") 0x0100 else 0), u16(0),
        u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
        u32(0), u32(0), u32(0x40000000L),
        u32(t.width.toLong << 16), u32(t.height.toLong << 16))
      val mdhd = fullBox("mdhd", 0, 0,
        u32(0), u32(0), u32(t.timescale), u32(mediaDur),
        u16(0x55c4), u16(0)) // language 'und'
      val hdlr = fullBox("hdlr", 0, 0,
        u32(0), t.handler.getBytes("US-ASCII"),
        u32(0), u32(0), u32(0), Array[Byte](0)) // empty name, NUL
      val smhd = fullBox("smhd", 0, 0, u16(0), u16(0))
      val vmhd = fullBox("vmhd", 0, 1, u16(0), u16(0), u16(0), u16(0))
      val nmhd = fullBox("nmhd", 0, 0) // text/subtitle null media header
      val dinf = box("dinf", fullBox("dref", 0, 0, u32(1),
        fullBox("url ", 0, 1))) // self-contained
      val stsd = fullBox("stsd", 0, 0, u32(1), t.entry)
      val stts = fullBox("stts", 0, 0,
        (u32(t.sttsRuns.length.toLong) +: t.sttsRuns.flatMap {
          case (n, d) => Seq(u32(n.toLong), u32(d.toLong))
        }): _*)
      val stsc = fullBox("stsc", 0, 0, u32(1),
        u32(1), u32(t.nSamples.toLong), u32(1)) // one chunk, all samples
      val stszBody = t.sizes match {
        case Left(uniform) => Seq(u32(uniform.toLong), u32(t.nSamples.toLong))
        case Right(sizes) =>
          u32(0L) +: u32(t.nSamples.toLong) +: sizes.map(s => u32(s.toLong))
      }
      val stsz = fullBox("stsz", 0, 0, stszBody: _*)
      val stco = fullBox("stco", 0, 0, u32(1), u32(chunkOffsets(ti)))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = box("minf",
        (if (t.handler == "vide") vmhd
         else if (t.handler == "soun") smhd
         else nmhd), dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      box("trak", tkhd, mdia)
    }

    val moov = box("moov",
      ((mvhd +: traks) ++
        (if (tags.isEmpty) Seq.empty else Seq(udtaBox(tags)))): _*)
    ftyp ++ mdat ++ moov
  }

  // -------------------------------------------------- fragmented muxer

  /** Assemble a fragmented MP4 (CMAF shape: `ftyp | moov(mvex) |
    * (moof mdat)*`): MJPEG video cut into `framesPerFragment`-frame
    * fragments, PCM-16 audio split proportionally so each fragment
    * covers the same wall-clock span. The moov carries EMPTY sample
    * tables plus `mvex/trex` defaults; every fragment uses
    * `default-base-is-moof` + an explicit trun data offset — the layout
    * DASH/CMAF packagers emit.
    */
  def writeFragmented(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      audio: Option[(Array[Short], Int)] = None,
      framesPerFragment: Int = 8): Array[Byte] = {
    require(frames.nonEmpty, "fragmented mux needs a video track")
    require(fps > 0, s"bad fps $fps")
    require(framesPerFragment > 0, s"bad framesPerFragment $framesPerFragment")

    val ftyp = box("ftyp", "iso5".getBytes, u32(0x200L),
      "iso5".getBytes, "cmfc".getBytes, "mp42".getBytes)

    val videoEntry = box("jpeg",
      Array.fill[Byte](6)(0), u16(1),
      u16(0), u16(0), Array.fill[Byte](12)(0),
      u16(w), u16(h),
      u32(0x00480000L), u32(0x00480000L),
      u32(0), u16(1),
      Array.fill[Byte](32)(0),
      u16(24), u16(0xffff))
    val audioEntry = audio.map { case (_, rate) =>
      box("sowt",
        Array.fill[Byte](6)(0), u16(1),
        Array.fill[Byte](8)(0),
        u16(1), u16(16), u16(0), u16(0),
        u32(rate.toLong << 16))
    }

    val movieTimescale = 1000L
    val totalDurMs = frames.length.toLong * 1000L / fps

    def emptyStbl(entry: Array[Byte]): Array[Byte] = box("stbl",
      fullBox("stsd", 0, 0, u32(1), entry),
      fullBox("stts", 0, 0, u32(0)),
      fullBox("stsc", 0, 0, u32(0)),
      fullBox("stsz", 0, 0, u32(0), u32(0)),
      fullBox("stco", 0, 0, u32(0)))

    def trak(trackId: Int, handler: String, entry: Array[Byte],
        timescale: Long, width: Int, height: Int): Array[Byte] = {
      val tkhd = fullBox("tkhd", 0, 7,
        u32(0), u32(0), u32(trackId.toLong), u32(0), u32(totalDurMs),
        u32(0), u32(0), u16(0), u16(0),
        u16(if (handler == "soun") 0x0100 else 0), u16(0),
        u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
        u32(0), u32(0), u32(0x40000000L),
        u32(width.toLong << 16), u32(height.toLong << 16))
      val mdhd = fullBox("mdhd", 0, 0,
        u32(0), u32(0), u32(timescale), u32(0), // duration unknown: in moofs
        u16(0x55c4), u16(0))
      val hdlr = fullBox("hdlr", 0, 0,
        u32(0), handler.getBytes("US-ASCII"),
        u32(0), u32(0), u32(0), Array[Byte](0))
      val dinf = box("dinf", fullBox("dref", 0, 0, u32(1),
        fullBox("url ", 0, 1)))
      val minf = box("minf",
        (if (handler == "vide") fullBox("vmhd", 0, 1, u16(0), u16(0), u16(0), u16(0))
         else fullBox("smhd", 0, 0, u16(0), u16(0))),
        dinf, emptyStbl(entry))
      box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    }

    val trex = (1 to (if (audio.isDefined) 2 else 1)).map { id =>
      fullBox("trex", 0, 0, u32(id.toLong), u32(1), u32(0), u32(0), u32(0))
    }
    val mvhd = fullBox("mvhd", 0, 0,
      u32(0), u32(0), u32(movieTimescale), u32(totalDurMs),
      u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L),
      Array.fill[Byte](24)(0),
      u32(if (audio.isDefined) 3L else 2L))
    val traks = Seq(
      Some(trak(1, "vide", videoEntry, fps.toLong, w, h)),
      audioEntry.map(e => trak(2, "soun", e, audio.get._2.toLong, 0, 0))
    ).flatten
    val moov = box("moov",
      (mvhd +: traks :+ box("mvex", trex: _*)): _*)

    // fragments: video frames [i, i+k) + the matching PCM slice.
    // Accumulated first so the sidx segment index (byte-range map for
    // DASH-style range reads) can be emitted BEFORE the first moof.
    val segments = Seq.newBuilder[(Array[Byte], Int)] // (moof+mdat, frames)
    val nFrags = (frames.length + framesPerFragment - 1) / framesPerFragment
    var seq = 1
    var frame = 0
    var pcmPos = 0
    while (frame < frames.length) {
      val fragFrames = frames.slice(frame, frame + framesPerFragment)
      val pcmEndFrame = frame + fragFrames.length
      val (pcmSlice, pcmNext) = audio match {
        case Some((samples, rate)) =>
          val end =
            if (pcmEndFrame >= frames.length) samples.length
            else (pcmEndFrame.toLong * rate / fps).toInt.min(samples.length)
          (samples.slice(pcmPos, end), end)
        case None => (Array.empty[Short], 0)
      }

      val mfhd = fullBox("mfhd", 0, 0, u32(seq.toLong))
      // trun data offsets are relative to moof start; mdat payload
      // begins at moof.length + 8. Build the moof with placeholder
      // offsets first to learn its length, then rebuild — box sizes
      // don't depend on the offset VALUES, so one rebuild is exact.
      // PCM samples are uniform (2 bytes, delta 1): carried as tfhd
      // default_sample_duration/size so the trun is offset-only.
      def moofWith(videoOff: Long, audioOff: Long): Array[Byte] = {
        val vTraf = box("traf",
          fullBox("tfhd", 0, 0x020000, u32(1)),
          fullBox("tfdt", 1, 0,
            ByteBuffer.allocate(8).putLong(frame.toLong).array()),
          fullBox("trun", 0, 0x301,
            (u32(fragFrames.length.toLong) +: u32(videoOff) +:
              fragFrames.flatMap(f => Seq(u32(1L), u32(f.length.toLong)))): _*))
        val aTraf =
          if (pcmSlice.isEmpty) None
          else Some(box("traf",
            // default-base-is-moof | default-duration | default-size
            fullBox("tfhd", 0, 0x020018, u32(2), u32(1), u32(2)),
            fullBox("tfdt", 1, 0,
              ByteBuffer.allocate(8).putLong(pcmPos.toLong).array()),
            fullBox("trun", 0, 0x001, // data-offset only; defaults fill in
              u32(pcmSlice.length.toLong), u32(audioOff))))
        box("moof", (Seq(mfhd, vTraf) ++ aTraf): _*)
      }
      val probe = moofWith(0L, 0L)
      val videoBytes = fragFrames.map(_.length.toLong).sum
      val videoOff = probe.length + 8L // past mdat header
      val audioOff = videoOff + videoBytes
      val moof = moofWith(videoOff, audioOff)
      require(moof.length == probe.length, "moof size drifted on rebuild")

      val mdat = new ByteArrayOutputStream()
      fragFrames.foreach(mdat.write)
      if (pcmSlice.nonEmpty) {
        val raw = new Array[Byte](pcmSlice.length * 2)
        ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
          .asShortBuffer().put(pcmSlice)
        mdat.write(raw)
      }
      segments += ((moof ++ box("mdat", mdat.toByteArray), fragFrames.length))

      frame += fragFrames.length
      pcmPos = pcmNext
      seq += 1
    }
    require(seq - 1 == nFrags, s"fragment count drifted: ${seq - 1} vs $nFrags")
    val segs = segments.result()

    // sidx over the video timescale: one reference per fragment,
    // first_offset 0 (the index sits immediately before the first moof)
    val sidx = fullBox("sidx", 0, 0,
      (Seq(
        u32(1), u32(fps.toLong), // reference_ID (video), timescale
        u32(0), u32(0), // earliest_presentation_time, first_offset
        u16(0), u16(segs.length)) ++ // reserved, reference_count
        segs.flatMap { case (seg, nf) => Seq(
          u32(seg.length.toLong & 0x7fffffffL), // type 0 (media) + size
          u32(nf.toLong), // subsegment_duration (delta 1 per frame)
          u32(0x90000000L)) // starts_with_SAP, SAP type 1
        }): _*)

    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(sidx)
    segs.foreach { case (seg, _) => out.write(seg) }
    out.toByteArray
  }
}
