package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM Matroska/WebM (EBML) container demux + mux — the crawl-major
  * container family the reference opens via pyav
  * (`functions/video/iterators.py:41-123`, `iterators/video.py`), built
  * directly on the public EBML grammar (RFC 8794) and the Matroska
  * element registry: `EBML(DocType) | Segment(Info, Tracks, Cluster*,
  * Cues, Tags)` with SimpleBlock/BlockGroup frame framing and all four
  * lacing modes (none/Xiph/fixed/EBML).
  *
  * Demux walks element headers only until payloads are pulled — metadata
  * over a 100 TB corpus reads track/info headers plus block HEADERS
  * (skipping payload bytes), the same discipline as the MP4 moov walk and
  * the MP3 frame walk. Codec naming covers the real-world Matroska codec
  * ids (VP8/VP9/AV1/H.264/HEVC/MJPEG video, Opus/Vorbis/AAC/MP3/FLAC/PCM
  * audio, SRT/WebVTT text); DECODE support is MJPEG (video) + PCM
  * (audio) + elementary-stream hand-off for the compressed codecs —
  * exactly the MP4 boundary, adjudicated in COVERAGE.
  *
  * The muxer writes `EBML | Segment(Info, Tracks, Tags?, Cluster*, Cues)`
  * with MJPEG video (one JPEG per SimpleBlock), PCM-16LE audio
  * (`A_PCM/INT/LIT`), an `S_TEXT/UTF8` subtitle track (BlockGroup +
  * BlockDuration — Matroska's native SRT carriage), per-cluster cue
  * points (the `sidx` analog), and Matroska `Tags` — the re-mux twin the
  * q180 gate rides.
  */
object Mkv {

  // ------------------------------------------------------------- EBML ids

  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdMuxingApp = 0x4D80L
  private val IdWritingApp = 0x5741L
  private val IdTitle = 0x7BA9L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackUid = 0x73C5L
  private val IdTrackType = 0x83L
  private val IdFlagLacing = 0x9CL
  private val IdLanguage = 0x22B59CL
  private val IdName = 0x536EL
  private val IdCodecId = 0x86L
  private val IdCodecPrivate = 0x63A2L
  private val IdDefaultDuration = 0x23E383L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdBitDepth = 0x6264L
  private val IdCluster = 0x1F43B675L
  private val IdTimestamp = 0xE7L
  private val IdSimpleBlock = 0xA3L
  private val IdBlockGroup = 0xA0L
  private val IdBlock = 0xA1L
  private val IdBlockDuration = 0x9BL
  private val IdCues = 0x1C53BB6BL
  private val IdCuePoint = 0xBBL
  private val IdCueTime = 0xB3L
  private val IdCueTrackPositions = 0xB7L
  private val IdCueTrack = 0xF7L
  private val IdCueClusterPosition = 0xF1L
  private val IdTags = 0x1254C367L
  private val IdTag = 0x7373L
  private val IdSimpleTag = 0x67C8L
  private val IdTagName = 0x45A3L
  private val IdTagString = 0x4487L

  /** Upper bound on any expanded block/frame count — far above real
    * files but small enough that a corrupt count fails fast instead of
    * driving an uncatchable multi-GB allocation.
    */
  private val MaxBlocks = 1 << 27

  // ------------------------------------------------------------ varints

  /** VINT length from the leading byte (number of leading zeros + 1);
    * 0 byte → invalid (return 0).
    */
  private def vintLen(b0: Int): Int = {
    if (b0 == 0) return 0
    var mask = 0x80
    var len = 1
    while ((b0 & mask) == 0) { mask >>= 1; len += 1 }
    len
  }

  /** (id, nextPos) — element IDs keep the marker bits (RFC 8794 §5). */
  private def readId(b: Array[Byte], pos: Int): (Long, Int) = {
    if (pos >= b.length) return (-1L, pos)
    val len = vintLen(b(pos) & 0xff)
    if (len == 0 || len > 4 || pos + len > b.length) return (-1L, pos)
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
    (v, pos + len)
  }

  /** (size, nextPos) — sizes strip the marker; all-ones payload means
    * unknown size (returned as -1, caller treats as to-end-of-parent).
    */
  private def readSize(b: Array[Byte], pos: Int): (Long, Int) = {
    if (pos >= b.length) return (-2L, pos)
    val b0 = b(pos) & 0xff
    val len = vintLen(b0)
    if (len == 0 || len > 8 || pos + len > b.length) return (-2L, pos)
    var v = (b0 & (0xff >> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
    val allOnes = (1L << (7 * len)) - 1
    (if (v == allOnes) -1L else v, pos + len)
  }

  /** Signed VINT (EBML lacing deltas): unsigned minus 2^(7·len−1)−1. */
  private def readSignedVint(b: Array[Byte], pos: Int): (Long, Int) = {
    val b0 = b(pos) & 0xff
    val len = vintLen(b0)
    require(len > 0 && len <= 8 && pos + len <= b.length, "corrupt lace vint")
    var v = (b0 & (0xff >> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
    (v - ((1L << (7 * len - 1)) - 1), pos + len)
  }

  /** Children of [from, until): (id, payloadFrom, payloadUntil). Corrupt
    * headers end the walk (partial results, never a bad allocation);
    * unknown-size elements run to the parent's end (the streamed-Segment/
    * Cluster convention).
    */
  private def elements(b: Array[Byte], from: Int,
      until: Int): Seq[(Long, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    var pos = from
    while (pos < until) {
      val (id, p1) = readId(b, pos)
      if (id < 0 || p1 >= until) return out.toSeq
      val (size, p2) = readSize(b, p1)
      if (size == -2L) return out.toSeq
      val end = if (size == -1L) until.toLong else p2 + size
      if (end > until || end < p2) return out.toSeq
      out += ((id, p2, end.toInt))
      pos = end.toInt
    }
    out.toSeq
  }

  private def find(b: Array[Byte], from: Int, until: Int,
      id: Long): Option[(Int, Int)] =
    elements(b, from, until).collectFirst { case (i, f, u) if i == id => (f, u) }

  private def uint(b: Array[Byte], from: Int, until: Int): Long = {
    var v = 0L
    var i = from
    while (i < until && i - from < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  private def float(b: Array[Byte], from: Int, until: Int): Double =
    (until - from) match {
      case 4 => java.lang.Float.intBitsToFloat(uint(b, from, until).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, from, until))
      case _ => 0.0
    }

  private def str(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.UTF_8)
      .takeWhile(_ != '\u0000')

  // ------------------------------------------------------------- model

  /** One media track with every block resolved to absolute
    * (offset, size) plus per-block timestamps/durations in ns.
    */
  final case class Track(
      number: Long, trackType: Int, codecId: String, codec: String,
      name: String, language: String,
      width: Int, height: Int, channels: Int, sampleRate: Double,
      bitDepth: Int, defaultDurationNs: Long,
      blockOffsets: Array[Int], blockSizes: Array[Int],
      blockTsNs: Array[Long], blockDurNs: Array[Long],
      codecPrivateFrom: Int = -1, codecPrivateUntil: Int = -1) {
    def nBlocks: Int = blockSizes.length
    def kind: String = trackType match {
      case 1 => "video"
      case 2 => "audio"
      case 17 => "subtitle"
      case t => s"type$t"
    }
    def durationS: Double =
      if (nBlocks == 0) 0.0
      else (blockTsNs.last + math.max(blockDurNs.last, 0L)) / 1e9
    /** blocks/s from the dominant inter-block delta (fps for video). */
    def rate: Double = {
      if (defaultDurationNs > 0) return 1e9 / defaultDurationNs
      if (nBlocks < 2) return 0.0
      val deltas = (1 until nBlocks).map(i => blockTsNs(i) - blockTsNs(i - 1))
      val d = deltas.groupBy(identity).maxBy(_._2.length)._1
      if (d > 0) 1e9 / d else 0.0
    }
  }

  /** (docType, timestampScale ns, declared duration s, title, tags,
    * tracks, cue points).
    */
  final case class MkvFile(docType: String, timestampScaleNs: Long,
      infoDurationS: Double, title: String,
      tags: Seq[(String, String)], tracks: Seq[Track],
      cues: Seq[(Double, Long)]) {
    def durationS: Double =
      if (infoDurationS > 0) infoDurationS
      else tracks.map(_.durationS).foldLeft(0.0)(math.max)
  }

  /** `true` for EBML payloads (Matroska and WebM both open 0x1A45DFA3). */
  def isMkv(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x1A && (bytes(1) & 0xff) == 0x45 &&
      (bytes(2) & 0xff) == 0xDF && (bytes(3) & 0xff) == 0xA3

  /** Matroska codec id → the shared codec names the MP4 path uses. */
  private def codecName(id: String): String = id match {
    case "V_MJPEG" => "jpeg"
    case "V_VP8" => "vp8"
    case "V_VP9" => "vp9"
    case "V_AV1" => "av1"
    case "V_MPEG4/ISO/AVC" => "h264"
    case "V_MPEGH/ISO/HEVC" => "hevc"
    case "V_THEORA" => "theora"
    case "A_OPUS" => "opus"
    case "A_VORBIS" => "vorbis"
    case "A_FLAC" => "flac"
    case "A_MPEG/L3" => "mp3"
    case "A_MPEG/L2" => "mp2"
    case "A_AAC" => "aac"
    case "A_AC3" => "ac3"
    case s if s.startsWith("A_AAC/") => "aac"
    case "A_PCM/INT/LIT" | "A_PCM/INT/BIG" => "pcm"
    case "S_TEXT/UTF8" => "srt"
    case "S_TEXT/WEBVTT" => "webvtt"
    case "S_TEXT/ASS" | "S_TEXT/SSA" => "ass"
    case other => other.toLowerCase
  }

  // -------------------------------------------------------------- demux

  /** Parse the whole container. Block payload bytes are never copied
    * here — tracks carry (offset, size) spans, so a metadata walk skips
    * payloads entirely.
    */
  def parse(bytes: Array[Byte]): MkvFile = {
    require(isMkv(bytes), "not an EBML (Matroska/WebM) payload")
    val top = elements(bytes, 0, bytes.length)
    val docType = top.collectFirst { case (IdEbml, f, u) =>
      find(bytes, f, u, IdDocType).map { case (df, du) => str(bytes, df, du) }
        .getOrElse("matroska")
    }.getOrElse("matroska")
    val (segF, segU) = top.collectFirst { case (IdSegment, f, u) => (f, u) }
      .getOrElse(sys.error("no Segment element (truncated Matroska)"))

    val seg = elements(bytes, segF, segU)
    var tsScale = 1000000L // ns per timestamp unit (Matroska default: 1 ms)
    var infoDur = 0.0
    var title = ""
    seg.collectFirst { case (IdInfo, f, u) => (f, u) }.foreach { case (f, u) =>
      elements(bytes, f, u).foreach {
        case (IdTimestampScale, ef, eu) => tsScale = math.max(1L, uint(bytes, ef, eu))
        case (IdDuration, ef, eu) => infoDur = float(bytes, ef, eu)
        case (IdTitle, ef, eu) => title = str(bytes, ef, eu)
        case _ => ()
      }
    }
    // Info.Duration is in timestamp-scale units
    val infoDurS = infoDur * tsScale / 1e9

    // ---- track entries (identity only; blocks attached below)
    final case class Entry(number: Long, trackType: Int, codecId: String,
        name: String, language: String, width: Int, height: Int,
        channels: Int, sampleRate: Double, bitDepth: Int, defDurNs: Long,
        cpFrom: Int, cpUntil: Int)
    val entries = seg.collect { case (IdTracks, f, u) =>
      elements(bytes, f, u).collect { case (IdTrackEntry, tf, tu) =>
        var num = 0L; var typ = 0; var codecId = ""; var name = ""
        var lang = "eng"; var w = 0; var h = 0; var ch = 0
        var rate = 0.0; var bits = 0; var defDur = 0L
        var cpF = -1; var cpU = -1
        elements(bytes, tf, tu).foreach {
          case (IdTrackNumber, ef, eu) => num = uint(bytes, ef, eu)
          case (IdTrackType, ef, eu) => typ = uint(bytes, ef, eu).toInt
          case (IdCodecId, ef, eu) => codecId = str(bytes, ef, eu)
          case (IdCodecPrivate, ef, eu) => cpF = ef; cpU = eu
          case (IdName, ef, eu) => name = str(bytes, ef, eu)
          case (IdLanguage, ef, eu) => lang = str(bytes, ef, eu)
          case (IdDefaultDuration, ef, eu) => defDur = uint(bytes, ef, eu)
          case (IdVideo, ef, eu) =>
            elements(bytes, ef, eu).foreach {
              case (IdPixelWidth, pf, pu) => w = uint(bytes, pf, pu).toInt
              case (IdPixelHeight, pf, pu) => h = uint(bytes, pf, pu).toInt
              case _ => ()
            }
          case (IdAudio, ef, eu) =>
            elements(bytes, ef, eu).foreach {
              case (IdSamplingFrequency, pf, pu) => rate = float(bytes, pf, pu)
              case (IdChannels, pf, pu) => ch = uint(bytes, pf, pu).toInt
              case (IdBitDepth, pf, pu) => bits = uint(bytes, pf, pu).toInt
              case _ => ()
            }
          case _ => ()
        }
        Entry(num, typ, codecId, name, lang, w, h, ch, rate, bits, defDur,
          cpF, cpU)
      }
    }.flatten

    // ---- block walk (headers only; payloads stay as spans)
    val offs = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
    val sizes = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
    val tss = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    val durs = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    def buf[T](m: scala.collection.mutable.Map[Long, scala.collection.mutable.ArrayBuffer[T]],
        k: Long) = m.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty[T])
    val defDurOf = entries.map(e => e.number -> e.defDurNs).toMap
    var totalBlocks = 0L

    /** One Block/SimpleBlock: track vint, s16 relative ts, flags, lace
      * header, frames. `groupDurNs` carries an enclosing BlockGroup's
      * BlockDuration (ns) when present.
      */
    def addBlock(bf: Int, bu: Int, clusterTsNs: Long, groupDurNs: Long): Unit = {
      val (trackNum, p1) = readId(bytes, bf) match {
        case (-1L, _) => return // corrupt vint — skip block
        case (id, p) =>
          // track number is a plain VINT (marker stripped like a size)
          val len = p - bf
          (id & ~(1L << (7 * len)), p)
      }
      if (p1 + 3 > bu) return
      val relTs = ((bytes(p1) & 0xff) << 8 | (bytes(p1 + 1) & 0xff)).toShort
      val flags = bytes(p1 + 2) & 0xff
      var p = p1 + 3
      val lacing = (flags >> 1) & 0x3
      val laceSizes: Seq[Int] = lacing match {
        case 0 => Seq(bu - p) // no lacing: one frame to element end
        case _ =>
          if (p >= bu) return
          val nFrames = (bytes(p) & 0xff) + 1; p += 1
          require(nFrames <= bu - p + 1, s"corrupt lace count $nFrames")
          lacing match {
            case 2 => // fixed: equal split
              val each = (bu - p) / nFrames
              Seq.fill(nFrames)(each)
            case 1 => // Xiph: 255-stuffed sizes for n-1 frames
              val out = Seq.newBuilder[Int]
              var acc = 0
              var got = 0
              while (got < nFrames - 1 && p < bu) {
                val v = bytes(p) & 0xff; p += 1
                acc += v
                if (v != 255) { out += acc; acc = 0; got += 1 }
              }
              val head = out.result()
              head :+ (bu - p - head.sum)
            case _ => // EBML: first size vint, then signed deltas
              val (first, p2) = readSize(bytes, p)
              require(first >= 0, "corrupt EBML lace")
              p = p2
              var cur = first.toInt
              val out = Seq.newBuilder[Int]
              out += cur
              var got = 1
              while (got < nFrames - 1) {
                val (d, p3) = readSignedVint(bytes, p)
                p = p3
                cur += d.toInt
                out += cur
                got += 1
              }
              val head = out.result()
              head :+ (bu - p - head.sum)
          }
      }
      val tsNs = (clusterTsNs + relTs) * tsScale
      val defDur = defDurOf.getOrElse(trackNum, 0L)
      totalBlocks += laceSizes.length
      require(totalBlocks <= MaxBlocks, s"corrupt Matroska: $totalBlocks blocks")
      var i = 0
      var off = p
      laceSizes.foreach { sz =>
        require(sz >= 0 && off + sz <= bu, s"corrupt lace size $sz")
        buf(offs, trackNum) += off
        buf(sizes, trackNum) += sz
        buf(tss, trackNum) += tsNs + i * defDur
        buf(durs, trackNum) +=
          (if (groupDurNs > 0 && laceSizes.length == 1) groupDurNs else defDur)
        off += sz
        i += 1
      }
    }

    seg.foreach {
      case (IdCluster, cf, cu) =>
        val kids = elements(bytes, cf, cu)
        val clusterTs = kids.collectFirst { case (IdTimestamp, f, u) =>
          uint(bytes, f, u)
        }.getOrElse(0L)
        kids.foreach {
          case (IdSimpleBlock, f, u) => addBlock(f, u, clusterTs, 0L)
          case (IdBlockGroup, f, u) =>
            val g = elements(bytes, f, u)
            val d = g.collectFirst { case (IdBlockDuration, df, du) =>
              uint(bytes, df, du) * tsScale
            }.getOrElse(0L)
            g.foreach {
              case (IdBlock, bf2, bu2) => addBlock(bf2, bu2, clusterTs, d)
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }

    val tracks = entries.map { e =>
      Track(e.number, e.trackType, e.codecId, codecName(e.codecId),
        e.name, e.language, e.width, e.height, e.channels, e.sampleRate,
        e.bitDepth, e.defDurNs,
        offs.get(e.number).map(_.toArray).getOrElse(Array.empty),
        sizes.get(e.number).map(_.toArray).getOrElse(Array.empty),
        tss.get(e.number).map(_.toArray).getOrElse(Array.empty),
        durs.get(e.number).map(_.toArray).getOrElse(Array.empty),
        e.cpFrom, e.cpUntil)
    }

    // ---- cues (CueTime in ts-scale units; position relative to segment)
    val cues = seg.collect { case (IdCues, f, u) =>
      elements(bytes, f, u).collect { case (IdCuePoint, pf, pu) =>
        val kids = elements(bytes, pf, pu)
        val t = kids.collectFirst { case (IdCueTime, tf, tu) =>
          uint(bytes, tf, tu)
        }.getOrElse(0L)
        val pos = kids.collectFirst { case (IdCueTrackPositions, tf, tu) =>
          find(bytes, tf, tu, IdCueClusterPosition)
            .map { case (cf2, cu2) => uint(bytes, cf2, cu2) }.getOrElse(0L)
        }.getOrElse(0L)
        (t * tsScale / 1e9, pos)
      }
    }.flatten

    // ---- tags
    val tags = seg.collect { case (IdTags, f, u) =>
      elements(bytes, f, u).collect { case (IdTag, tf, tu) =>
        elements(bytes, tf, tu).collect { case (IdSimpleTag, sf, su) =>
          val kids = elements(bytes, sf, su)
          val n = kids.collectFirst { case (IdTagName, nf, nu) =>
            str(bytes, nf, nu)
          }.getOrElse("")
          val v = kids.collectFirst { case (IdTagString, vf, vu) =>
            str(bytes, vf, vu)
          }.getOrElse("")
          (n, v)
        }
      }.flatten
    }.flatten

    MkvFile(docType, tsScale, infoDurS, title, tags, tracks, cues)
  }

  /** Matroska standard tag name ↔ the friendly names the MP4/MP3 tag
    * surface uses (`Mp4.TagAtoms` twins).
    */
  private val TagNames = Seq(
    "TITLE" -> "title", "ARTIST" -> "artist", "ALBUM" -> "album",
    "DATE_RELEASED" -> "date", "GENRE" -> "genre", "COMMENT" -> "comment",
    "ENCODER" -> "encoder", "PART_NUMBER" -> "track")
  private val TagByFriendly = TagNames.map(_.swap).toMap

  /** (name, value) tags, friendly-named where standard. */
  def readTags(bytes: Array[Byte]): Seq[(String, String)] = {
    val byStd = TagNames.toMap
    parse(bytes).tags.map { case (n, v) => (byStd.getOrElse(n, n), v) }
  }

  /** Header-only metadata in the shared AviMeta shape (format "WEBM" for
    * webm doctype, else "MKV").
    */
  def readMeta(bytes: Array[Byte]): Avi.AviMeta = {
    val mkv = parse(bytes)
    val fmt = if (mkv.docType == "webm") "WEBM" else "MKV"
    mkv.tracks.find(_.trackType == 1) match {
      case Some(v) =>
        // video-track duration (the MP4 path's convention) — the Info
        // duration spans subtitle tails too
        val dur = if (v.durationS > 0) v.durationS else mkv.durationS
        Avi.AviMeta(v.width, v.height, v.rate, v.nBlocks, dur,
          v.codec.toUpperCase, fmt)
      case None =>
        val a = mkv.tracks.find(_.trackType == 2)
          .getOrElse(sys.error("Matroska has no video or audio track"))
        Avi.AviMeta(0, 0, 0.0, a.nBlocks, mkv.durationS,
          a.codec.toUpperCase, fmt)
    }
  }

  /** Fail fast on out-of-file spans (corrupt offsets must not read the
    * wrong bytes silently).
    */
  private def slice(bytes: Array[Byte], off: Int, sz: Int): Array[Byte] = {
    require(off >= 0 && sz >= 0 && off + sz <= bytes.length,
      s"corrupt block span: [$off, ${off + sz}) in ${bytes.length}-byte file")
    java.util.Arrays.copyOfRange(bytes, off, off + sz)
  }

  private def blocksOf(bytes: Array[Byte], t: Track): Seq[Array[Byte]] =
    (0 until t.nBlocks).map(i =>
      slice(bytes, t.blockOffsets(i), t.blockSizes(i)))

  /** JPEG payloads of the video track (V_MJPEG — the decode boundary;
    * VP8/VP9/H.264 fail fast with the codec named, COVERAGE-adjudicated).
    */
  def readFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val v = parse(bytes).tracks.find(_.trackType == 1)
      .getOrElse(sys.error("Matroska has no video track"))
    require(v.codec == "jpeg",
      s"unsupported video decode codec '${v.codec}' (jpeg/MJPEG only; " +
        "see COVERAGE adjudication)")
    blocksOf(bytes, v)
  }

  /** PCM-16 of the first audio track (`A_PCM/INT/LIT`/`BIG`); compressed
    * audio returns None (use `extractAudioStream`).
    */
  def readAudio(bytes: Array[Byte]): Option[(Array[Short], Int)] = {
    val a = parse(bytes).tracks.find(_.trackType == 2).getOrElse(return None)
    if (a.codec != "pcm") return None
    val raw = new ByteArrayOutputStream()
    (0 until a.nBlocks).foreach { i =>
      val off = a.blockOffsets(i)
      val sz = a.blockSizes(i)
      require(off >= 0 && sz >= 0 && off + sz <= bytes.length,
        s"corrupt block span: [$off, ${off + sz}) in ${bytes.length}-byte file")
      raw.write(bytes, off, sz)
    }
    val all = raw.toByteArray
    val order = if (a.codecId == "A_PCM/INT/BIG") ByteOrder.BIG_ENDIAN
      else ByteOrder.LITTLE_ENDIAN
    val samples = new Array[Short](all.length / 2)
    ByteBuffer.wrap(all).order(order).asShortBuffer().get(samples)
    Some((samples, math.round(a.sampleRate).toInt))
  }

  /** (codec, concatenated elementary stream) of the first NON-pcm audio
    * track — the Opus/Vorbis/MP3 hand-off (mp3 feeds `Mp3` directly;
    * Opus/Vorbis decode is adjudicated).
    */
  def extractAudioStream(bytes: Array[Byte]): Option[(String, Array[Byte])] =
    parse(bytes).tracks.find(t => t.trackType == 2 && t.codec != "pcm")
      .map(t => (t.codec, blocksOf(bytes, t).toArray.flatten))

  /** Vorbis stream carried per the Matroska codec mapping: CodecPrivate
    * holds the three header packets under Xiph lacing (count byte = 2,
    * then the first two packet lengths as 255-sums), and each
    * SimpleBlock payload is one audio packet. Returns headers ++ audio
    * packets in decode order — the exact input `Vorbis.decode` takes.
    */
  def vorbisPackets(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    val t = parse(bytes).tracks
      .find(t => t.trackType == 2 && t.codec == "vorbis")
      .getOrElse(return None)
    if (t.codecPrivateFrom < 0) return None
    var p = t.codecPrivateFrom
    val nMinus1 = bytes(p) & 0xff; p += 1
    val lens = (0 until nMinus1).map { _ =>
      var len = 0
      while (p < t.codecPrivateUntil && (bytes(p) & 0xff) == 255) {
        len += 255; p += 1
      }
      if (p < t.codecPrivateUntil) { len += bytes(p) & 0xff; p += 1 }
      len
    }
    val headers = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    lens.foreach { len =>
      if (p + len <= t.codecPrivateUntil) {
        headers += java.util.Arrays.copyOfRange(bytes, p, p + len)
        p += len
      }
    }
    // corrupt lacing can leave p past the end (the laced-length walk
    // advances p even when the copy above is skipped) — guard the
    // trailing header and require all 3 Vorbis headers, else None
    if (p <= t.codecPrivateUntil)
      headers += java.util.Arrays.copyOfRange(bytes, p, t.codecPrivateUntil)
    if (headers.length < 3) return None
    Some(headers.toSeq ++ blocksOf(bytes, t))
  }

  /** Mux a Vorbis stream (3 header packets + audio packets of
    * `samplesPerPacket` each) as a Matroska/WebM audio track —
    * CodecPrivate Xiph lacing per the Matroska codec mapping.
    */
  def writeVorbis(headers: Seq[Array[Byte]], audioPackets: Seq[Array[Byte]],
      rate: Int, channels: Int, samplesPerPacket: Int,
      docType: String = "webm",
      tags: Seq[(String, String)] = Seq.empty): Array[Byte] = {
    require(headers.length == 3, "vorbis CodecPrivate needs 3 header packets")
    val lace = (len: Int) =>
      Array.fill(len / 255)(255.toByte) :+ (len % 255).toByte
    val codecPrivate = Array[Byte](2) ++ lace(headers(0).length) ++
      lace(headers(1).length) ++ headers(0) ++ headers(1) ++ headers(2)
    // first audio packet primes the MDCT overlap and emits nothing
    val outSamples = (i: Int) => math.max(0L, (i.toLong - 1) * samplesPerPacket)
    val blocks = audioPackets.zipWithIndex.map { case (pkt, i) =>
      MuxBlock(1, outSamples(i) * 1000 / rate,
        samplesPerPacket.toLong * 1000 / rate, pkt, group = false)
    }
    val durMs = outSamples(audioPackets.length) * 1000 / rate
    val info = el(IdInfo,
      el(IdTimestampScale, uintBytes(1000000L)),
      el(IdMuxingApp, strBytes("graft")),
      el(IdWritingApp, strBytes("graft")),
      el(IdDuration, floatBytes(durMs.toDouble)))
    val tracksEl = el(IdTracks, el(IdTrackEntry,
      el(IdTrackNumber, uintBytes(1L)),
      el(IdTrackUid, uintBytes(1L)),
      el(IdTrackType, uintBytes(2L)),
      el(IdFlagLacing, uintBytes(0L)),
      el(IdCodecId, strBytes("A_VORBIS")),
      el(IdCodecPrivate, codecPrivate),
      el(IdAudio,
        el(IdSamplingFrequency, floatBytes(rate.toDouble)),
        el(IdChannels, uintBytes(channels.toLong)),
        el(IdBitDepth, uintBytes(16L)))))
    val tagsEl =
      if (tags.isEmpty) Array.empty[Byte]
      else el(IdTags, el(IdTag,
        tags.map { case (name, v) =>
          el(IdSimpleTag,
            el(IdTagName, strBytes(TagByFriendly.getOrElse(name, name))),
            el(IdTagString, strBytes(v)))
        }: _*))
    val clusters = blocks.groupBy(_.tsMs / 10000).toSeq.sortBy(_._1).map {
      case (ci, bs) =>
        val base = ci * 10000
        val els = bs.map { b =>
          val rel = (b.tsMs - base).toInt
          el(IdSimpleBlock, vint(1L) ++
            Array[Byte]((rel >> 8).toByte, rel.toByte, 0x80.toByte) ++ b.data)
        }
        el(IdCluster, el(IdTimestamp, uintBytes(base)) +: els: _*)
    }
    val ebml = el(IdEbml,
      el(0x4286L, uintBytes(1L)), el(0x42F7L, uintBytes(1L)),
      el(0x42F2L, uintBytes(4L)), el(0x42F3L, uintBytes(8L)),
      el(IdDocType, strBytes(docType)),
      el(0x4287L, uintBytes(4L)), el(0x4285L, uintBytes(2L)))
    ebml ++ el(IdSegment, (info ++ tracksEl ++ tagsEl) +: clusters: _*)
  }

  /** Cues of the first subtitle track (S_TEXT/UTF8 — block payload is
    * the cue text, BlockDuration the span) as (start_s, end_s, text).
    */
  def readSubtitles(bytes: Array[Byte]): Seq[(Double, Double, String)] = {
    val t = parse(bytes).tracks.find(t =>
      t.trackType == 17 && Set("srt", "webvtt")(t.codec))
      .getOrElse(return Seq.empty)
    (0 until t.nBlocks).map { i =>
      val text = new String(slice(bytes, t.blockOffsets(i), t.blockSizes(i)),
        java.nio.charset.StandardCharsets.UTF_8)
      (t.blockTsNs(i) / 1e9, (t.blockTsNs(i) + t.blockDurNs(i)) / 1e9, text)
    }.filter(_._3.nonEmpty)
  }

  /** Cue points as (time_s, segment-relative cluster byte position) —
    * the `sidx` analog a range-read planner uses to fetch one cluster.
    */
  def segmentCues(bytes: Array[Byte]): Seq[(Double, Long)] =
    parse(bytes).cues

  // --------------------------------------------------------------- muxer

  private def vint(v: Long): Array[Byte] = {
    var len = 1
    // value must fit below the all-ones reserved pattern for the width
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = v
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out(0) = (out(0) | (0x80 >> (len - 1))).toByte
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = id
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out
  }

  private def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.empty[Byte])(_ ++ _)
    idBytes(id) ++ vint(body.length.toLong) ++ body
  }

  private def uintBytes(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >> (8 * len)) != 0) len += 1
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = v
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out
  }

  private def floatBytes(d: Double): Array[Byte] =
    ByteBuffer.allocate(8).putDouble(d).array()

  private def strBytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** One frame to be laid out into clusters. */
  private final case class MuxBlock(track: Int, tsMs: Long, durMs: Long,
      data: Array[Byte], group: Boolean)

  /** Assemble a Matroska file: MJPEG frames (`V_MJPEG`, one JPEG per
    * SimpleBlock at `fps`) and/or PCM-16 mono audio (`A_PCM/INT/LIT`,
    * ~100 ms blocks) and/or an `S_TEXT/UTF8` subtitle track (BlockGroup +
    * BlockDuration) plus Matroska Tags. Clusters span ≤10 s (relative
    * block timestamps are s16 in ms), each indexed by a CuePoint.
    * `docType` "webm" writes a WebM-flavored file (same grammar).
    */
  def write(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      audio: Option[(Array[Short], Int)] = None,
      subtitles: Seq[(Double, Double, String)] = Seq.empty,
      tags: Seq[(String, String)] = Seq.empty,
      docType: String = "matroska"): Array[Byte] = {
    require(frames.nonEmpty || audio.isDefined, "empty Matroska: no streams")
    require(frames.isEmpty || fps > 0, s"bad fps $fps")

    val videoDurMs = math.round(1000.0 / math.max(fps, 1))
    val vBlocks = frames.zipWithIndex.map { case (f, i) =>
      MuxBlock(1, math.round(i * 1000.0 / fps), videoDurMs, f, group = false)
    }
    val aBlocks = audio.toSeq.flatMap { case (samples, rate) =>
      val perBlock = math.max(rate / 10, 1) // ~100 ms
      samples.grouped(perBlock).zipWithIndex.map { case (chunk, i) =>
        val raw = new Array[Byte](chunk.length * 2)
        ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
          .asShortBuffer().put(chunk)
        MuxBlock(2, math.round(i.toLong * perBlock * 1000.0 / rate),
          math.round(chunk.length * 1000.0 / rate), raw, group = false)
      }.toSeq
    }
    val sBlocks = subtitles.map { case (s, e, text) =>
      MuxBlock(3, math.round(s * 1000), math.max(math.round((e - s) * 1000), 1),
        strBytes(text), group = true)
    }
    val all = (vBlocks ++ aBlocks ++ sBlocks).sortBy(b => (b.tsMs, b.track))
    val durMs = all.map(b => b.tsMs + b.durMs).foldLeft(0L)(math.max)

    val info = el(IdInfo,
      el(IdTimestampScale, uintBytes(1000000L)),
      el(IdMuxingApp, strBytes("graft")),
      el(IdWritingApp, strBytes("graft")),
      el(IdDuration, floatBytes(durMs.toDouble)))

    def trackEntry(num: Int, typ: Int, codec: String,
        extra: Array[Byte]*): Array[Byte] =
      el(IdTrackEntry,
        (el(IdTrackNumber, uintBytes(num.toLong)) ++
          el(IdTrackUid, uintBytes(num.toLong)) ++
          el(IdTrackType, uintBytes(typ.toLong)) ++
          el(IdFlagLacing, uintBytes(0L)) ++
          el(IdCodecId, strBytes(codec))) +:
          extra: _*)

    val trackEls = Seq(
      if (frames.nonEmpty) Some(trackEntry(1, 1, "V_MJPEG",
        el(IdDefaultDuration, uintBytes(math.round(1e9 / fps))),
        el(IdVideo,
          el(IdPixelWidth, uintBytes(w.toLong)),
          el(IdPixelHeight, uintBytes(h.toLong))))) else None,
      audio.map { case (_, rate) => trackEntry(2, 2, "A_PCM/INT/LIT",
        el(IdAudio,
          el(IdSamplingFrequency, floatBytes(rate.toDouble)),
          el(IdChannels, uintBytes(1L)),
          el(IdBitDepth, uintBytes(16L)))) },
      if (subtitles.nonEmpty) Some(trackEntry(3, 17, "S_TEXT/UTF8")) else None
    ).flatten
    val tracksEl = el(IdTracks, trackEls: _*)

    val tagsEl =
      if (tags.isEmpty) Array.empty[Byte]
      else el(IdTags, el(IdTag,
        tags.map { case (name, v) =>
          el(IdSimpleTag,
            el(IdTagName, strBytes(TagByFriendly.getOrElse(name, name))),
            el(IdTagString, strBytes(v)))
        }: _*))

    // clusters of ≤10 s (relative ts is s16 ms)
    val clusters = all.groupBy(_.tsMs / 10000).toSeq.sortBy(_._1).map {
      case (ci, blocks) =>
        val base = ci * 10000
        val els = blocks.map { b =>
          val rel = (b.tsMs - base).toInt
          val header = vint(b.track.toLong) ++
            Array[Byte]((rel >> 8).toByte, rel.toByte,
              (if (b.group) 0x00 else 0x80).toByte) // keyframe on SimpleBlock
          if (b.group)
            el(IdBlockGroup,
              el(IdBlock, header ++ b.data),
              el(IdBlockDuration, uintBytes(b.durMs)))
          else el(IdSimpleBlock, header ++ b.data)
        }
        (base, el(IdCluster,
          el(IdTimestamp, uintBytes(base)) +: els: _*))
    }

    // cue points: cluster positions relative to segment payload start
    val head = info ++ tracksEl ++ tagsEl
    val cuePoints = {
      var pos = head.length.toLong
      clusters.map { case (base, c) =>
        val p = el(IdCuePoint,
          el(IdCueTime, uintBytes(base)),
          el(IdCueTrackPositions,
            el(IdCueTrack, uintBytes(1L)),
            el(IdCueClusterPosition, uintBytes(pos))))
        pos += c.length
        p
      }
    }
    val cuesEl = el(IdCues, cuePoints: _*)

    val ebml = el(IdEbml,
      el(0x4286L, uintBytes(1L)), // EBMLVersion
      el(0x42F7L, uintBytes(1L)), // EBMLReadVersion
      el(0x42F2L, uintBytes(4L)), // EBMLMaxIDLength
      el(0x42F3L, uintBytes(8L)), // EBMLMaxSizeLength
      el(IdDocType, strBytes(docType)),
      el(0x4287L, uintBytes(4L)), // DocTypeVersion
      el(0x4285L, uintBytes(2L))) // DocTypeReadVersion
    val segment = el(IdSegment,
      (head +: clusters.map(_._2)) :+ cuesEl: _*)
    ebml ++ segment
  }
}
