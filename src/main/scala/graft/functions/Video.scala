package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** The reference's video operator family (`/root/reference/pixeltable/
  * functions/video/iterators.py:41-123` frame_iterator, `editing.py:91-810`
  * clip/extract_frame/concat_videos, metadata in `functions/video/
  * metadata.py`), implemented over a real container format the JVM can
  * handle without external codecs: MJPEG-in-AVI. The RIFF/AVI container
  * layer (headers, frame chunks, index) is written and parsed here byte-for
  * -byte; frame payloads are ordinary JPEGs handled by javax.imageio — the
  * same synth-then-process pattern the image/audio families use (q67/q69).
  *
  * Every op is a scalar UDF over a `binary` video column; header-only ops
  * (`getMetadata`, `frameCount`) never touch frame payload bytes, so
  * metadata extraction over 100 TB of video scans only KB-sized prefixes
  * per row.
  */
object Avi {

  final case class AviMeta(
      width: Int, height: Int, fps: Double, frames: Int,
      duration_s: Double, codec: String, format: String)

  private def le(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()

  private def le16(i: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(i.toShort).array()

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc(id)); bos.write(le(data.length)); bos.write(data)
    if (data.length % 2 == 1) bos.write(0) // RIFF chunks are word-aligned
    bos.toByteArray
  }

  private def list(listType: String, contents: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(listType) ++ contents)

  /** Assemble an MJPEG AVI from JPEG frames (all `w`×`h`, `fps` frames/s),
    * optionally with a PCM-16 mono audio track (`samples`, `sampleRate`) as
    * a second ('auds'/'01wb') stream — the with_audio layout.
    */
  def write(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      audio: Option[(Array[Short], Int)] = None): Array[Byte] = {
    require(frames.nonEmpty, "video needs at least one frame")
    require(fps > 0, s"bad fps $fps")
    val maxFrame = frames.map(_.length).max
    val nStreams = if (audio.isDefined) 2 else 1
    val avih = Array.concat(le(1000000 / fps), le(0), le(0), le(0x10),
      le(frames.length), le(0), le(nStreams), le(maxFrame), le(w), le(h),
      le(0), le(0), le(0), le(0))
    val strh = Array.concat(fourcc("vids"), fourcc("MJPG"), le(0), le(0),
      le(0), le(1), le(fps), le(0), le(frames.length), le(maxFrame),
      le(-1), le(0), le16(0), le16(0), le16(w), le16(h))
    val strf = Array.concat(le(40), le(w), le(h), le16(1), le16(24),
      fourcc("MJPG"), le(w * h * 3), le(0), le(0), le(0), le(0))
    val videoStrl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val audioStrl = audio.map { case (samples, rate) =>
      val aStrh = Array.concat(fourcc("auds"), le(0), le(0), le(0),
        le(0), le(1), le(rate), le(0), le(samples.length), le(samples.length * 2),
        le(-1), le(2), le16(0), le16(0), le16(0), le16(0))
      // WAVEFORMATEX: PCM, mono, 16-bit
      val aStrf = Array.concat(le16(1), le16(1), le(rate), le(rate * 2),
        le16(2), le16(16), le16(0))
      list("strl", chunk("strh", aStrh) ++ chunk("strf", aStrf))
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ videoStrl ++ audioStrl.getOrElse(Array.empty[Byte]))
    val audioChunk = audio.map { case (samples, _) =>
      val raw = new Array[Byte](samples.length * 2)
      ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer().put(samples)
      chunk("01wb", raw)
    }
    val frameChunks = frames.map(f => chunk("00dc", f))
    val moviChunks = frameChunks ++ audioChunk.toSeq
    val movi = list("movi", moviChunks.reduce(_ ++ _))
    // idx1 offsets are relative to the start of the movi list's data
    var off = 4 // past the "movi" fourcc
    val idxEntries = moviChunks.map { fc =>
      val id = new String(fc.take(4), "US-ASCII")
      val len = ByteBuffer.wrap(fc, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      val e = Array.concat(fourcc(id), le(0x10), le(off), le(len))
      off += fc.length
      e
    }
    val idx1 = chunk("idx1", idxEntries.reduce(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    Array.concat(fourcc("RIFF"), le(body.length), body)
  }

  /** The PCM-16 audio track (samples, sampleRate), if the AVI has one. */
  def readAudio(bytes: Array[Byte]): Option[(Array[Short], Int)] = {
    val b = buf(bytes)
    val cs = chunks(bytes)
    val aStrh = cs.find(c => c._1 == "strh" && fourccAt(b, c._3) == "auds")
    aStrh.map { c =>
      val rate = b.getInt(c._3 + 24)
      val pcm = cs.filter(_._1.endsWith("wb")).flatMap { case (_, _, pos, len) =>
        java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      }.toArray
      val samples = new Array[Short](pcm.length / 2)
      ByteBuffer.wrap(pcm).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer().get(samples)
      (samples, rate)
    }
  }

  private def buf(bytes: Array[Byte]) =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def fourccAt(b: ByteBuffer, pos: Int): String = {
    val a = new Array[Byte](4)
    var i = 0
    while (i < 4) { a(i) = b.get(pos + i); i += 1 }
    new String(a, "US-ASCII")
  }

  /** Walk top-level and nested RIFF chunks; returns (id, listType, dataPos,
    * dataLen) for every chunk, depth-first.
    */
  private def walk(b: ByteBuffer, from: Int, until: Int,
      out: scala.collection.mutable.ArrayBuffer[(String, String, Int, Int)]): Unit = {
    var pos = from
    while (pos + 8 <= until) {
      val id = fourccAt(b, pos)
      val len = b.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > until) return // corrupt; stop
      if (id == "LIST" || id == "RIFF") {
        val listType = fourccAt(b, pos + 8)
        out += ((id, listType, pos + 12, len - 4))
        walk(b, pos + 12, pos + 8 + len, out)
      } else out += ((id, "", pos + 8, len))
      pos += 8 + len + (len % 2)
    }
  }

  private def chunks(bytes: Array[Byte]): Seq[(String, String, Int, Int)] = {
    require(bytes != null && bytes.length >= 12 &&
      fourccAt(buf(bytes), 0) == "RIFF" && fourccAt(buf(bytes), 8) == "AVI ",
      "not an AVI (RIFF/AVI ) payload")
    val b = buf(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int, Int)]
    walk(b, 12, math.min(bytes.length, 8 + b.getInt(4)), out)
    out.toSeq
  }

  /** Container metadata from the header chunks only — frame payloads are
    * never read (header-only scan).
    */
  def readMeta(bytes: Array[Byte]): AviMeta = {
    val b = buf(bytes)
    val cs = chunks(bytes)
    val avih = cs.find(_._1 == "avih").getOrElse(sys.error("no avih header"))
    val strh = cs.find(c => c._1 == "strh" && fourccAt(b, c._3) == "vids")
    val codec = strh.map(c => fourccAt(b, c._3 + 4)).getOrElse("????")
    val (scale, rate, length) = strh match {
      case Some(c) => (b.getInt(c._3 + 20), b.getInt(c._3 + 24), b.getInt(c._3 + 32))
      case None    => (1, 0, 0)
    }
    val w = b.getInt(avih._3 + 32)
    val h = b.getInt(avih._3 + 36)
    val frames = if (length > 0) length else b.getInt(avih._3 + 16)
    val fps = if (scale > 0 && rate > 0) rate.toDouble / scale else 0.0
    val dur = if (fps > 0) frames / fps else 0.0
    AviMeta(w, h, fps, frames, dur, codec, "AVI")
  }

  /** The JPEG payload of every video frame chunk, in stream order. */
  def readFrames(bytes: Array[Byte]): Seq[Array[Byte]] =
    chunks(bytes).filter(c => c._1.endsWith("dc") || c._1.endsWith("db"))
      .map { case (_, _, pos, len) => java.util.Arrays.copyOfRange(bytes, pos, pos + len) }
}

object Video {

  /** deterministic synthetic video: `n` solid-color JPEG frames (frame i is
    * rgb+i), the video-family analog of `Images.makeSolidPng`.
    */
  def makeTestVideo(n: Int, w: Int, h: Int, rgb: Int, fps: Int): Array[Byte] = {
    val frames = (0 until n).map { i =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color((rgb + i) & 0xffffff))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    Avi.write(frames, w, h, fps)
  }

  /** deterministic multi-block test video: lens(i) identical solid frames
    * of color rgbs(i) — known scene-cut positions for the scene-detect
    * oracle gate (within a block consecutive frames are byte-identical
    * JPEGs, so every content score is exactly 0 off the boundaries).
    */
  def makeBlockVideo(lens: Seq[Int], rgbs: Seq[Int], w: Int, h: Int,
      fps: Int): Array[Byte] = {
    require(lens.length == rgbs.length, "lens/rgbs length mismatch")
    val frames = lens.zip(rgbs).flatMap { case (n, rgb) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb & 0xffffff))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val bytes = bos.toByteArray
      Seq.fill(n)(bytes)
    }
    Avi.write(frames, w, h, fps)
  }

  val makeBlockVideoUdf = udf {
    (lens: Seq[Int], rgbs: Seq[Int], w: Int, h: Int, fps: Int) =>
      makeBlockVideo(lens, rgbs, w, h, fps)
  }

  val makeTestVideoUdf = udf { (n: Int, w: Int, h: Int, rgb: Int, fps: Int) =>
    makeTestVideo(n, w, h, rgb, fps)
  }

  /** Content-sniffed container dispatch (the get_document_handle pattern
    * applied to video): every read-side op below accepts both RIFF-AVI
    * and ISO-BMFF/MP4 payloads — the reference's pyav opens either
    * (`functions/video/iterators.py:41`). Edit/encode outputs stay
    * MJPEG-AVI: decode-any, encode-one.
    */
  private[graft] def readMetaAny(bytes: Array[Byte]): Avi.AviMeta =
    if (Mp4.isMp4(bytes)) Mp4.readMeta(bytes)
    else if (Mkv.isMkv(bytes)) Mkv.readMeta(bytes)
    else Avi.readMeta(bytes)
  private[graft] def readFramesAny(bytes: Array[Byte]): Seq[Array[Byte]] =
    if (Mp4.isMp4(bytes)) Mp4.readFrames(bytes)
    else if (Mkv.isMkv(bytes)) Mkv.readFrames(bytes)
    else Avi.readFrames(bytes)
  private[graft] def readAudioAny(bytes: Array[Byte]): Option[(Array[Short], Int)] =
    if (Mp4.isMp4(bytes)) Mp4.readAudio(bytes)
    else if (Mkv.isMkv(bytes)) Mkv.readAudio(bytes)
    else Avi.readAudio(bytes)
  private[graft] def readSubtitlesAny(bytes: Array[Byte]): Seq[(Double, Double, String)] =
    if (Mp4.isMp4(bytes)) Mp4.readSubtitles(bytes)
    else if (Mkv.isMkv(bytes)) Mkv.readSubtitles(bytes)
    else Seq.empty

  /** Transcode to MP4 (re-mux: same JPEG frame payloads, same PCM
    * audio, ISO-BMFF sample tables) — the MP4 sink twin of the AVI
    * default, so MP4-in/MP4-out pipelines exist end to end.
    */
  val toMp4 = udf { (v: Array[Byte]) =>
    val meta = readMetaAny(v)
    Mp4.write(readFramesAny(v), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1), readAudioAny(v))
  }

  /** Transcode to fragmented MP4 (CMAF `moov(mvex) | (moof mdat)*`
    * layout, `framesPerFragment` video frames per fragment with the
    * PCM slice time-aligned) — the streaming-delivery sink twin;
    * `readMetaAny`/`readFramesAny`/`readAudioAny` sniff it like any
    * other MP4.
    */
  val toFmp4 = udf { (v: Array[Byte], framesPerFragment: Int) =>
    val meta = readMetaAny(v)
    Mp4.writeFragmented(readFramesAny(v), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1), readAudioAny(v), framesPerFragment)
  }

  /** Subtitle track as (start, end, text) cue structs — WebVTT-in-MP4
    * (ISO 14496-30 `wvtt` samples) or Matroska `S_TEXT/UTF8` blocks
    * (the reference surfaces/copies subtitle streams —
    * `utils/av.py:289`). AVI/absent track → empty.
    */
  val extractSubtitles = udf { (v: Array[Byte]) => readSubtitlesAny(v) }

  /** Transcode to Matroska (re-mux: same JPEG frame payloads, same PCM
    * audio, same subtitle cues, EBML clusters + cues) — the MKV sink
    * twin; `docType` "webm" writes the WebM flavor.
    */
  val toMkv = udf { (v: Array[Byte], docType: String) =>
    val meta = readMetaAny(v)
    Mkv.write(readFramesAny(v), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1), readAudioAny(v),
      subtitles = readSubtitlesAny(v), docType = docType)
  }

  /** Re-mux with a WebVTT subtitle track added from cue structs
    * (`array<struct<start double, end double, text string>>`).
    */
  val muxSubtitles = udf { (v: Array[Byte], cues: Seq[org.apache.spark.sql.Row]) =>
    val meta = readMetaAny(v)
    Mp4.write(readFramesAny(v), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1), readAudioAny(v),
      subtitles = cues.map(r =>
        (r.getDouble(0), r.getDouble(1), r.getString(2))))
  }

  /** Transcode to MJPEG-AVI (the inverse re-mux). */
  val toAvi = udf { (v: Array[Byte]) =>
    val meta = readMetaAny(v)
    Avi.write(readFramesAny(v), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1), readAudioAny(v))
  }

  /** get_metadata (reference `functions/video/metadata.py`): header-only. */
  val getMetadata = udf { (bytes: Array[Byte]) => readMetaAny(bytes) }

  val frameCount = udf { (bytes: Array[Byte]) => readMetaAny(bytes).frames }

  val duration = udf { (bytes: Array[Byte]) => readMetaAny(bytes).duration_s }

  /** extract_frame (reference `editing.py`): the i-th frame as JPEG bytes. */
  val extractFrame = udf { (bytes: Array[Byte], i: Int) =>
    val fs = readFramesAny(bytes)
    require(i >= 0 && i < fs.length, s"frame $i out of range 0..${fs.length - 1}")
    fs(i)
  }

  /** frame_iterator (reference `iterators.py:41-123`): one (pos, ts_s,
    * frame) struct per frame, for posexplode into a component view.
    * `everyNth` subsamples (the reference's fps arg reduced to stride).
    */
  val frameIterator = udf { (bytes: Array[Byte], everyNth: Int) =>
    val meta = readMetaAny(bytes)
    val step = math.max(everyNth, 1)
    readFramesAny(bytes).zipWithIndex.collect {
      case (f, i) if i % step == 0 =>
        (i, if (meta.fps > 0) i / meta.fps else 0.0, f)
    }
  }

  /** clip (reference `editing.py:91`): frames [startFrame, endFrame) as a
    * new video with the same dimensions/fps.
    */
  val clip = udf { (bytes: Array[Byte], startFrame: Int, endFrame: Int) =>
    val meta = readMetaAny(bytes)
    val fs = readFramesAny(bytes)
    val lo = math.max(startFrame, 0)
    val hi = math.min(endFrame, fs.length)
    require(lo < hi, s"empty clip [$startFrame, $endFrame) of ${fs.length} frames")
    Avi.write(fs.slice(lo, hi), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1))
  }

  /** Time-range clip that KEEPS every stream (the reference clips with
    * stream copy — video + audio + subtitles survive, `utils/av.py:289`):
    * video frames in [startSec, endSec), the PCM slice, and subtitle
    * cues intersected with the range and re-based to 0. MP4 in, MP4 out.
    */
  val clipMp4 = udf { (v: Array[Byte], startSec: Double, endSec: Double) =>
    clipMp4Bytes(v, startSec, endSec)
  }

  private[graft] def clipMp4Bytes(v: Array[Byte], startSec: Double,
      endSec: Double): Array[Byte] = {
    require(endSec > startSec, s"empty clip [$startSec, $endSec)")
    val meta = readMetaAny(v)
    val fps = math.max(meta.fps.round.toInt, 1)
    val fs = readFramesAny(v)
    val lo = math.max(math.round(startSec * fps).toInt, 0)
    val hi = math.min(math.round(endSec * fps).toInt, fs.length)
    require(lo < hi, s"clip [$startSec, $endSec) holds no frames at $fps fps")
    val audio = readAudioAny(v).map { case (samples, rate) =>
      val a = math.max(math.round(startSec * rate).toInt, 0)
      val b = math.min(math.round(endSec * rate).toInt, samples.length)
      (samples.slice(a, b), rate)
    }.filter(_._1.nonEmpty)
    val subs =
      readSubtitlesAny(v)
        .filter { case (s, e, _) => e > startSec && s < endSec }
        .map { case (s, e, text) =>
          (math.max(s, startSec) - startSec,
            math.min(e, endSec) - startSec, text)
        }
    Mp4.write(fs.slice(lo, hi), meta.width, meta.height, fps, audio,
      subtitles = subs)
  } // clipMp4Bytes

  /** make_video UDA (reference `functions/video/__init__.py` make_video,
    * an order-sensitive aggregate): collect (pos, jpegFrame) pairs and
    * assemble them into one MJPEG-AVI. Position metadata makes it
    * order-INsensitive here — partial aggregation composes and `finish`
    * sorts by pos — the same reformulation StitchTiles uses for
    * requires_order_by UDAs.
    */
  object MakeVideo extends org.apache.spark.sql.expressions.Aggregator[
      (Int, Array[Byte]), List[(Int, Array[Byte])], Array[Byte]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    def zero: List[(Int, Array[Byte])] = Nil
    def reduce(b: List[(Int, Array[Byte])], t: (Int, Array[Byte])): List[(Int, Array[Byte])] = t :: b
    def merge(a: List[(Int, Array[Byte])], b: List[(Int, Array[Byte])]): List[(Int, Array[Byte])] = a ++ b
    def finish(fs: List[(Int, Array[Byte])]): Array[Byte] = {
      if (fs.isEmpty) return null
      // transcode whatever image encoding arrives (PNG from the image ops,
      // JPEG from frame extraction) to JPEG so the MJPG stream is honest
      val imgs = fs.sortBy(_._1).map(t => Images.decode(t._2))
      val jpegs = imgs.map { img =>
        val rgb = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
        val bos = new ByteArrayOutputStream()
        javax.imageio.ImageIO.write(rgb, "jpg", bos)
        bos.toByteArray
      }
      Avi.write(jpegs, imgs.head.getWidth, imgs.head.getHeight, DefaultFps)
    }
    def bufferEncoder: Encoder[List[(Int, Array[Byte])]] =
      Encoders.kryo[List[(Int, Array[Byte])]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  val DefaultFps = 25 // the reference make_video default

  def make_video(pos: Column, frame: Column): Column =
    org.apache.spark.sql.functions.udaf(MakeVideo).apply(pos, frame)

  /** concat_videos (reference `editing.py`): frame-level concatenation;
    * requires matching dimensions (the reference re-encodes to the first
    * video's geometry — here geometry must already agree).
    */
  val concatVideos = udf { (a: Array[Byte], b: Array[Byte]) =>
    val ma = readMetaAny(a)
    val mb = readMetaAny(b)
    require(ma.width == mb.width && ma.height == mb.height,
      s"geometry mismatch: ${ma.width}x${ma.height} vs ${mb.width}x${mb.height}")
    Avi.write(readFramesAny(a) ++ readFramesAny(b), ma.width, ma.height,
      math.max(ma.fps.round.toInt, 1))
  }

  // ---- filter family (reference `functions/video/filters.py:18-1461`):
  // decode frames → the image-family kernels → re-encode. Each filter is a
  // per-row UDF; at scale the per-video work stays on the executor that
  // holds the row, exactly like the reference's per-file ffmpeg calls. ----

  private def toJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    // JPEG handles gray natively; anything else goes through RGB (alpha
    // types fail ImageIO's jpg writer)
    val out =
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY ||
          img.getType == java.awt.image.BufferedImage.TYPE_INT_RGB) img
      else {
        val rgb = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
        rgb
      }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "jpg", bos)
    bos.toByteArray
  }

  /** apply an image transform to every frame, keeping fps and audio */
  private def mapFrames(bytes: Array[Byte])(
      f: (java.awt.image.BufferedImage, Int, Int) => java.awt.image.BufferedImage): Array[Byte] = {
    val meta = readMetaAny(bytes)
    val frames = readFramesAny(bytes)
    val n = frames.length
    val out = frames.zipWithIndex.map { case (fb, i) =>
      toJpeg(f(Images.decode(fb), i, n))
    }
    val first = Images.decode(out.head)
    Avi.write(out, first.getWidth, first.getHeight,
      math.max(meta.fps.round.toInt, 1), readAudioAny(bytes))
  }

  val cropVideo = udf { (v: Array[Byte], l: Int, u: Int, r: Int, lo: Int) =>
    mapFrames(v)((img, _, _) => img.getSubimage(l, u, r - l, lo - u))
  }

  val resizeVideo = udf { (v: Array[Byte], w: Int, h: Int) =>
    mapFrames(v) { (img, _, _) =>
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null); g.dispose()
      dst
    }
  }

  /** rotate all frames by 90/180/270 degrees ccw */
  val rotateVideo = udf { (v: Array[Byte], degrees: Int) =>
    val deg = ((degrees % 360) + 360) % 360
    require(deg % 90 == 0, s"only multiples of 90, got $degrees")
    mapFrames(v) { (img, _, _) =>
      val (w, h) = (img.getWidth, img.getHeight)
      val (nw, nh) = if (deg % 180 == 0) (w, h) else (h, w)
      val dst = new java.awt.image.BufferedImage(nw, nh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val (nx, ny) = deg match {
          case 0 => (x, y); case 90 => (y, w - 1 - x)
          case 180 => (w - 1 - x, h - 1 - y); case 270 => (h - 1 - y, x)
        }
        dst.setRGB(nx, ny, img.getRGB(x, y))
      }
      dst
    }
  }

  val grayscaleVideo = udf { (v: Array[Byte]) =>
    mapFrames(v) { (img, _, _) =>
      val dst = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = dst.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
      dst
    }
  }

  private def flip(img: java.awt.image.BufferedImage, horizontal: Boolean) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val dst = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      dst.setRGB(if (horizontal) w - 1 - x else x,
        if (horizontal) y else h - 1 - y, img.getRGB(x, y))
    dst
  }

  val mirrorX = udf { (v: Array[Byte]) => mapFrames(v)((i, _, _) => flip(i, true)) }
  val mirrorY = udf { (v: Array[Byte]) => mapFrames(v)((i, _, _) => flip(i, false)) }

  private def scaleBrightness(img: java.awt.image.BufferedImage, factor: Double) = {
    val dst = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until img.getWidth; y <- 0 until img.getHeight) {
      val p = img.getRGB(x, y)
      def s(v: Int) = math.max(0, math.min(255, math.round(v * factor).toInt))
      dst.setRGB(x, y, (s((p >> 16) & 0xff) << 16) | (s((p >> 8) & 0xff) << 8) | s(p & 0xff))
    }
    dst
  }

  val adjustBrightness = udf { (v: Array[Byte], factor: Double) =>
    mapFrames(v)((img, _, _) => scaleBrightness(img, factor))
  }

  /** fade_in/fade_out over the first/last `frames` frames (linear ramp) */
  val fadeIn = udf { (v: Array[Byte], nFade: Int) =>
    mapFrames(v)((img, i, _) =>
      if (i >= nFade) img else scaleBrightness(img, i.toDouble / nFade))
  }

  val fadeOut = udf { (v: Array[Byte], nFade: Int) =>
    mapFrames(v)((img, i, n) =>
      if (i < n - nFade) img else scaleBrightness(img, (n - 1 - i).toDouble / nFade))
  }

  /** overlay_text at (x, y) on every frame */
  val overlayText = udf { (v: Array[Byte], text: String, x: Int, y: Int) =>
    mapFrames(v) { (img, _, _) =>
      val dst = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.drawImage(img, 0, 0, null)
      g.setColor(java.awt.Color.WHITE)
      g.drawString(text, x, y)
      g.dispose()
      dst
    }
  }

  /** reverse: frame order inverted WITHOUT re-encoding (chunk reorder);
    * the audio track reverses sample-wise.
    */
  val reverseVideo = udf { (v: Array[Byte]) =>
    val meta = readMetaAny(v)
    Avi.write(readFramesAny(v).reverse, meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1),
      readAudioAny(v).map { case (s, r) => (s.reverse, r) })
  }

  /** speed: retime by changing fps (frames untouched); audio resamples
    * linearly to keep pitch-naive sync, like ffmpeg's setpts+atempo shape.
    */
  val speed = udf { (v: Array[Byte], factor: Double) =>
    require(factor > 0, s"bad speed $factor")
    val meta = readMetaAny(v)
    val newFps = math.max((meta.fps * factor).round.toInt, 1)
    val audio = readAudioAny(v).map { case (s, r) =>
      val outLen = math.max((s.length / factor).toInt, 1)
      (Array.tabulate(outLen) { i =>
        val pos = i * factor
        val j = math.min(pos.toInt, s.length - 1)
        val k = math.min(j + 1, s.length - 1)
        val frac = pos - j
        (s(j) * (1 - frac) + s(k) * frac).toShort
      }, r)
    }
    Avi.write(readFramesAny(v), meta.width, meta.height, newFps, audio)
  }

  /** segment_video: split into ceil(n / framesPerSegment) clips (array of
    * videos, for posexplode into a component view).
    */
  val segmentVideo = udf { (v: Array[Byte], framesPerSegment: Int) =>
    require(framesPerSegment > 0)
    val meta = readMetaAny(v)
    readFramesAny(v).grouped(framesPerSegment).map { seg =>
      Avi.write(seg, meta.width, meta.height, math.max(meta.fps.round.toInt, 1))
    }.toSeq
  }

  /** One `video_splitter` output row (reference `functions/video/
    * iterators.py:345` VideoSegment): the segment clip plus where it falls
    * in the source. pts are frame indices (the AVI scale-tick timebase).
    */
  final case class VideoSegment(segment_start: Double,
      segment_start_pts: Long, segment_end: Double, segment_end_pts: Long,
      video_segment: Array[Byte])

  private def sliceSegment(frames: Seq[Array[Byte]], meta: Avi.AviMeta,
      fps: Double, i0: Int, i1: Int): VideoSegment =
    VideoSegment(i0 / fps, i0.toLong, i1 / fps, i1.toLong,
      Avi.write(frames.slice(i0, i1), meta.width, meta.height,
        math.max(1, fps.round.toInt)))

  /** video_splitter duration mode (reference `functions/video/
    * iterators.py:361`): segments of `durationS` seconds starting every
    * `durationS − overlapS`; the LAST segment is dropped when shorter than
    * `minSegmentS` (only the last can be short — interior segments are
    * full-length by construction). Frame-snapped on the fixed-fps AVI
    * timeline, so segment boundaries are exact.
    */
  val videoSplitter = udf {
    (v: Array[Byte], durationS: Double, overlapS: Double, minSegmentS: Double) =>
      require(durationS > 0, s"bad duration $durationS")
      require(overlapS >= 0 && overlapS < durationS, s"bad overlap $overlapS")
      val meta = readMetaAny(v)
      val fps = if (meta.fps > 0) meta.fps else 30.0
      val frames = readFramesAny(v)
      val step = durationS - overlapS
      val segs = Iterator.from(0)
        .map(k => math.round(k * step * fps).toInt)
        .takeWhile(_ < frames.length)
        .map { i0 =>
          val i1 = math.min(frames.length,
            i0 + math.round(durationS * fps).toInt)
          sliceSegment(frames, meta, fps, i0, i1)
        }
        .toVector
      // drop test in frame space: (end−start)/fps is exact, a difference
      // of two rounded times is not
      if (segs.nonEmpty &&
          (segs.last.segment_end_pts - segs.last.segment_start_pts) / fps
            < minSegmentS)
        segs.dropRight(1)
      else segs
  }

  /** video_splitter segment_times mode: split at explicit timestamps
    * (seconds). Times at/after the video end are ignored; `[]` yields one
    * whole-video segment — `len(times)+1` segments when all times fall
    * inside the video, matching the reference contract.
    */
  val videoSplitterAt = udf { (v: Array[Byte], times: Seq[Double]) =>
    val meta = readMetaAny(v)
    val fps = if (meta.fps > 0) meta.fps else 30.0
    val frames = readFramesAny(v)
    val total = frames.length / fps
    val bounds = (0.0 +: times.sorted.filter(t => t > 0 && t < total))
      .map(t => math.ceil(t * fps - 1e-9).toInt) :+ frames.length
    bounds.sliding(2).collect {
      case Seq(i0, i1) if i1 > i0 => sliceSegment(frames, meta, fps, i0, i1)
    }.toVector
  }

  /** scene_detect: frame indices where the mean absolute pixel delta vs the
    * previous frame exceeds `threshold` (0..255 scale).
    */
  val sceneDetect = udf { (v: Array[Byte], threshold: Double) =>
    val frames = readFramesAny(v).map(Images.decode)
    (1 until frames.length).filter { i =>
      val (a, b) = (frames(i - 1), frames(i))
      val n = math.min(a.getWidth, b.getWidth) * math.min(a.getHeight, b.getHeight)
      var sum = 0.0
      for (x <- 0 until math.min(a.getWidth, b.getWidth);
           y <- 0 until math.min(a.getHeight, b.getHeight)) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        sum += math.abs(((pa >> 16) & 0xff) - ((pb >> 16) & 0xff)) +
          math.abs(((pa >> 8) & 0xff) - ((pb >> 8) & 0xff)) +
          math.abs((pa & 0xff) - (pb & 0xff))
      }
      sum / (3.0 * n) > threshold
    }
  }

  // ---- audio track ops (reference `editing.py` extract_audio/with_audio/
  // mix_audio) ----

  /** with_audio: attach a mono PCM-16 WAV as the AVI's audio track. */
  val withAudio = udf { (v: Array[Byte], wav: Array[Byte]) =>
    val meta = readMetaAny(v)
    val (fmt, samples) = Audio.decodePcm(wav)
    Avi.write(readFramesAny(v), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1), Some((samples, fmt.getSampleRate.toInt)))
  }

  /** (codec, elementary-stream bytes) of an MP4's or Matroska's
    * compressed audio track (mp3/aac/opus/vorbis —
    * `Mp4.extractAudioStream` / `Mkv.extractAudioStream`); null for PCM
    * tracks (those land in `extractAudio` as WAV) and AVI inputs.
    */
  val extractAudioStream = udf { (v: Array[Byte]) =>
    if (Mp4.isMp4(v)) Mp4.extractAudioStream(v).orNull
    else if (Mkv.isMkv(v)) Mkv.extractAudioStream(v).orNull
    else null
  }

  /** extract_audio: the AVI's audio track as a WAV (null if none). */
  val extractAudio = udf { (v: Array[Byte]) =>
    readAudioAny(v).map { case (samples, rate) =>
      Audio.encodeWav(samples, rate.toFloat)
    }.orNull
  }

  /** mix_audio: average the existing track with a WAV (or adopt it). */
  val mixAudio = udf { (v: Array[Byte], wav: Array[Byte]) =>
    val meta = readMetaAny(v)
    val (fmt, incoming) = Audio.decodePcm(wav)
    val mixed = readAudioAny(v) match {
      case Some((existing, rate)) =>
        require(rate == fmt.getSampleRate.toInt, "sample-rate mismatch")
        val n = math.max(existing.length, incoming.length)
        (Array.tabulate(n) { i =>
          val a = if (i < existing.length) existing(i).toInt else 0
          val b = if (i < incoming.length) incoming(i).toInt else 0
          ((a + b) / 2).toShort
        }, rate)
      case None => (incoming, fmt.getSampleRate.toInt)
    }
    Avi.write(readFramesAny(v), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1), Some(mixed))
  }

  // ---- remaining filters.py surface: overlay_image, transition, scroll,
  // pan, zoom (reference `filters.py:253,799,1276,1390,1461`). Same shape
  // as the rest of the family: per-row frame kernels on java.awt, standing
  // in for the reference's per-file ffmpeg filter graphs. ----

  /** overlay_image: composite `img` onto every frame. Alignment + margin
    * place it; `scale` (NaN = original size) sizes it relative to the video
    * HEIGHT keeping aspect; `opacity` in [0,1]; visible for frame times in
    * [startSec, endSec) with NaN = unbounded (reference None).
    */
  val overlayImage = udf { (v: Array[Byte], img: Array[Byte], hAlign: String,
      hMargin: Int, vAlign: String, vMargin: Int, scale: Double,
      opacity: Double, startSec: Double, endSec: Double) =>
    require(opacity >= 0.0 && opacity <= 1.0, s"bad opacity $opacity")
    val meta = readMetaAny(v)
    val fps = math.max(meta.fps, 1e-9)
    val raw = Images.decode(img)
    val over =
      if (scale.isNaN) raw
      else {
        require(scale > 0, s"bad scale $scale")
        val oh = math.max(math.round(meta.height * scale).toInt, 1)
        val ow = math.max(math.round(raw.getWidth.toDouble * oh / raw.getHeight).toInt, 1)
        val dst = new java.awt.image.BufferedImage(ow, oh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(raw, 0, 0, ow, oh, null); g.dispose()
        dst
      }
    val x = hAlign match {
      case "left" => hMargin
      case "right" => meta.width - over.getWidth - hMargin
      case "center" => (meta.width - over.getWidth) / 2
      case other => sys.error(s"bad horizontal_align '$other'")
    }
    val y = vAlign match {
      case "top" => vMargin
      case "bottom" => meta.height - over.getHeight - vMargin
      case "center" => (meta.height - over.getHeight) / 2
      case other => sys.error(s"bad vertical_align '$other'")
    }
    mapFrames(v) { (frame, i, _) =>
      val t = i / fps
      val visible = (startSec.isNaN || t >= startSec) && (endSec.isNaN || t < endSec)
      if (!visible) frame
      else {
        val dst = new java.awt.image.BufferedImage(frame.getWidth,
          frame.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.drawImage(frame, 0, 0, null)
        g.setComposite(java.awt.AlphaComposite.getInstance(
          java.awt.AlphaComposite.SRC_OVER, opacity.toFloat))
        g.drawImage(over, x, y, null)
        g.dispose()
        dst
      }
    }
  }

  /** Per-pixel blend factor (0 = all first clip, 1 = all second) for one
    * transition frame at progress p ∈ (0,1). `dissolve` uses a
    * deterministic per-pixel hash threshold (reference ffmpeg uses noise);
    * `smooth*` are wipes with a quarter-frame smoothstep band.
    */
  private def transitionWeight(effect: String, p: Double, x: Int, y: Int,
      w: Int, h: Int): Double = {
    def clamp01(d: Double) = math.max(0.0, math.min(1.0, d))
    def smooth(d: Double) = { val t = clamp01(d); t * t * (3 - 2 * t) }
    effect match {
      case "fade" => p
      case "dissolve" =>
        val bits = scala.util.hashing.MurmurHash3.productHash((x, y))
        if (((bits & 0xffff).toDouble / 65536.0) < p) 1.0 else 0.0
      case "wipeleft" => if (x >= w * (1 - p)) 1.0 else 0.0
      case "wiperight" => if (x < w * p) 1.0 else 0.0
      case "wipeup" => if (y >= h * (1 - p)) 1.0 else 0.0
      case "wipedown" => if (y < h * p) 1.0 else 0.0
      case "smoothleft" => smooth((w * (1 + 0.25) * p - (w - 1 - x)) / (w * 0.25))
      case "smoothright" => smooth((w * (1 + 0.25) * p - x) / (w * 0.25))
      case "smoothup" => smooth((h * (1 + 0.25) * p - (h - 1 - y)) / (h * 0.25))
      case "smoothdown" => smooth((h * (1 + 0.25) * p - y) / (h * 0.25))
      case other => sys.error(s"bad transition effect '$other'")
    }
  }

  /** transition (xfade): join two clips overlapping the last/first
    * `durationSec` seconds; output length = n1 + n2 − overlap frames.
    * `slide*` translate the incoming frame; everything else blends via
    * `transitionWeight`. Geometry must match (as concat_videos).
    */
  val transition = udf { (a: Array[Byte], b: Array[Byte], effect: String,
      durationSec: Double) =>
    val ma = readMetaAny(a)
    val mb = readMetaAny(b)
    require(ma.width == mb.width && ma.height == mb.height,
      s"geometry mismatch: ${ma.width}x${ma.height} vs ${mb.width}x${mb.height}")
    val fps = math.max(ma.fps.round.toInt, 1)
    val fa = readFramesAny(a)
    val fb = readFramesAny(b)
    val overlap = math.max(0, math.min(math.min(fa.length, fb.length),
      math.round(durationSec * fps).toInt))
    val (w, h) = (ma.width, ma.height)
    val blended = (0 until overlap).map { j =>
      val p = (j + 1).toDouble / (overlap + 1) // strictly inside (0,1)
      val ia = Images.decode(fa(fa.length - overlap + j))
      val ib = Images.decode(fb(j))
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      if (effect.startsWith("slide")) {
        val g = dst.createGraphics()
        val (dx, dy) = effect match {
          case "slideleft" => (-(w * p).round.toInt, 0)
          case "slideright" => ((w * p).round.toInt, 0)
          case "slideup" => (0, -(h * p).round.toInt)
          case "slidedown" => (0, (h * p).round.toInt)
          case other => sys.error(s"bad transition effect '$other'")
        }
        g.drawImage(ia, dx, dy, null)
        // incoming frame trails the outgoing one by a full frame size
        g.drawImage(ib, dx - Integer.signum(dx) * w, dy - Integer.signum(dy) * h, null)
        g.dispose()
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val wt = transitionWeight(effect, p, x, y, w, h)
            val pa = ia.getRGB(x, y); val pb = ib.getRGB(x, y)
            def mix(sh: Int) = {
              val ca = (pa >> sh) & 0xff; val cb = (pb >> sh) & 0xff
              math.round(ca * (1 - wt) + cb * wt).toInt & 0xff
            }
            dst.setRGB(x, y, (mix(16) << 16) | (mix(8) << 8) | mix(0))
            x += 1
          }
          y += 1
        }
      }
      toJpeg(dst)
    }
    val out = fa.dropRight(overlap) ++ blended ++ fb.drop(overlap)
    Avi.write(out, w, h, fps)
  }

  /** scroll: extract a (w × h) viewport whose origin starts at
    * (xStart, yStart) and moves at (xSpeed, ySpeed) px/sec, clamped at the
    * frame edges; w/h ≤ 0 mean "input size" (reference None).
    */
  val scroll = udf { (v: Array[Byte], w: Int, h: Int, xSpeed: Double,
      ySpeed: Double, xStart: Int, yStart: Int) =>
    val meta = readMetaAny(v)
    val vw = if (w <= 0) meta.width else w
    val vh = if (h <= 0) meta.height else h
    require(vw <= meta.width && vh <= meta.height,
      s"viewport ${vw}x$vh exceeds ${meta.width}x${meta.height}")
    val fps = math.max(meta.fps, 1e-9)
    def clamp(d: Double, hi: Int) = math.max(0, math.min(hi, d.round.toInt))
    mapFrames(v) { (img, i, _) =>
      val t = i / fps
      img.getSubimage(clamp(xStart + xSpeed * t, meta.width - vw),
        clamp(yStart + ySpeed * t, meta.height - vh), vw, vh)
    }
  }

  /** pan: scroll() convenience — the viewport (sized by cropPct on each
    * moving axis) sweeps its full range over the clip's duration;
    * sign = +1 right/down, −1 left/up, 0 no motion on that axis.
    */
  val pan = udf { (v: Array[Byte], xSign: Int, ySign: Int, cropPct: Double) =>
    require(xSign != 0 || ySign != 0, "at least one of x_sign/y_sign must be nonzero")
    require(cropPct > 0.0 && cropPct < 1.0, s"bad crop_pct $cropPct")
    val meta = readMetaAny(v)
    val vw = math.floor(meta.width * (1 - cropPct * math.abs(xSign))).toInt
    val vh = math.floor(meta.height * (1 - cropPct * math.abs(ySign))).toInt
    val (rangeX, rangeY) = (meta.width - vw, meta.height - vh)
    val x0 = math.floor(rangeX * (1 - xSign) / 2.0).toInt
    val y0 = math.floor(rangeY * (1 - ySign) / 2.0).toInt
    val dur = math.max(meta.duration_s, 1e-9)
    val fps = math.max(meta.fps, 1e-9)
    def clamp(d: Double, hi: Int) = math.max(0, math.min(hi, d.round.toInt))
    mapFrames(v) { (img, i, _) =>
      val t = i / fps
      img.getSubimage(clamp(x0 + rangeX / dur * xSign * t, rangeX),
        clamp(y0 + rangeY / dur * ySign * t, rangeY), vw, vh)
    }
  }

  /** zoom (zoompan): zoom factor interpolates linearly start→end over the
    * clip; each frame crops a (W/s × H/s) region centered on normalized
    * (cx, cy) — clamped inside the frame — and scales it back to W × H.
    */
  val zoom = udf { (v: Array[Byte], startScale: Double, endScale: Double,
      cx: Double, cy: Double) =>
    require(startScale >= 1.0 && endScale >= 1.0,
      s"scales must be >= 1.0, got $startScale/$endScale")
    require(cx >= 0.0 && cx <= 1.0 && cy >= 0.0 && cy <= 1.0,
      s"center must be in [0,1], got [$cx, $cy]")
    mapFrames(v) { (img, i, n) =>
      val frac = if (n <= 1) 0.0 else i.toDouble / (n - 1)
      val s = startScale + (endScale - startScale) * frac
      val (w, h) = (img.getWidth, img.getHeight)
      val cw = math.max(math.round(w / s).toInt, 1)
      val ch = math.max(math.round(h / s).toInt, 1)
      val x0 = math.max(0, math.min(w - cw, math.round(cx * w - cw / 2.0).toInt))
      val y0 = math.max(0, math.min(h - ch, math.round(cy * h - ch / 2.0).toInt))
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img.getSubimage(x0, y0, cw, ch), 0, 0, w, h, null)
      g.dispose()
      dst
    }
  }
}
