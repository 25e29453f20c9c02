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

  /** Assemble an MJPEG AVI from JPEG frames (all `w`×`h`, `fps` frames/s). */
  def write(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    require(frames.nonEmpty, "video needs at least one frame")
    require(fps > 0, s"bad fps $fps")
    val maxFrame = frames.map(_.length).max
    val avih = Array.concat(le(1000000 / fps), le(0), le(0), le(0x10),
      le(frames.length), le(0), le(1), le(maxFrame), le(w), le(h),
      le(0), le(0), le(0), le(0))
    val strh = Array.concat(fourcc("vids"), fourcc("MJPG"), le(0), le(0),
      le(0), le(1), le(fps), le(0), le(frames.length), le(maxFrame),
      le(-1), le(0), le16(0), le16(0), le16(w), le16(h))
    val strf = Array.concat(le(40), le(w), le(h), le16(1), le16(24),
      fourcc("MJPG"), le(w * h * 3), le(0), le(0), le(0), le(0))
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", frameChunks.reduce(_ ++ _))
    // idx1 offsets are relative to the start of the movi list's data
    var off = 4 // past the "movi" fourcc
    val idxEntries = frames.zip(frameChunks).map { case (f, fc) =>
      val e = Array.concat(fourcc("00dc"), le(0x10), le(off), le(f.length))
      off += fc.length
      e
    }
    val idx1 = chunk("idx1", idxEntries.reduce(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    Array.concat(fourcc("RIFF"), le(body.length), body)
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

  val makeTestVideoUdf = udf { (n: Int, w: Int, h: Int, rgb: Int, fps: Int) =>
    makeTestVideo(n, w, h, rgb, fps)
  }

  /** get_metadata (reference `functions/video/metadata.py`): header-only. */
  val getMetadata = udf { (bytes: Array[Byte]) => Avi.readMeta(bytes) }

  val frameCount = udf { (bytes: Array[Byte]) => Avi.readMeta(bytes).frames }

  val duration = udf { (bytes: Array[Byte]) => Avi.readMeta(bytes).duration_s }

  /** extract_frame (reference `editing.py`): the i-th frame as JPEG bytes. */
  val extractFrame = udf { (bytes: Array[Byte], i: Int) =>
    val fs = Avi.readFrames(bytes)
    require(i >= 0 && i < fs.length, s"frame $i out of range 0..${fs.length - 1}")
    fs(i)
  }

  /** frame_iterator (reference `iterators.py:41-123`): one (pos, ts_s,
    * frame) struct per frame, for posexplode into a component view.
    * `everyNth` subsamples (the reference's fps arg reduced to stride).
    */
  val frameIterator = udf { (bytes: Array[Byte], everyNth: Int) =>
    val meta = Avi.readMeta(bytes)
    val step = math.max(everyNth, 1)
    Avi.readFrames(bytes).zipWithIndex.collect {
      case (f, i) if i % step == 0 =>
        (i, if (meta.fps > 0) i / meta.fps else 0.0, f)
    }
  }

  /** clip (reference `editing.py:91`): frames [startFrame, endFrame) as a
    * new video with the same dimensions/fps.
    */
  val clip = udf { (bytes: Array[Byte], startFrame: Int, endFrame: Int) =>
    val meta = Avi.readMeta(bytes)
    val fs = Avi.readFrames(bytes)
    val lo = math.max(startFrame, 0)
    val hi = math.min(endFrame, fs.length)
    require(lo < hi, s"empty clip [$startFrame, $endFrame) of ${fs.length} frames")
    Avi.write(fs.slice(lo, hi), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1))
  }

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
    val ma = Avi.readMeta(a)
    val mb = Avi.readMeta(b)
    require(ma.width == mb.width && ma.height == mb.height,
      s"geometry mismatch: ${ma.width}x${ma.height} vs ${mb.width}x${mb.height}")
    Avi.write(Avi.readFrames(a) ++ Avi.readFrames(b), ma.width, ma.height,
      math.max(ma.fps.round.toInt, 1))
  }
}
