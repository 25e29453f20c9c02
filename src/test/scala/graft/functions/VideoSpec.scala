package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Video family over the pure-JVM MJPEG-in-AVI container: writer/parser
  * round trip, header-only metadata, frame extraction (JPEG decodes to the
  * source geometry), clip and concat arithmetic.
  */
class VideoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AVI round trip: metadata and frames") {
    val vid = Video.makeTestVideo(n = 7, w = 32, h = 24, rgb = 0x336699, fps = 10)
    val meta = Avi.readMeta(vid)
    assert(meta.width == 32 && meta.height == 24)
    assert(meta.frames == 7 && meta.fps == 10.0)
    assert(meta.duration_s == 0.7)
    assert(meta.codec == "MJPG" && meta.format == "AVI")
    val frames = Avi.readFrames(vid)
    assert(frames.length == 7)
    // every frame is a real JPEG with the container's geometry
    frames.foreach { f =>
      val img = Images.decode(f)
      assert(img.getWidth == 32 && img.getHeight == 24)
    }
  }

  test("extract_frame returns the exact stored JPEG") {
    val vid = Video.makeTestVideo(3, 16, 16, 0x102030, 5)
    val fs = Avi.readFrames(vid)
    val df = Seq(Tuple1(vid)).toDF("v")
      .select(Video.extractFrame(col("v"), lit(1)).as("f"))
    assert(java.util.Arrays.equals(df.head().getAs[Array[Byte]]("f"), fs(1)))
  }

  test("clip keeps geometry and the requested frame range") {
    val vid = Video.makeTestVideo(10, 20, 10, 0xff0000, 4)
    val df = Seq(Tuple1(vid)).toDF("v")
      .select(Video.clip(col("v"), lit(2), lit(6)).as("c"))
    val clipped = df.head().getAs[Array[Byte]]("c")
    val meta = Avi.readMeta(clipped)
    assert(meta.frames == 4 && meta.width == 20 && meta.height == 10 && meta.fps == 4.0)
    // clip frames are byte-identical to the source's frames 2..5
    val src = Avi.readFrames(vid)
    val got = Avi.readFrames(clipped)
    (0 until 4).foreach(i => assert(java.util.Arrays.equals(got(i), src(i + 2))))
  }

  test("concat_videos appends frames; geometry must match") {
    val a = Video.makeTestVideo(3, 16, 16, 0x111111, 8)
    val b = Video.makeTestVideo(4, 16, 16, 0x222222, 8)
    val df = Seq((a, b)).toDF("a", "b")
      .select(Video.concatVideos(col("a"), col("b")).as("c"))
    assert(Avi.readMeta(df.head().getAs[Array[Byte]]("c")).frames == 7)
    val bad = Video.makeTestVideo(2, 8, 8, 0x333333, 8)
    val err = intercept[Exception] {
      Seq((a, bad)).toDF("a", "b")
        .select(Video.concatVideos(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("geometry") || err.getCause != null)
  }

  test("frame_iterator explodes to (pos, ts, frame) with stride") {
    val vid = Video.makeTestVideo(9, 12, 12, 0x445566, 3)
    val rows = Seq(Tuple1(vid)).toDF("v")
      .select(explode(Video.frameIterator(col("v"), lit(2))).as("f"))
      .select(col("f._1").as("pos"), col("f._2").as("ts"))
      .collect()
    assert(rows.map(_.getAs[Int]("pos")).toSeq == Seq(0, 2, 4, 6, 8))
    assert(rows.map(_.getAs[Double]("ts")).toSeq == Seq(0.0, 2 / 3.0, 4 / 3.0, 2.0, 8 / 3.0))
  }

  test("metadata read does not require frame payloads (header-only)") {
    val vid = Video.makeTestVideo(5, 16, 16, 0x0, 10)
    // corrupt every frame payload byte; header parsing must still work
    val frames = Avi.readFrames(vid)
    val corrupted = vid.clone()
    // find the first frame's bytes and zero them in place
    val idx = indexOfSlice(corrupted, frames.head)
    java.util.Arrays.fill(corrupted, idx, idx + frames.head.length, 0.toByte)
    val meta = Avi.readMeta(corrupted)
    assert(meta.frames == 5 && meta.width == 16)
  }

  test("filters: crop/resize/rotate/grayscale change geometry as expected") {
    val vid = Video.makeTestVideo(4, 20, 10, 0x406080, 5)
    val df = Seq(Tuple1(vid)).toDF("v")
    def meta(c: org.apache.spark.sql.Column) =
      Avi.readMeta(df.select(c.as("r")).head().getAs[Array[Byte]]("r"))
    assert(meta(Video.cropVideo(col("v"), lit(2), lit(1), lit(12), lit(9))).width == 10)
    assert(meta(Video.resizeVideo(col("v"), lit(40), lit(20))).width == 40)
    val rot = meta(Video.rotateVideo(col("v"), lit(90)))
    assert(rot.width == 10 && rot.height == 20)
    val gray = df.select(Video.grayscaleVideo(col("v")).as("r")).head().getAs[Array[Byte]]("r")
    assert(Images.mode(Images.decode(Avi.readFrames(gray).head)) == "L")
  }

  test("reverse reorders stored frames byte-identically; speed retimes fps") {
    val vid = Video.makeTestVideo(5, 8, 8, 0x111111, 10)
    val df = Seq(Tuple1(vid)).toDF("v")
    val rev = df.select(Video.reverseVideo(col("v")).as("r")).head().getAs[Array[Byte]]("r")
    val src = Avi.readFrames(vid)
    val got = Avi.readFrames(rev)
    (0 until 5).foreach(i => assert(java.util.Arrays.equals(got(i), src(4 - i))))
    val fast = df.select(Video.speed(col("v"), lit(2.0)).as("r")).head().getAs[Array[Byte]]("r")
    val m = Avi.readMeta(fast)
    assert(m.fps == 20.0 && m.frames == 5 && m.duration_s == 0.25)
  }

  test("fades scale brightness at the ends; brightness clamps") {
    val vid = Video.makeTestVideo(4, 4, 4, 0x808080, 4)
    val df = Seq(Tuple1(vid)).toDF("v")
    val faded = df.select(Video.fadeIn(col("v"), lit(4)).as("r")).head().getAs[Array[Byte]]("r")
    val f0 = Images.decode(Avi.readFrames(faded).head)
    assert((f0.getRGB(0, 0) & 0xff) <= 2) // frame 0 scaled by 0/4 (jpeg noise tolerance)
    val bright = df.select(Video.adjustBrightness(col("v"), lit(10.0)).as("r"))
      .head().getAs[Array[Byte]]("r")
    assert((Images.decode(Avi.readFrames(bright).head).getRGB(0, 0) & 0xff) >= 250)
  }

  test("audio track: with_audio → extract_audio round trip, mix, segment") {
    val vid = Video.makeTestVideo(4, 8, 8, 0x123456, 4)
    val wav = Audio.sineWav(0.5, 440.0) // 8000 samples at 16k
    val df = Seq((vid, wav)).toDF("v", "w")
    val withA = df.select(Video.withAudio(col("v"), col("w")).as("r"))
      .head().getAs[Array[Byte]]("r")
    assert(Avi.readMeta(withA).frames == 4) // video stream intact
    val audio = Avi.readAudio(withA)
    assert(audio.exists { case (s, r) => s.length == 8000 && r == 16000 })
    val extracted = Seq(Tuple1(withA)).toDF("v")
      .select(Video.extractAudio(col("v")).as("r")).head().getAs[Array[Byte]]("r")
    val (fmt, samples) = Audio.decodePcm(extracted)
    assert(samples.length == 8000 && fmt.getSampleRate == 16000f)
    // no track → null
    assert(df.select(Video.extractAudio(col("v"))).head().get(0) == null)
    // mix with itself: same length
    val mixed = Seq((withA, wav)).toDF("v", "w")
      .select(Video.mixAudio(col("v"), col("w")).as("r")).head().getAs[Array[Byte]]("r")
    assert(Avi.readAudio(mixed).exists(_._1.length == 8000))
    // segmentation: 4 frames / 3 per segment → 2 clips
    val segs = df.select(Video.segmentVideo(col("v"), lit(3)).as("s"))
      .head().getAs[scala.collection.Seq[Array[Byte]]]("s")
    assert(segs.length == 2 && Avi.readMeta(segs(0)).frames == 3 &&
      Avi.readMeta(segs(1)).frames == 1)
  }

  test("scene_detect flags the color jump") {
    // frames: 3 near-identical darks, then a white jump
    val dark = (0 until 3).map(_ => Video.makeTestVideo(1, 8, 8, 0x101010, 4))
      .flatMap(Avi.readFrames)
    val white = Avi.readFrames(Video.makeTestVideo(1, 8, 8, 0xffffff, 4))
    val vid = Avi.write(dark ++ white, 8, 8, 4)
    val cuts = Seq(Tuple1(vid)).toDF("v")
      .select(Video.sceneDetect(col("v"), lit(60.0)).as("c"))
      .head().getAs[scala.collection.Seq[Int]]("c")
    assert(cuts == Seq(3))
  }

  test("audio family: fades, normalize, resample, concat") {
    val wav = Audio.sineWav(0.1, 440.0, amplitude = 0.25) // peak ~0.25 FS
    val df = Seq(Tuple1(wav)).toDF("w")
    val norm = df.select(Audio.normalize(col("w"), lit(1.0)).as("r"))
      .head().getAs[Array[Byte]]("r")
    val (_, ns) = Audio.decodePcm(norm)
    assert(ns.map(s => math.abs(s.toInt)).max > Short.MaxValue * 0.97)
    val faded = df.select(Audio.fadeIn(col("w"), lit(0.1)).as("r"))
      .head().getAs[Array[Byte]]("r")
    assert(Audio.decodePcm(faded)._2.take(5).forall(s => math.abs(s.toInt) < 100))
    val res = df.select(Audio.resample(col("w"), lit(8000)).as("r"))
      .head().getAs[Array[Byte]]("r")
    val (rf, rs) = Audio.decodePcm(res)
    assert(rf.getSampleRate == 8000f && math.abs(rs.length - 800) <= 1)
    val cat = df.select(Audio.concatAudio(col("w"), col("w")).as("r"))
      .head().getAs[Array[Byte]]("r")
    assert(Audio.decodePcm(cat)._2.length == 3200)
  }

  /** video whose left half is pure red and right half pure blue — spatial
    * structure for viewport/blend filters (JPEG-lossy, so assertions use
    * channel dominance, not exact values).
    */
  private def halfRedBlue(n: Int, w: Int, h: Int, fps: Int): Array[Byte] = {
    val frames = (0 until n).map { _ =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(java.awt.Color.RED); g.fillRect(0, 0, w / 2, h)
      g.setColor(java.awt.Color.BLUE); g.fillRect(w / 2, 0, w - w / 2, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    Avi.write(frames, w, h, fps)
  }

  private def frameImages(v: Array[Byte]) = Avi.readFrames(v).map(Images.decode)
  private def red(p: Int) = (p >> 16) & 0xff
  private def blue(p: Int) = p & 0xff

  test("overlay_image: placement, opacity, and time window") {
    val vid = Video.makeTestVideo(6, 40, 30, 0x000000, 10) // black, 0.6s
    val logo = Images.solidPng(8, 8, 0x00ff00) // green square
    val df = Seq((vid, logo)).toDF("v", "img")
    // top-left, full opacity, visible only in [0.2s, 0.4s) = frames 2..3
    val out = df.select(Video.overlayImage(col("v"), col("img"), lit("left"),
      lit(2), lit("top"), lit(3), lit(Double.NaN), lit(1.0), lit(0.2),
      lit(0.4)).as("r")).head().getAs[Array[Byte]]("r")
    val fs = frameImages(out)
    assert(fs.length == 6)
    def greenAt(img: java.awt.image.BufferedImage) = (img.getRGB(5, 6) >> 8) & 0xff
    assert(greenAt(fs(0)) < 80 && greenAt(fs(1)) < 80) // before window
    assert(greenAt(fs(2)) > 180 && greenAt(fs(3)) > 180) // inside
    assert(greenAt(fs(4)) < 80 && greenAt(fs(5)) < 80) // after
    // half opacity on black ≈ half-intensity green
    val half = df.select(Video.overlayImage(col("v"), col("img"), lit("left"),
      lit(0), lit("top"), lit(0), lit(Double.NaN), lit(0.5), lit(Double.NaN),
      lit(Double.NaN)).as("r")).head().getAs[Array[Byte]]("r")
    val g0 = (frameImages(half).head.getRGB(3, 3) >> 8) & 0xff
    assert(g0 > 90 && g0 < 170, s"expected ~128 green, got $g0")
    // scale=0.5 of video height → 15px square; right/bottom aligned
    val scaled = df.select(Video.overlayImage(col("v"), col("img"), lit("right"),
      lit(0), lit("bottom"), lit(0), lit(0.5), lit(1.0), lit(Double.NaN),
      lit(Double.NaN)).as("r")).head().getAs[Array[Byte]]("r")
    val sf = frameImages(scaled).head
    assert(((sf.getRGB(39 - 7, 29 - 7) >> 8) & 0xff) > 180) // inside overlay
    assert(((sf.getRGB(5, 5) >> 8) & 0xff) < 80) // far corner untouched
  }

  test("transition: fade length arithmetic and wipe geometry") {
    val a = halfRedBlue(6, 32, 16, 10) // only geometry matters for length
    val red6 = Video.makeTestVideo(6, 32, 16, 0xff0000, 10)
    // 0x..f0 base: makeTestVideo adds the frame index to the packed rgb,
    // so the blue channel needs headroom to stay blue on later frames
    val blue6 = Video.makeTestVideo(6, 32, 16, 0x0000f0, 10)
    val df = Seq((red6, blue6)).toDF("a", "b")
    // duration 0.3s at 10 fps → 3-frame overlap → 6 + 6 - 3 = 9 frames
    val faded = df.select(Video.transition(col("a"), col("b"), lit("fade"),
      lit(0.3)).as("r")).head().getAs[Array[Byte]]("r")
    val ff = frameImages(faded)
    assert(ff.length == 9)
    assert(red(ff.head.getRGB(16, 8)) > 180) // pure first clip
    assert(blue(ff.last.getRGB(16, 8)) > 180) // pure second clip
    val mid = ff(4) // middle overlap frame: a genuine mix
    assert(red(mid.getRGB(16, 8)) > 60 && blue(mid.getRGB(16, 8)) > 60)
    // wipeleft: second clip enters from the RIGHT edge
    val wiped = df.select(Video.transition(col("a"), col("b"), lit("wipeleft"),
      lit(0.3)).as("r")).head().getAs[Array[Byte]]("r")
    val wmid = frameImages(wiped)(4)
    assert(red(wmid.getRGB(2, 8)) > 180, "left edge still first clip")
    assert(blue(wmid.getRGB(30, 8)) > 180, "right edge already second clip")
    val err = intercept[Exception] {
      df.select(Video.transition(col("a"), col("b"), lit("nope"), lit(0.3)))
        .head()
    }
    assert(err.getMessage != null)
  }

  test("scroll and pan: viewport geometry and motion") {
    val vid = halfRedBlue(5, 40, 20, 10) // 0.5s
    val df = Seq(Tuple1(vid)).toDF("v")
    // 20x20 viewport scrolling right at 40 px/s: frame0 at x=0 (red),
    // by frame4 x = 0.4s*40 = 16 → mostly blue at viewport center-right
    val out = df.select(Video.scroll(col("v"), lit(20), lit(20), lit(40.0),
      lit(0.0), lit(0), lit(0)).as("r")).head().getAs[Array[Byte]]("r")
    val meta = Avi.readMeta(out)
    assert(meta.width == 20 && meta.height == 20 && meta.frames == 5)
    val fs = frameImages(out)
    assert(red(fs.head.getRGB(10, 10)) > 180) // viewport over the red half
    assert(blue(fs.last.getRGB(15, 10)) > 180) // slid into the blue half
    // pan right: viewport is 80% width, full height; same frame count
    val panned = df.select(Video.pan(col("v"), lit(1), lit(0), lit(0.2))
      .as("r")).head().getAs[Array[Byte]]("r")
    val pm = Avi.readMeta(panned)
    assert(pm.width == 32 && pm.height == 20 && pm.frames == 5)
    val err = intercept[Exception] {
      df.select(Video.pan(col("v"), lit(0), lit(0), lit(0.2))).head()
    }
    assert(err.getMessage != null)
  }

  test("video_splitter: duration/overlap windows, min-duration tail drop, segment_times mode") {
    // 20 frames @10fps = 2.0s; windows of 1.2s every 0.8s → starts 0, 8, 16
    val df = Seq(Video.makeTestVideo(20, 16, 12, 0x112233, 10)).toDF("v")
    val segs = df.select(posexplode(
        Video.videoSplitter(col("v"), lit(1.2), lit(0.4), lit(0.0))))
      .select(col("col.segment_start_pts"), col("col.segment_end_pts"),
        col("col.video_segment"))
      .collect()
    assert(segs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 12L), (8L, 20L), (16L, 20L)))
    // each segment is a playable AVI with the right frame count
    segs.foreach { r =>
      val m = Avi.readMeta(r.getAs[Array[Byte]](2))
      assert(m.frames == (r.getLong(1) - r.getLong(0)).toInt && m.fps == 10.0)
    }
    // min_segment_duration drops ONLY the short tail (0.4s < 0.5s)
    val dropped = df.select(posexplode(
        Video.videoSplitter(col("v"), lit(1.2), lit(0.4), lit(0.5))))
      .select(col("col.segment_start_pts")).as[Long].collect().toSeq
    assert(dropped == Seq(0L, 8L))

    // segment_times mode: [0.5, 1.1] → 3 segments; [] → whole video; times
    // beyond the end are ignored
    val at = df.select(posexplode(
        Video.videoSplitterAt(col("v"), array(lit(0.5), lit(1.1)))))
      .select(col("col.segment_start_pts"), col("col.segment_end_pts"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(at == Seq((0L, 5L), (5L, 11L), (11L, 20L)))
    val whole = df.select(posexplode(
        Video.videoSplitterAt(col("v"), array())))
      .select(col("col.segment_end_pts")).as[Long].collect().toSeq
    assert(whole == Seq(20L))
    val clipped = df.select(posexplode(
        Video.videoSplitterAt(col("v"), array(lit(0.5), lit(9.9)))))
      .select(col("col.segment_start_pts")).as[Long].collect().toSeq
    assert(clipped == Seq(0L, 5L))
  }

  test("zoom: static zoom crops the center and keeps resolution") {
    val vid = halfRedBlue(4, 40, 20, 8)
    val df = Seq(Tuple1(vid)).toDF("v")
    // static 2x centered on the left-quarter (cx=0.25): crop is 20x10 at
    // x0 = 0.25*40 - 10 = 0 → entirely red, scaled back to 40x20
    val out = df.select(Video.zoom(col("v"), lit(2.0), lit(2.0), lit(0.25),
      lit(0.5)).as("r")).head().getAs[Array[Byte]]("r")
    val meta = Avi.readMeta(out)
    assert(meta.width == 40 && meta.height == 20 && meta.frames == 4)
    val f0 = frameImages(out).head
    assert(red(f0.getRGB(35, 10)) > 180, "zoomed into the red half everywhere")
    // animated zoom 1x -> 2x center: first frame unchanged layout
    val anim = df.select(Video.zoom(col("v"), lit(1.0), lit(2.0), lit(0.5),
      lit(0.5)).as("r")).head().getAs[Array[Byte]]("r")
    val af = frameImages(anim)
    assert(red(af.head.getRGB(5, 10)) > 180 && blue(af.head.getRGB(35, 10)) > 180)
    // last frame: 2x center crop spans x in [10,30) — still red-left/blue-right
    assert(red(af.last.getRGB(5, 10)) > 180 && blue(af.last.getRGB(35, 10)) > 180)
    val err = intercept[Exception] {
      df.select(Video.zoom(col("v"), lit(0.5), lit(1.0), lit(0.5), lit(0.5))).head()
    }
    assert(err.getMessage != null)
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
