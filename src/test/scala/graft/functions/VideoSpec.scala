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
