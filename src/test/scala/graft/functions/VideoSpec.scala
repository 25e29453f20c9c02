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
