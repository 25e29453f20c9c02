package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MP4 payloads riding the EXISTING video surface unchanged (the
  * decode-any dispatch): metadata, frame iteration, scene detection,
  * clip, audio extraction, and the AVI↔MP4 re-mux twins.
  */
class Mp4PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def remux(avi: Array[Byte]): Array[Byte] = {
    val meta = Avi.readMeta(avi)
    Mp4.write(Avi.readFrames(avi), meta.width, meta.height,
      math.max(meta.fps.round.toInt, 1), Avi.readAudio(avi))
  }

  test("getMetadata / frameCount / duration dispatch on the MP4 magic") {
    val avi = Video.makeTestVideo(6, 20, 12, 0x446688, 5)
    val mp4 = remux(avi)
    val df = Seq(Tuple1(mp4)).toDF("v").select(
      Video.getMetadata(col("v")).as("m"),
      Video.frameCount(col("v")).as("n"),
      Video.duration(col("v")).as("d"))
    val r = df.head()
    val m = r.getStruct(0)
    assert(m.getAs[Int]("width") == 20 && m.getAs[Int]("height") == 12)
    assert(m.getAs[Double]("fps") == 5.0 && m.getAs[Int]("frames") == 6)
    assert(m.getAs[String]("format") == "MP4" && m.getAs[String]("codec") == "JPEG")
    assert(r.getAs[Int]("n") == 6 && r.getAs[Double]("d") == 1.2)
  }

  test("frameIterator and extractFrame yield the same JPEGs from either container") {
    val avi = Video.makeBlockVideo(Seq(2, 2), Seq(0xff0000, 0x00ff00), 16, 12, 10)
    val mp4 = remux(avi)
    val fromAvi = Avi.readFrames(avi)
    val rows = Seq(Tuple1(mp4)).toDF("v")
      .select(posexplode(Video.frameIterator(col("v"), lit(1))))
      .select("col._1", "col._2", "col._3").collect()
    assert(rows.length == 4)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i)
      assert(math.abs(r.getDouble(1) - i / 10.0) < 1e-12)
      assert(r.getAs[Array[Byte]](2).sameElements(fromAvi(i)))
    }
  }

  test("scene detection sees identical cuts through the MP4 path") {
    val avi = Video.makeBlockVideo(Seq(3, 2, 3),
      Seq(0xff0000, 0x00ffff, 0xffffff), 16, 12, 10)
    val mp4 = remux(avi)
    def cuts(v: Array[Byte]) = Seq(Tuple1(v)).toDF("v")
      .select(SceneDetect.sceneDetectContentUdf(col("v"), lit(15.0), lit(2),
        lit(false)).as("s")).head().getSeq[Any](0).length
    assert(cuts(mp4) == cuts(avi))
  }

  test("clip on MP4 input emits a playable AVI with the right range") {
    val avi = Video.makeTestVideo(10, 16, 16, 0x123456, 4)
    val mp4 = remux(avi)
    val out = Seq(Tuple1(mp4)).toDF("v")
      .select(Video.clip(col("v"), lit(2), lit(7)).as("c"))
      .head().getAs[Array[Byte]]("c")
    val m = Avi.readMeta(out)
    assert(m.frames == 5 && m.width == 16)
    assert(Avi.readFrames(out).head.sameElements(Avi.readFrames(avi)(2)))
  }

  test("extractAudio pulls the PCM track out of an MP4 as WAV") {
    val samples = Array.tabulate(3200)(i =>
      (math.sin(i * 2 * math.Pi * 440 / 16000) * 8000).toInt.toShort)
    val avi = Video.makeTestVideo(4, 8, 8, 0xffffff, 4)
    val mp4 = Mp4.write(Avi.readFrames(avi), 8, 8, 4, Some((samples, 16000)))
    val wav = Seq(Tuple1(mp4)).toDF("v")
      .select(Video.extractAudio(col("v")).as("w"))
      .head().getAs[Array[Byte]]("w")
    val (fmt, back) = Audio.decodePcm(wav)
    assert(fmt.getSampleRate == 16000f)
    assert(back.toSeq == samples.toSeq)
  }

  test("toMp4/toAvi re-mux twins preserve frames and audio bit-exactly") {
    val samples = Array.tabulate(800)(i => (i * 3 % 5000).toShort)
    val frames = Avi.readFrames(Video.makeTestVideo(3, 12, 10, 0x0000ff, 6))
    val avi = Avi.write(frames, 12, 10, 6, Some((samples, 8000)))
    val r = Seq(Tuple1(avi)).toDF("v")
      .select(Video.toMp4(col("v")).as("m"))
      .select(col("m"), Video.toAvi(col("m")).as("back"))
      .head()
    val mp4 = r.getAs[Array[Byte]]("m")
    assert(Mp4.isMp4(mp4))
    assert(Mp4.readFrames(mp4).zip(frames).forall(p => p._1.sameElements(p._2)))
    val back = r.getAs[Array[Byte]]("back")
    assert(Avi.readMeta(back).frames == 3)
    assert(Avi.readAudio(back).get._1.toSeq == samples.toSeq)
  }

  test("extractAudioStream surfaces the compressed-track hand-off, null elsewhere") {
    val es = Mp3.writeTestStream(Seq(100, 120))
    val perFrame = Mp3.frames(es).map(f =>
      java.util.Arrays.copyOfRange(es, f.offset, f.offset + f.length))
    val mp4 = Mp4.write(Seq.empty, 0, 0, 0, mp3 = Some((perFrame, 44100, 1152)))
    val avi = Video.makeTestVideo(2, 8, 8, 0, 4)
    val rows = Seq(("mp3mp4", mp4), ("plainavi", avi)).toDF("k", "v")
      .select(col("k"), Video.extractAudioStream(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(rows("plainavi") == null)
    val s = rows("mp3mp4").asInstanceOf[org.apache.spark.sql.Row]
    assert(s.getString(0) == "mp3")
    assert(Mp3.frameGains(s.getAs[Array[Byte]](1)).map(_._3) == Seq(100.0, 120.0))
  }
}
