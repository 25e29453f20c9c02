package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AudioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wav metadata, clip, rms, volume through real javax.sound codec") {
    val df = Seq(Tuple1(Audio.sineWav(2.0, 440.0))).toDF("wav")
    val row = df.select(
      Audio.getMetadata(col("wav")).as("meta"),
      Audio.getMetadata(Audio.clip(col("wav"), lit(0.5), lit(1.0))).as("clipped"),
      Audio.rms(col("wav")).as("level"),
      Audio.rms(Audio.multiplyVolume(col("wav"), lit(0.5))).as("half_level"),
    ).head()
    val meta = row.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getInt(0) == 16000 && meta.getInt(1) == 1)
    assert(math.abs(meta.getDouble(3) - 2.0) < 0.01)                // duration
    val clipped = row.getAs[org.apache.spark.sql.Row]("clipped")
    assert(math.abs(clipped.getDouble(3) - 0.5) < 0.01)
    // sine at amplitude 0.5 → RMS ≈ 0.5/√2 ≈ 0.354
    assert(math.abs(row.getAs[Double]("level") - 0.3535) < 0.01)
    assert(math.abs(row.getAs[Double]("half_level") - 0.177) < 0.01)
  }

  test("audioSplitter splits on silence gaps") {
    // 0.5s tone ∥ 0.3s silence ∥ 0.5s tone
    val tone = Audio.sineWav(0.5, 440.0)
    val silence = Audio.sineWav(0.3, 440.0, amplitude = 0.0)
    val (_, t) = Audio.decodePcm(tone)
    val (_, s) = Audio.decodePcm(silence)
    val wav = Audio.encodeWav(t ++ s ++ t)
    val df = Seq(Tuple1(wav)).toDF("wav")
    val segs = df
      .select(explode(Audio.audioSplitter(col("wav"), lit(0.01), lit(0.1))).as("seg"))
      .select(col("seg._1").as("idx"), col("seg._2").as("start"), col("seg._3").as("end"))
      .orderBy("idx").collect()
    assert(segs.length == 2)
    assert(math.abs(segs(0).getAs[Double]("start") - 0.0) < 0.05)
    assert(math.abs(segs(0).getAs[Double]("end") - 0.5) < 0.05)
    assert(math.abs(segs(1).getAs[Double]("start") - 0.8) < 0.05)
  }
}
