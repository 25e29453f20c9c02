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

  test("audioSegments: duration/overlap/max_size budgets, silence snap, leading trim") {
    // 1.0s tone ∥ 0.3s silence ∥ 1.0s tone ∥ 0.3s silence ∥ 0.4s tone = 3.0s @16k
    val (_, t1) = Audio.decodePcm(Audio.sineWav(1.0, 440.0))
    val (_, sil) = Audio.decodePcm(Audio.sineWav(0.3, 440.0, amplitude = 0.0))
    val (_, t2) = Audio.decodePcm(Audio.sineWav(0.4, 440.0))
    val df = Seq(Tuple1(Audio.encodeWav(t1 ++ sil ++ t1 ++ sil ++ t2))).toDF("wav")
    def segs(dur: Double, over: Double, maxB: Long, minSil: Double,
        trim: Boolean): Seq[(Double, Double)] =
      df.select(posexplode(Audio.audioSegments(col("wav"), lit(dur), lit(over),
          lit(maxB), lit(0.01), lit(minSil), lit(trim))))
        .select(col("col.segment_start"), col("col.segment_end")).collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9

    // plain duration: exact 1.2 s boundaries, tail keeps the remainder
    val d = segs(1.2, 0, 0, 0, trim = false)
    assert(d.map(_._1).zip(Seq(0.0, 1.2, 2.4)).forall((close _).tupled), s"d=$d")
    assert(close(d.last._2, 3.0))

    // max_size budgets the emitted FILE (header included, like the
    // reference's overhead_reserve): header + 2 B/sample lands the cuts on
    // the same 1.2 s boundaries, and no emitted file exceeds the budget
    val maxB = Audio.WavHeaderBytes + (2 * 16000 * 1.2).toLong
    val m = segs(0, 0, maxB, 0, trim = false)
    assert(m.map(_._1).zip(Seq(0.0, 1.2, 2.4)).forall((close _).tupled), s"m=$m")
    val mBytes = df.select(posexplode(Audio.audioSegments(col("wav"), lit(0.0),
        lit(0.0), lit(maxB), lit(0.01), lit(0.0), lit(false))))
      .select(col("col.audio_segment")).collect()
      .map(_.getAs[Array[Byte]](0).length)
    assert(mBytes.forall(_ <= maxB), s"file sizes ${mBytes.toSeq} exceed $maxB")

    // overlap: each next segment starts duration − overlap after the last
    val o = segs(1.2, 0.2, 0, 0, trim = false)
    assert(close(o(0)._2, 1.2) && close(o(1)._1, 1.0), s"o=$o")

    // silence snap: the 1.5 s budget pulls each cut back to a silence end —
    // segments never end mid-tone
    val s = segs(1.5, 0, 0, 0.1, trim = false)
    assert(s.map(_._1).zip(Seq(0.0, 1.3, 2.6)).forall((close _).tupled), s"s=$s")
    assert(close(s(0)._2, 1.3) && close(s(1)._2, 2.6) && close(s(2)._2, 3.0))

    // leading trim: a budget cut mid-silence starts the next segment where
    // the tone resumes (1.1 → trimmed to 1.3; 2.4 → trimmed to 2.6)
    val tr = segs(1.1, 0, 0, 0, trim = true)
    assert(tr.map(_._1).zip(Seq(0.0, 1.3, 2.6)).forall((close _).tupled), s"tr=$tr")
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
