package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Diarized transcription: two spectrally distinct synthetic speakers
  * alternating with silences must receive two consistent speaker labels
  * in first-appearance order; plus determinism and null safety.
  */
class DiarizeSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val whisperDir = LocalModels.ensureTinyWhisperModel(seed = 42L)

  private def tone(freq: Double, secs: Double, rate: Int = 16000): Array[Short] =
    Array.tabulate((rate * secs).toInt)(i =>
      (math.sin(2 * math.Pi * freq * i / rate) * 0.5 * 32767).toShort)

  private def silence(secs: Double, rate: Int = 16000): Array[Short] =
    new Array[Short]((rate * secs).toInt)

  test("alternating tones cluster into two consistent speakers, labels in appearance order") {
    // A(300 Hz) B(3000 Hz) A B — the mel statistics separate low and high
    // pitch cleanly, so diarization must label them 0 1 0 1
    val pcm = tone(300, 0.2) ++ silence(0.2) ++ tone(3000, 0.2) ++ silence(0.2) ++
      tone(300, 0.2) ++ silence(0.2) ++ tone(3000, 0.2)
    val wav = graft.functions.Audio.encodeWav(pcm, 16000f)
    val df = Seq((1L, wav)).toDF("id", "wav")
    val out = LocalModels.speechToTextDiarized(df, "wav", "diar", whisperDir,
      numSpeakers = 2)
      .selectExpr("inline(diar)").collect()
    assert(out.length == 4, s"expected 4 segments, got ${out.length}")
    val speakers = out.map(_.getInt(3)).toSeq
    assert(speakers == Seq(0, 1, 0, 1), s"speakers $speakers")
    // spans ordered and disjoint
    val spans = out.map(r => (r.getDouble(1), r.getDouble(2)))
    spans.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1 + 1e-9)
      case _ =>
    }
    // every segment transcribed (deterministic text from the tiny model)
    assert(out.forall(_.getString(4) != null))
  }

  test("single speaker: all segments share label 0; k caps at segment count") {
    val pcm = tone(500, 0.2) ++ silence(0.2) ++ tone(500, 0.2)
    val wav = graft.functions.Audio.encodeWav(pcm, 16000f)
    val df = Seq((1L, wav)).toDF("id", "wav")
    // numSpeakers=4 > segments=2: k caps, labels still well-formed
    val out = LocalModels.speechToTextDiarized(df, "wav", "diar", whisperDir,
      numSpeakers = 4)
      .selectExpr("inline(diar)").collect()
    assert(out.length == 2)
    assert(out.map(_.getInt(3)).forall(s => s >= 0 && s < 2))
    assert(out(0).getInt(3) == 0) // first appearance is always speaker 0
  }

  test("deterministic across partitionings, null safe") {
    val mk = (seed: Int) => {
      val pcm = tone(200 + seed * 100, 0.2) ++ silence(0.2) ++ tone(2500, 0.2)
      graft.functions.Audio.encodeWav(pcm, 16000f)
    }
    val rows = (1 to 3).map(i => (i.toLong, mk(i))) :+
      ((9L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("id", "wav")
    def run(parts: Int) =
      LocalModels.speechToTextDiarized(df.repartition(parts), "wav", "diar",
        whisperDir, numSpeakers = 2)
        .selectExpr("id", "cast(diar as string) s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null && a(1L) != null)
  }
}
