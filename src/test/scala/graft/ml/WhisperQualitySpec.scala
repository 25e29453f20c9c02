package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Pins for whisper.py transcribe's decode-quality surface (reference
  * functions/whisper.py:21 → openai-whisper transcribe.py/decoding.py):
  * compression-ratio hallucination detection, the fallback and
  * silence-skip decision rules incl. disabled (None) thresholds, the
  * temperature-ladder acceptance, transcribeScored's avg_logprob parity
  * between the KV-cached and full-recompute decode paths, and the Spark
  * surface.
  */
class WhisperQualitySpec extends AnyFunSuite {

  test("compressionRatio: repetitive text flags, varied text doesn't") {
    assert(WhisperQuality.compressionRatio("x" * 400) > 2.4)
    assert(WhisperQuality.compressionRatio("ab" * 300) > 2.4)
    assert(WhisperQuality.compressionRatio(
      "the quick brown fox jumps over the lazy dog 0123456789") < 2.4)
    assert(WhisperQuality.compressionRatio("") == 0.0)
  }

  test("needsFallback truth table incl. disabled thresholds and no-speech override") {
    // clean decode
    assert(!WhisperQuality.needsFallback(-0.3, 1.1, 0.1))
    // too compressible / too improbable
    assert(WhisperQuality.needsFallback(-0.3, 3.0, 0.1))
    assert(WhisperQuality.needsFallback(-1.5, 1.1, 0.1))
    // confident no-speech overrides both triggers
    assert(!WhisperQuality.needsFallback(-1.5, 3.0, 0.8))
    // NaN disables a clause (the reference's None)
    assert(!WhisperQuality.needsFallback(-0.3, 3.0, 0.1,
      compressionRatioThreshold = Double.NaN))
    assert(!WhisperQuality.needsFallback(-1.5, 1.1, 0.1,
      logprobThreshold = Double.NaN))
    // disabling the no-speech gate re-enables fallback on silence-y input
    assert(WhisperQuality.needsFallback(-1.5, 3.0, 0.8,
      noSpeechThreshold = Double.NaN))
  }

  test("shouldSkipSilence requires BOTH confident no-speech and low logprob") {
    assert(WhisperQuality.shouldSkipSilence(-1.5, 0.8))
    assert(!WhisperQuality.shouldSkipSilence(-0.3, 0.8)) // logprob fine
    assert(!WhisperQuality.shouldSkipSilence(-1.5, 0.1)) // speech likely
    assert(!WhisperQuality.shouldSkipSilence(-1.5, 0.8,
      noSpeechThreshold = Double.NaN))
  }

  test("acceptedRung: first passing rung; last rung unconditional") {
    assert(WhisperQuality.acceptedRung(Seq((-0.3, 1.1, 0.1))) == 0)
    assert(WhisperQuality.acceptedRung(
      Seq((-0.3, 3.0, 0.1), (-0.5, 1.5, 0.1))) == 1)
    // every rung bad → the last is still accepted
    assert(WhisperQuality.acceptedRung(
      Seq((-2.0, 3.0, 0.1), (-2.0, 3.0, 0.1), (-2.0, 3.0, 0.1))) == 2)
  }

  test("transcribeScored: cached-path avg_logprob matches a full-recompute check") {
    val dir = LocalModels.ensureTinyWhisperModel(seed = 42L)
    val bundle = LocalModels.loadWhisper(dir)
    val melCfg = bundle.melConfig
    val wave = Array.tabulate(melCfg.sampleRate / 5)(i =>
      (math.sin(2 * math.Pi * 330.0 * i / melCfg.sampleRate) * 0.4).toFloat)
    val fixed = java.util.Arrays.copyOf(wave,
      bundle.cfg.maxSourcePositions * 2 * melCfg.hop)
    val mel = Mel.logMelSpectrogram(fixed, melCfg)
    val sc = bundle.model.transcribeScored(mel, maxNewTokens = 6)
    assert(sc.tokens.head == bundle.cfg.decoderStartTokenId)
    assert(sc.avgLogprob <= 0.0 && sc.noSpeechProb >= 0.0 && sc.noSpeechProb <= 1.0)
    // same tokens as the plain greedy decode
    assert(sc.tokens == bundle.model.transcribe(mel, maxNewTokens = 6))
    // recompute avg_logprob through the UNCACHED decodeStep path
    val (enc, encLen) = bundle.model.encode(mel)
    def lp(logits: Array[Float], tok: Int): Double = {
      val mx = logits.max.toDouble
      val lse = mx + math.log(logits.map(v => math.exp(v - mx)).sum)
      logits(tok) - lse
    }
    val selected = sc.tokens.drop(1) :+ bundle.cfg.eosTokenId
    var prefix = Vector(sc.tokens.head)
    var sum = 0.0
    var n = 0
    selected.foreach { tok =>
      // stop contributing past maxNewTokens (EOS may be implicit there)
      if (n < 6) {
        sum += lp(bundle.model.decodeStep(prefix, enc, encLen), tok)
        n += 1
        prefix :+= tok
      }
    }
    assert(math.abs(sc.avgLogprob - sum / n) < 1e-4,
      s"${sc.avgLogprob} vs ${sum / n}")
  }

  test("speechToTextQuality surface: partition invariant, null safe, sane fields") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import graft.functions.Audio
    val dir = LocalModels.ensureTinyWhisperModel(seed = 42L)
    val df = ((1 to 3).map(i => (i.toLong, Audio.sineWav(0.2, 200.0 + 60 * i))) :+
      (9L, null.asInstanceOf[Array[Byte]])).toDF("id", "wav")
    def run(parts: Int) =
      LocalModels.speechToTextQuality(df.repartition(parts), "wav", "q", dir,
        maxNewTokens = 5)
        .selectExpr("id", "q.text", "round(q.avg_logprob, 6)",
          "round(q.compression_ratio, 6)", "q.needs_fallback", "q.is_silence")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L).forall(_ == null))
    a.filterNot(_._1 == 9L).values.foreach { v =>
      assert(v(0) != null && v(1).asInstanceOf[Double] <= 0.0)
    }
  }
}
