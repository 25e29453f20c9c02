package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Word-level timestamps: the DTW aligner on hand-built attention
  * matrices (monotonicity, coverage, skip moves), cross-attention capture
  * parity with the plain decode, and the Spark word-span surface.
  */
class WhisperAlignSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val whisperDir = LocalModels.ensureTinyWhisperModel(seed = 42L)

  test("dtw: clean diagonal attention aligns each token to its own frames") {
    // 3 tokens × 6 frames, each token attends to its own 2-frame block
    val attn = IndexedSeq(
      Array(0.9f, 0.9f, 0.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 0.9f, 0.9f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 0.0f, 0.0f, 0.9f, 0.9f))
    val spans = WhisperAlign.dtw(attn)
    assert(spans.map(s => (s.startFrame, s.endFrame)) == Seq((0, 2), (2, 4), (4, 6)))
  }

  test("dtw: spans are monotonic, non-overlapping, and cover the frame axis") {
    val rnd = new java.util.Random(7)
    val attn = IndexedSeq.fill(5)(Array.fill(16)(rnd.nextFloat()))
    val spans = WhisperAlign.dtw(attn)
    assert(spans.length == 5)
    // monotone non-overlapping coverage: consecutive spans chain exactly
    assert(spans.head.startFrame == 0)
    assert(spans.last.endFrame == 16)
    spans.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.endFrame >= a.startFrame + 1)
        // a frame may be shared at the boundary (diagonal move), never skipped
        assert(b.startFrame <= a.endFrame && b.startFrame >= a.endFrame - 1)
      case _ =>
    }
  }

  test("dtw: a token with zero attention still gets a minimal span") {
    val attn = IndexedSeq(
      Array(0.9f, 0.9f, 0.9f, 0.0f),
      Array(0.0f, 0.0f, 0.0f, 0.0f), // silent token
      Array(0.0f, 0.0f, 0.0f, 0.9f))
    val spans = WhisperAlign.dtw(attn)
    assert(spans.forall(s => s.endFrame > s.startFrame))
    assert(spans(1).startFrame >= spans(0).endFrame - 1)
  }

  test("transcribeAligned: same tokens as transcribe, one attention row per fed token") {
    val bundle = LocalModels.loadWhisper(whisperDir)
    val melCfg = bundle.melConfig
    val n = bundle.cfg.maxSourcePositions * 2 * melCfg.hop
    val wav = Array.tabulate(n)(i => (math.sin(2 * math.Pi * 440 * i / 16000.0) * 0.4).toFloat)
    val mel = Mel.logMelSpectrogram(wav, melCfg)
    val plain = bundle.model.transcribe(mel, maxNewTokens = 6)
    val (aligned, attn) = bundle.model.transcribeAligned(mel, maxNewTokens = 6)
    assert(aligned == plain)
    assert(attn.length == aligned.length)
    // each row is a normalized attention distribution (sums to ~1)
    attn.foreach { row =>
      assert(math.abs(row.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("speechToTextWords surface: ordered spans inside the audio window, partition invariant") {
    val rows = (1 to 3).map { i =>
      val freq = 220.0 + i * 110
      val pcm = Array.tabulate(6400)(j =>
        (math.sin(2 * math.Pi * freq * j / 16000.0) * 0.4 * 32767).toShort)
      (i.toLong, graft.functions.Audio.encodeWav(pcm, 16000f))
    } :+ ((9L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("id", "wav")
    def run(parts: Int) =
      LocalModels.speechToTextWords(df.repartition(parts), "wav", "words", whisperDir,
        maxNewTokens = 6)
        .selectExpr("id", "cast(words as string) s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null)
    // structural checks on one row
    val words = LocalModels.speechToTextWords(df.filter("id = 1"), "wav", "words",
      whisperDir, maxNewTokens = 6)
      .selectExpr("inline(words)").collect()
    words.foreach { w =>
      val start = w.getDouble(1); val end = w.getDouble(2)
      assert(start >= 0 && end > start)
      // padded window: maxSourcePositions·2 mel hops = 0.64 s at tiny cfg
      assert(end <= 0.65)
      assert(w.getString(0).nonEmpty)
    }
    // spans ordered across words
    words.map(_.getDouble(1)).sliding(2).foreach {
      case Array(x, y) => assert(x <= y)
      case _ =>
    }
  }
}
