package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Wav2Vec2 CTC (the wav2vec2 branch of the reference's
  * automatic_speech_recognition, huggingface.py:1932): independent naive
  * reimplementation cross-check of the full forward — conv feature
  * extractor with layer-0 GroupNorm, feature projection, weight-normed
  * grouped positional conv with the even-kernel SamePad trim, post-LN
  * encoder, lm_head — plus CTC decode semantics and the dispatching
  * Spark surface.
  */
class Wav2Vec2Spec extends AnyFunSuite {

  private lazy val dir: String = LocalModels.ensureTinyWav2Vec2Model(seed = 42L)

  private def naiveLogits(bundle: LocalModels.Wav2Vec2Bundle,
      wave: Array[Float]): Seq[Array[Double]] = {
    val W = bundle.weights
    val cfg = bundle.cfg
    def gelu(x: Double): Double = x * 0.5 * (1.0 + Tensors.erf(x / math.sqrt(2.0)))
    // feature extractor: channels-last frames, conv as explicit sums
    var frames: Seq[Array[Double]] = wave.map(v => Array(v.toDouble)).toSeq
    cfg.convDims.indices.foreach { li =>
      val w = W(s"wav2vec2.feature_extractor.conv_layers.$li.conv.weight")
      val k = cfg.convKernels(li); val s = cfg.convStrides(li)
      val cin = if (li == 0) 1 else cfg.convDims(li - 1)
      val tOut = (frames.length - k) / s + 1
      var out = (0 until tOut).map { ti =>
        Array.tabulate(cfg.convDims(li)) { o =>
          (for (ci <- 0 until cin; kk <- 0 until k)
            yield w.data((o * cin + ci) * k + kk).toDouble *
              frames(ti * s + kk)(ci)).sum
        }
      }
      if (li == 0) {
        // GroupNorm groups == channels: per-channel instance norm over time
        val g = W("wav2vec2.feature_extractor.conv_layers.0.layer_norm.weight")
        val b = W("wav2vec2.feature_extractor.conv_layers.0.layer_norm.bias")
        val c = cfg.convDims(0)
        out = {
          val byC = (0 until c).map { ci =>
            val xs = out.map(_(ci))
            val mean = xs.sum / xs.length
            val v = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
            (mean, math.sqrt(v + cfg.layerNormEps))
          }
          out.map(row => Array.tabulate(c)(ci =>
            (row(ci) - byC(ci)._1) / byC(ci)._2 * g.data(ci) + b.data(ci)))
        }
      }
      frames = out.map(_.map(gelu))
    }
    def ln(x: Array[Double], stem: String): Array[Double] = {
      val g = W(stem + ".weight"); val b = W(stem + ".bias")
      val mean = x.sum / x.length
      val v = x.map(d => (d - mean) * (d - mean)).sum / x.length
      x.indices.map(i => (x(i) - mean) / math.sqrt(v + cfg.layerNormEps) * g.data(i) + b.data(i)).toArray
    }
    def mv(stem: String, x: Array[Double]): Array[Double] = {
      val wt = W(stem + ".weight"); val b = W(stem + ".bias")
      (0 until wt.rows).map(o =>
        (0 until wt.cols).map(i => wt(o, i).toDouble * x(i)).sum + b.data(o)).toArray
    }
    var hid = frames.map(f => mv("wav2vec2.feature_projection.projection",
      ln(f, "wav2vec2.feature_projection.layer_norm")))
    // weight-normed grouped positional conv, pad k/2, even-kernel trim
    val gN = W("wav2vec2.encoder.pos_conv_embed.conv.weight_g")
    val vN = W("wav2vec2.encoder.pos_conv_embed.conv.weight_v")
    val bP = W("wav2vec2.encoder.pos_conv_embed.conv.bias")
    val k = vN.shape(2); val cinG = vN.shape(1); val h = cfg.hidden
    val groups = cfg.posConvGroups; val coutG = h / groups
    val norms = (0 until k).map { kk =>
      math.sqrt((for (i <- 0 until h * cinG)
        yield math.pow(vN.data(i * k + kk).toDouble, 2)).sum)
    }
    val t = hid.length
    val pos = (0 until t).map { ti =>
      Array.tabulate(h) { o =>
        val g = o / coutG
        var acc = 0.0
        for (ci <- 0 until cinG; kk <- 0 until k) {
          val src = ti + kk - k / 2
          if (src >= 0 && src < t)
            acc += gN.data(kk) * vN.data((o * cinG + ci) * k + kk) / norms(kk) *
              hid(src)(g * cinG + ci)
        }
        gelu(acc + bP.data(o))
      }
    }
    hid = hid.zip(pos).map { case (a, b) =>
      ln(a.zip(b).map { case (x, y) => x + y }, "wav2vec2.encoder.layer_norm")
    }
    for (li <- 0 until cfg.layers) {
      val p = s"wav2vec2.encoder.layers.$li"
      val dh = h / cfg.heads
      val q = hid.map(mv(s"$p.attention.q_proj", _))
      val kk2 = hid.map(mv(s"$p.attention.k_proj", _))
      val v2 = hid.map(mv(s"$p.attention.v_proj", _))
      val att = hid.indices.map { i =>
        val out = new Array[Double](h)
        for (hd <- 0 until cfg.heads) {
          val off = hd * dh
          val scores = hid.indices.map(j =>
            (0 until dh).map(d => q(i)(off + d) * kk2(j)(off + d)).sum / math.sqrt(dh.toDouble))
          val mx = scores.max
          val exps = scores.map(s => math.exp(s - mx))
          val z = exps.sum
          for (j <- hid.indices; d <- 0 until dh)
            out(off + d) += exps(j) / z * v2(j)(off + d)
        }
        out
      }.map(mv(s"$p.attention.out_proj", _))
      hid = hid.zip(att).map { case (x, a) =>
        ln(x.zip(a).map { case (u, w2) => u + w2 }, s"$p.layer_norm")
      }
      val ff = hid.map(x => mv(s"$p.feed_forward.output_dense",
        mv(s"$p.feed_forward.intermediate_dense", x).map(gelu)))
      hid = hid.zip(ff).map { case (x, f) =>
        ln(x.zip(f).map { case (u, w2) => u + w2 }, s"$p.final_layer_norm")
      }
    }
    hid.map(mv("lm_head", _))
  }

  test("logits match the independent naive implementation") {
    val bundle = LocalModels.loadWav2Vec2(dir)
    val wave = Array.tabulate(64)(i =>
      (math.sin(i * 0.7) * 0.5 + math.cos(i * 0.3) * 0.2).toFloat)
    val (fast, t) = bundle.model.logits(wave)
    val slow = naiveLogits(bundle, wave)
    assert(t == slow.length && t == 15) // (64-4)/2+1=31 → (31-3)/2+1=15
    for (ti <- 0 until t; vi <- 0 until bundle.cfg.vocabSize) {
      val f = fast(ti * bundle.cfg.vocabSize + vi)
      val s = slow(ti)(vi)
      assert(math.abs(f - s) < 1e-3, s"t=$ti v=$vi: $f vs $s")
    }
    // argmax parity per frame
    (0 until t).foreach { ti =>
      val row = (0 until bundle.cfg.vocabSize)
        .map(vi => fast(ti * bundle.cfg.vocabSize + vi))
      assert(row.indices.maxBy(row) == slow(ti).indices.maxBy(i => slow(ti)(i)))
    }
  }

  test("CTC decode: collapse, blank-separated repeats, word delimiter") {
    assert(Ctc.decode(Seq(2, 2, 0, 2, 3, 3), blank = 0) == Seq(2, 2, 3))
    assert(Ctc.decode(Seq(2, 2, 2, 3, 3, 0), blank = 0) == Seq(2, 3))
    assert(Ctc.decode(Seq(0, 0, 0), blank = 0) == Seq.empty)
    assert(Ctc.decode(Seq.empty, blank = 0) == Seq.empty)
    val vocab = LocalModels.loadWav2Vec2(dir).idToToken
    assert(Ctc.toText(Seq(4, 1, 4, 1, 2), vocab) == "c c a")
    assert(Ctc.toText(Seq(1, 2, 1), vocab) == "a") // delimiters trim
  }

  test("ASR surface dispatches by checkpoint type; partition invariant, null safe") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import graft.functions.Audio
    val df = ((1 to 4).map(i =>
      (i.toLong, Audio.sineWav(0.02, 200.0 + 40 * i))) :+
      (9L, null.asInstanceOf[Array[Byte]])).toDF("id", "wav")
    def run(parts: Int): Map[Long, String] =
      LocalModels.automaticSpeechRecognition(df.repartition(parts), "wav",
        "text", dir).select("id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null)
    assert(a.filterNot(_._1 == 9L).values.forall(_ != null))
    // the whisper route answers through the same entry point
    val wdir = LocalModels.ensureTinyWhisperModel(seed = 42L)
    val viaAsr = LocalModels.automaticSpeechRecognition(
      df.filter($"id" === 1), "wav", "text", wdir, maxNewTokens = 4)
      .select("text").head().getString(0)
    val direct = LocalModels.speechToText(
      df.filter($"id" === 1), "wav", "text", wdir, maxNewTokens = 4)
      .select("text").head().getString(0)
    assert(viaAsr == direct)
  }
}
