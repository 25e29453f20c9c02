package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Marian/opus-mt translation (reference huggingface.py:1566): independent
  * naive reimplementation cross-check of the Marian variant of the post-LN
  * seq2seq forward — √d_model embedding scale, sinusoidal positions at
  * offset 0 (computed where the checkpoint omits the buffer), NO
  * layernorm_embedding, swish FFN — plus forced-BOS target-language
  * selection and the Spark surface.
  */
class MarianSpec extends AnyFunSuite {

  private lazy val dir: String = LocalModels.ensureTinyMarianModel(seed = 42L)

  /** Fairseq/HF sinusoidal table: first half sin, second half cos. */
  private def naivePos(p: Int, d: Int): Array[Double] = {
    val half = d / 2
    val out = new Array[Double](d)
    for (i <- 0 until half) {
      val angle = p / math.pow(10000.0, 2.0 * i / d)
      out(i) = math.sin(angle)
      out(half + i) = math.cos(angle)
    }
    out
  }

  private def naiveDecodeLogits(bundle: LocalModels.MarianBundle,
      src: Seq[Int], tgt: Seq[Int]): Array[Double] = {
    val W = bundle.weights
    val cfg = bundle.cfg
    val h = cfg.dModel
    def swish(x: Double): Double = x / (1.0 + math.exp(-x))
    def ln(x: Array[Double], stem: String): Array[Double] = {
      val g = W(stem + ".weight"); val b = W(stem + ".bias")
      val mean = x.sum / x.length
      val v = x.map(d => (d - mean) * (d - mean)).sum / x.length
      x.indices.map(k => (x(k) - mean) / math.sqrt(v + cfg.layerNormEps) * g.data(k) + b.data(k)).toArray
    }
    def mv(stem: String, x: Array[Double]): Array[Double] = {
      val wt = W(stem + ".weight"); val b = W(stem + ".bias")
      (0 until wt.rows).map(o =>
        (0 until wt.cols).map(k => wt(o, k).toDouble * x(k)).sum + b.data(o)).toArray
    }
    def attend(q0: Seq[Array[Double]], kv0: Seq[Array[Double]], stem: String,
        heads: Int, causal: Boolean): Seq[Array[Double]] = {
      val dh = h / heads
      val q = q0.map(mv(stem + ".q_proj", _))
      val k = kv0.map(mv(stem + ".k_proj", _))
      val v = kv0.map(mv(stem + ".v_proj", _))
      q.indices.map { i =>
        val out = new Array[Double](h)
        for (hd <- 0 until heads) {
          val off = hd * dh
          val js = kv0.indices.filter(j => !causal || j <= i)
          val scores = js.map(j =>
            (0 until dh).map(d => q(i)(off + d) * k(j)(off + d)).sum / math.sqrt(dh.toDouble))
          val mx = scores.max
          val exps = scores.map(s => math.exp(s - mx))
          val z = exps.sum
          for ((j, jj) <- js.zipWithIndex; d <- 0 until dh)
            out(off + d) += exps(jj) / z * v(j)(off + d)
        }
        out
      }.map(mv(stem + ".out_proj", _))
    }
    def addNorm(a: Seq[Array[Double]], b: Seq[Array[Double]], stem: String) =
      a.zip(b).map { case (x, y) => ln(x.zip(y).map { case (u, v2) => u + v2 }, stem) }
    // Marian embed: tokens × √d + positions (checkpoint buffer on the
    // encoder side, computed sinusoidal on the decoder side); NO embed LN
    def embed(tokens: Seq[Int], side: String): Seq[Array[Double]] = {
      val scale = math.sqrt(h.toDouble)
      tokens.zipWithIndex.map { case (tok, pos) =>
        val pe = W.get(s"model.$side.embed_positions.weight")
          .map(t => (0 until h).map(k => t(pos, k).toDouble).toArray)
          .getOrElse(naivePos(pos, h))
        (0 until h).map(k =>
          W("model.shared.weight")(tok, k) * scale + pe(k)).toArray
      }
    }
    var xs = embed(src, "encoder")
    for (l <- 0 until cfg.encoderLayers) {
      val p = s"model.encoder.layers.$l."
      xs = addNorm(xs, attend(xs, xs, p + "self_attn", cfg.encoderHeads, causal = false),
        p + "self_attn_layer_norm")
      xs = addNorm(xs, xs.map(x => mv(p + "fc2", mv(p + "fc1", x).map(swish))),
        p + "final_layer_norm")
    }
    var ys = embed(tgt, "decoder")
    for (l <- 0 until cfg.decoderLayers) {
      val p = s"model.decoder.layers.$l."
      ys = addNorm(ys, attend(ys, ys, p + "self_attn", cfg.decoderHeads, causal = true),
        p + "self_attn_layer_norm")
      ys = addNorm(ys, attend(ys, xs, p + "encoder_attn", cfg.decoderHeads, causal = false),
        p + "encoder_attn_layer_norm")
      ys = addNorm(ys, ys.map(x => mv(p + "fc2", mv(p + "fc1", x).map(swish))),
        p + "final_layer_norm")
    }
    val last = ys.last
    (0 until cfg.vocabSize).map(vt =>
      W("final_logits_bias").data(vt).toDouble +
        (0 until h).map(k => last(k) * W("model.shared.weight")(vt, k)).sum).toArray
  }

  test("config: marian model_type selects the variant knobs") {
    val bundle = LocalModels.loadMarian(dir)
    val cfg = bundle.cfg
    assert(cfg.scaleEmbedding && cfg.staticPositions && !cfg.normEmbedding)
    assert(cfg.activation == "swish")
    assert(cfg.decoderStartTokenId == 257) // pad, the Marian convention
    assert(bundle.langCodeToId == Map(">>fra<<" -> 258, ">>deu<<" -> 259))
  }

  test("decodeStep matches the independent naive implementation") {
    val bundle = LocalModels.loadMarian(dir)
    val src = bundle.encodeSource("guten tag welt", 32)
    val tgt = Seq(bundle.cfg.decoderStartTokenId, 110, 72)
    val fast = bundle.model.decodeStep(tgt, bundle.model.encode(src), src.length)
    val slow = naiveDecodeLogits(bundle, src, tgt)
    assert(fast.length == slow.length && fast.length == 266)
    fast.zip(slow).foreach { case (f, s) => assert(math.abs(f - s) < 1e-3, s"$f vs $s") }
    assert(fast.zipWithIndex.maxBy(_._1)._2 == slow.zipWithIndex.maxBy(_._1)._2)
  }

  test("sinusoidal fallback table matches the closed form") {
    val bundle = LocalModels.loadMarian(dir)
    // decoder side omits embed_positions → the model computes it; verify
    // through embeddings at two positions with a zero-ish probe: compare
    // decodeStep under a checkpoint that DOES carry the buffer
    assert(!bundle.weights.contains("model.decoder.embed_positions.weight"))
    assert(bundle.weights.contains("model.encoder.embed_positions.weight"))
    // spot-check the closed form itself
    val d = bundle.cfg.dModel
    val p5 = naivePos(5, d)
    assert(math.abs(p5(0) - math.sin(5.0)) < 1e-12)
    assert(math.abs(p5(d / 2) - math.cos(5.0)) < 1e-12)
  }

  test("forced BOS pins the first generated token per target language") {
    val bundle = LocalModels.loadMarian(dir)
    val src = bundle.encodeSource("hello world", 32)
    val fr = bundle.model.generate(src, 5, forcedBosTokenId = Some(258))
    val de = bundle.model.generate(src, 5, forcedBosTokenId = Some(259))
    assert(fr.headOption.contains(258) && de.headOption.contains(259))
    // unforced greedy differs in its first token from at least one of them
    val free = bundle.model.generate(src, 5, forcedBosTokenId = None)
    assert(free.headOption != Some(258) || free.headOption != Some(259))
    // determinism
    assert(fr == bundle.model.generate(src, 5, Some(258)))
  }

  test("translation dataframe surface: partition invariant, null safe, lang errors") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = ((1 to 5).map(i => (i.toLong, s"text number $i to translate")) :+
      (9L, null.asInstanceOf[String])).toDF("id", "text")
    def run(parts: Int): Map[Long, String] =
      LocalModels.translation(df.repartition(parts), "text", "fr", dir,
        targetLang = Some(">>fra<<"), maxNewTokens = 5)
        .select("id", "fr").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null)
    assert(a.filterNot(_._1 == 9L).values.forall(_ != null))
    // unknown language code errors with the supported list (reference
    // RequestError semantics, huggingface.py:1612-1623)
    val e = intercept[IllegalArgumentException] {
      LocalModels.translation(df, "text", "xx", dir, targetLang = Some(">>spa<<"))
    }
    assert(e.getMessage.contains(">>fra<<") && e.getMessage.contains(">>deu<<"))
  }
}
