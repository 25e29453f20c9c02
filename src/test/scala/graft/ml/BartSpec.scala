package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** BART: independent naive reimplementation cross-check of the post-LN
  * seq2seq forward (position offset +2, layernorm_embedding,
  * final_logits_bias), greedy summarize behavior, and the Spark surface.
  */
class BartSpec extends AnyFunSuite {

  private lazy val bartDir: String = LocalModels.ensureTinyBartModel(seed = 42L)

  private def naiveDecodeLogits(bundle: LocalModels.BartBundle,
      src: Seq[Int], tgt: Seq[Int]): Array[Double] = {
    val W = bundle.weights
    val cfg = bundle.cfg
    val h = cfg.dModel
    def gelu(x: Double): Double = x * 0.5 * (1.0 + Tensors.erf(x / math.sqrt(2.0)))
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
    def embed(tokens: Seq[Int], side: String): Seq[Array[Double]] = {
      val e = tokens.zipWithIndex.map { case (tok, pos) =>
        (0 until h).map(k => W("model.shared.weight")(tok, k).toDouble +
          W(s"model.$side.embed_positions.weight")(pos + 2, k)).toArray
      }
      e.map(ln(_, s"model.$side.layernorm_embedding"))
    }
    var xs = embed(src, "encoder")
    for (l <- 0 until cfg.encoderLayers) {
      val p = s"model.encoder.layers.$l."
      xs = addNorm(xs, attend(xs, xs, p + "self_attn", cfg.encoderHeads, causal = false),
        p + "self_attn_layer_norm")
      xs = addNorm(xs, xs.map(x => mv(p + "fc2", mv(p + "fc1", x).map(gelu))),
        p + "final_layer_norm")
    }
    var ys = embed(tgt, "decoder")
    for (l <- 0 until cfg.decoderLayers) {
      val p = s"model.decoder.layers.$l."
      ys = addNorm(ys, attend(ys, ys, p + "self_attn", cfg.decoderHeads, causal = true),
        p + "self_attn_layer_norm")
      ys = addNorm(ys, attend(ys, xs, p + "encoder_attn", cfg.decoderHeads, causal = false),
        p + "encoder_attn_layer_norm")
      ys = addNorm(ys, ys.map(x => mv(p + "fc2", mv(p + "fc1", x).map(gelu))),
        p + "final_layer_norm")
    }
    val last = ys.last
    (0 until cfg.vocabSize).map(vt =>
      W("final_logits_bias").data(vt).toDouble +
        (0 until h).map(k => last(k) * W("model.shared.weight")(vt, k)).sum).toArray
  }

  test("decodeStep matches the independent naive implementation") {
    val bundle = LocalModels.loadBart(bartDir)
    val src = bundle.encodeSource("the quick brown fox jumps over the lazy dog", 32)
    val tgt = Seq(bundle.cfg.decoderStartTokenId, 116, 104)
    val fast = bundle.model.decodeStep(tgt, bundle.model.encode(src), src.length)
    val slow = naiveDecodeLogits(bundle, src, tgt)
    assert(fast.length == slow.length && fast.length == 259)
    fast.zip(slow).foreach { case (f, s) => assert(math.abs(f - s) < 1e-3, s"$f vs $s") }
    assert(fast.zipWithIndex.maxBy(_._1)._2 == slow.zipWithIndex.maxBy(_._1)._2)
  }

  test("summarize: deterministic, bounded, decodes to text") {
    val bundle = LocalModels.loadBart(bartDir)
    val src = bundle.encodeSource("some longer input text to be summarized here", 40)
    val s1 = bundle.model.summarize(src, maxNewTokens = 6)
    val s2 = bundle.model.summarize(src, maxNewTokens = 6)
    assert(s1 == s2 && s1.length <= 6)
    assert(bundle.tokenizer.decode(s1) != null)
  }

  test("summarization dataframe surface: partition invariant, null safe") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = ((1 to 5).map(i => (i.toLong, s"document body number $i with content")) :+
      (9L, null.asInstanceOf[String])).toDF("id", "text")
    def run(parts: Int): Map[Long, String] =
      LocalModels.summarization(df.repartition(parts), "text", "summary", bartDir,
        maxNewTokens = 5)
        .select("id", "summary").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null)
    assert(a.filterNot(_._1 == 9L).values.forall(_ != null))
  }
}
