package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** VisionEncoderDecoder captioner: independent naive cross-check of the
  * GPT-2-with-cross-attention decoder (the only new math — both towers
  * are already naive-checked in VitSpec/Gpt2Spec), combined-checkpoint
  * name remapping, and the Spark surface.
  */
class CaptionSpec extends AnyFunSuite {

  private lazy val capDir: String = LocalModels.ensureTinyCaptionModel(seed = 42L)

  private def naiveDecodeLogits(bundle: LocalModels.CaptionBundle,
      enc: Array[Float], encLen: Int, tokens: Seq[Int]): Array[Double] = {
    val W = bundle.weights
    val cfg = bundle.gptCfg
    val h = cfg.nEmbd
    def ln(x: Array[Double], stem: String): Array[Double] = {
      val g = W(stem + ".weight"); val b = W(stem + ".bias")
      val mean = x.sum / x.length
      val v = x.map(d => (d - mean) * (d - mean)).sum / x.length
      x.indices.map(k => (x(k) - mean) / math.sqrt(v + cfg.layerNormEps) * g.data(k) + b.data(k)).toArray
    }
    def conv1d(stem: String, x: Array[Double]): Array[Double] = {
      val wt = W(stem + ".weight"); val b = W(stem + ".bias")
      (0 until wt.cols).map(o => x.indices.map(k => x(k) * wt(k, o)).sum + b.data(o)).toArray
    }
    def geluNew(x: Double): Double =
      0.5 * x * (1.0 + math.tanh(math.sqrt(2.0 / math.Pi) * (x + 0.044715 * x * x * x)))
    val dh = h / cfg.nHead
    val encRows = (0 until encLen).map(i =>
      (0 until h).map(k => enc(i * h + k).toDouble).toArray)
    var xs: Seq[Array[Double]] = tokens.zipWithIndex.map { case (tok, pos) =>
      (0 until h).map(k => W("wte.weight")(tok, k).toDouble + W("wpe.weight")(pos, k)).toArray
    }
    for (l <- 0 until cfg.nLayer) {
      val p = s"h.$l."
      // self
      val n1 = xs.map(ln(_, p + "ln_1"))
      val qkv = n1.map(conv1d(p + "attn.c_attn", _))
      val selfCtx = xs.indices.map { i =>
        val out = new Array[Double](h)
        for (hd <- 0 until cfg.nHead) {
          val off = hd * dh
          val js = 0 to i
          val scores = js.map(j =>
            (0 until dh).map(d => qkv(i)(off + d) * qkv(j)(h + off + d)).sum / math.sqrt(dh.toDouble))
          val mx = scores.max
          val exps = scores.map(s => math.exp(s - mx)); val z = exps.sum
          for ((j, jj) <- js.zipWithIndex; d <- 0 until dh)
            out(off + d) += exps(jj) / z * qkv(j)(2 * h + off + d)
        }
        out
      }.map(conv1d(p + "attn.c_proj", _))
      xs = xs.zip(selfCtx).map { case (a, b) => a.zip(b).map { case (u, v) => u + v } }
      // cross
      val n2 = xs.map(ln(_, p + "ln_cross_attn"))
      val q = n2.map(conv1d(p + "crossattention.q_attn", _))
      val kv = encRows.map(conv1d(p + "crossattention.c_attn", _))
      val crossCtx = xs.indices.map { i =>
        val out = new Array[Double](h)
        for (hd <- 0 until cfg.nHead) {
          val off = hd * dh
          val scores = encRows.indices.map(j =>
            (0 until dh).map(d => q(i)(off + d) * kv(j)(off + d)).sum / math.sqrt(dh.toDouble))
          val mx = scores.max
          val exps = scores.map(s => math.exp(s - mx)); val z = exps.sum
          for ((j, jj) <- encRows.indices.zip(exps.indices); d <- 0 until dh)
            out(off + d) += exps(jj) / z * kv(j)(h + off + d)
        }
        out
      }.map(conv1d(p + "crossattention.c_proj", _))
      xs = xs.zip(crossCtx).map { case (a, b) => a.zip(b).map { case (u, v) => u + v } }
      // mlp
      val n3 = xs.map(ln(_, p + "ln_2"))
      val ff = n3.map(x => conv1d(p + "mlp.c_proj", conv1d(p + "mlp.c_fc", x).map(geluNew)))
      xs = xs.zip(ff).map { case (a, b) => a.zip(b).map { case (u, v) => u + v } }
    }
    val last = ln(xs.last, "ln_f")
    (0 until cfg.vocabSize).map(vt =>
      (0 until h).map(k => last(k) * W("wte.weight")(vt, k)).sum).toArray
  }

  test("cross-attention decoder matches the independent naive implementation") {
    val bundle = LocalModels.loadCaptioner(capDir)
    val s = bundle.vitCfg.imageSize
    val pix = Array.tabulate(3 * s * s)(i => ((i * 41 % 89) / 89.0f) - 0.4f)
    val enc = bundle.model.encode(pix)
    val encLen = 1 + (s / bundle.vitCfg.patchSize) * (s / bundle.vitCfg.patchSize)
    val tokens = Seq(bundle.gptCfg.eosTokenId, 104, 105)
    val fast = bundle.model.decodeLogits(tokens, enc, encLen)
    val slow = naiveDecodeLogits(bundle, enc, encLen, tokens)
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (f, sv) => assert(math.abs(f - sv) < 1e-3, s"$f vs $sv") }
    assert(fast.zipWithIndex.maxBy(_._1)._2 == slow.zipWithIndex.maxBy(_._1)._2)
  }

  test("caption: deterministic, bounded, decodes to text") {
    val bundle = LocalModels.loadCaptioner(capDir)
    val s = bundle.vitCfg.imageSize
    val pix = new Array[Float](3 * s * s)
    val c1 = bundle.model.caption(pix, maxNewTokens = 6)
    val c2 = bundle.model.caption(pix, maxNewTokens = 6)
    assert(c1 == c2 && c1.length <= 6)
    assert(bundle.tokenizer.decode(c1) != null)
  }

  test("imageCaptioning dataframe surface: partition invariant, null safe") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = (1 to 4).map(i =>
      (i.toLong, graft.functions.Images.solidPng(10, 8, i * 654321 % 0xffffff))) :+
      (9L, null.asInstanceOf[Array[Byte]])
    val df = rows.toDF("id", "png")
    def run(parts: Int): Map[Long, String] =
      LocalModels.imageCaptioning(df.repartition(parts), "png", "cap", capDir,
        maxNewTokens = 5)
        .select("id", "cap").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null)
    assert(a.filterNot(_._1 == 9L).values.forall(_ != null))
  }
}
