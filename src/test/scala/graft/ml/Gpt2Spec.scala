package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** GPT-2 kernel pins (Conv1D [in,out] layout, gelu_new), an independent
  * naive forward cross-check, greedy-generation behavior, and the
  * offset-tracking tokenizer + token-classification / extractive-QA heads.
  */
class Gpt2Spec extends AnyFunSuite {

  test("linearT uses the Conv1D [in,out] convention") {
    val y = Tensors.linearT(Array(1f, 2f), 1, 2,
      Tensor(Array(2, 3), Array(1f, 0f, 1f, 0f, 1f, 1f)),
      Tensor(Array(3), Array(10f, 20f, 30f)))
    assert(y.toSeq == Seq(11f, 22f, 33f))
  }

  test("gelu_new matches the published tanh-approximation value") {
    val g = Array(1f, 0f, -1f)
    Tensors.geluNew(g)
    assert(math.abs(g(0) - 0.84119199f) < 1e-5)
    assert(g(1) == 0f)
    assert(math.abs(g(2) - (-0.15880801f)) < 1e-5)
  }

  private lazy val gptDir: String = LocalModels.ensureTinyGpt2Model(seed = 42L)

  /** Independent naive GPT-2 forward (per-position double vectors). */
  private def naiveLastLogits(bundle: LocalModels.Gpt2Bundle,
      tokens: Seq[Int]): Array[Double] = {
    val W = bundle.weights
    val cfg = bundle.cfg
    val h = cfg.nEmbd
    def ln(x: Array[Double], stem: String): Array[Double] = {
      val g = W(stem + ".weight"); val b = W(stem + ".bias")
      val mean = x.sum / x.length
      val v = x.map(d => (d - mean) * (d - mean)).sum / x.length
      x.indices.map(k => (x(k) - mean) / math.sqrt(v + cfg.layerNormEps) * g.data(k) + b.data(k)).toArray
    }
    def conv1d(stem: String, x: Array[Double]): Array[Double] = {
      val wt = W(stem + ".weight") // [in, out]
      val b = W(stem + ".bias")
      (0 until wt.cols).map(o =>
        x.indices.map(k => x(k) * wt(k, o)).sum + b.data(o)).toArray
    }
    def geluNew(x: Double): Double =
      0.5 * x * (1.0 + math.tanh(math.sqrt(2.0 / math.Pi) * (x + 0.044715 * x * x * x)))
    var xs: Seq[Array[Double]] = tokens.zipWithIndex.map { case (tok, pos) =>
      (0 until h).map(k => W("wte.weight")(tok, k).toDouble + W("wpe.weight")(pos, k)).toArray
    }
    val dh = h / cfg.nHead
    for (l <- 0 until cfg.nLayer) {
      val p = s"h.$l."
      val n1 = xs.map(ln(_, p + "ln_1"))
      val qkv = n1.map(conv1d(p + "attn.c_attn", _)) // [3h] per position
      val ctx = xs.indices.map { i =>
        val out = new Array[Double](h)
        for (hd <- 0 until cfg.nHead) {
          val off = hd * dh
          val js = 0 to i
          val scores = js.map(j =>
            (0 until dh).map(d => qkv(i)(off + d) * qkv(j)(h + off + d)).sum / math.sqrt(dh.toDouble))
          val mx = scores.max
          val exps = scores.map(s => math.exp(s - mx))
          val z = exps.sum
          for ((j, jj) <- js.zipWithIndex; d <- 0 until dh)
            out(off + d) += exps(jj) / z * qkv(j)(2 * h + off + d)
        }
        out
      }
      val attnOut = ctx.map(conv1d(p + "attn.c_proj", _))
      xs = xs.zip(attnOut).map { case (a, b) => a.zip(b).map { case (u, v) => u + v } }
      val n2 = xs.map(ln(_, p + "ln_2"))
      val ff = n2.map(x => conv1d(p + "mlp.c_proj", conv1d(p + "mlp.c_fc", x).map(geluNew)))
      xs = xs.zip(ff).map { case (a, b) => a.zip(b).map { case (u, v) => u + v } }
    }
    val last = ln(xs.last, "ln_f")
    (0 until cfg.vocabSize).map(vt =>
      (0 until h).map(k => last(k) * W("wte.weight")(vt, k)).sum).toArray
  }

  test("lastLogits matches the independent naive implementation") {
    val bundle = LocalModels.loadGpt2(gptDir)
    val tokens = bundle.tokenizer.encode("hello world")
    val fast = bundle.model.lastLogits(tokens)
    val slow = naiveLastLogits(bundle, tokens)
    assert(fast.length == slow.length && fast.length == 257)
    fast.zip(slow).foreach { case (f, s) => assert(math.abs(f - s) < 1e-3, s"$f vs $s") }
    assert(fast.zipWithIndex.maxBy(_._1)._2 == slow.zipWithIndex.maxBy(_._1)._2)
  }

  test("KV-cached step logits are bit-identical to full recompute") {
    val bundle = LocalModels.loadGpt2(gptDir)
    val m = bundle.model
    val tokens = bundle.tokenizer.encode("the quick brown fox!")
    val state = new m.KvState
    tokens.indices.foreach { i =>
      val inc = m.step(tokens(i), state)
      val full = m.lastLogits(tokens.take(i + 1))
      assert(inc.toSeq == full.toSeq, s"prefix ${i + 1} diverged")
    }
  }

  test("generate: deterministic, bounded, decodes cleanly") {
    val bundle = LocalModels.loadGpt2(gptDir)
    val prompt = bundle.tokenizer.encode("once upon a time")
    val g1 = bundle.model.generate(prompt, maxNewTokens = 6)
    val g2 = bundle.model.generate(prompt, maxNewTokens = 6)
    assert(g1 == g2 && g1.length <= 6)
    // generation extends the prompt's forward pass: first generated token
    // is the argmax of the prompt logits
    val l = bundle.model.lastLogits(prompt)
    if (g1.nonEmpty) assert(g1.head == l.zipWithIndex.maxBy(_._1)._2)
    assert(bundle.tokenizer.decode(g1) != null)
  }

  // ---- offset tokenizer + span heads --------------------------------

  test("tokenizeWithOffsets: spans index the original text") {
    val wp = WordPiece.fromTokens(Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]",
      "un", "##aff", "##able", "hello", ",", "!"))
    val text = "Hello, unaffable!"
    val spans = wp.tokenizeWithOffsets(text)
    assert(spans.map(_._1) == Seq("hello", ",", "un", "##aff", "##able", "!"))
    // every span recovers its (lowercased) surface form
    spans.foreach { case (tok, s, e) =>
      val surface = text.substring(s, e).toLowerCase
      assert(tok.stripPrefix("##") == surface, s"$tok vs $surface")
    }
    // an UNK word keeps the whole-word span
    val spans2 = wp.tokenizeWithOffsets("zzz hello")
    assert(spans2.head == ("[UNK]", 0, 3))
  }

  test("tokenClassification: one entry per wordpiece with softmax scores") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = LocalModels.ensureTinyModel(seed = 7L, numLabels = 3)
    val df = Seq((1L, "hello brave new world")).toDF("id", "text")
    val out = LocalModels.tokenClassification(df, "text", "ents", dir)
      .select("ents").collect()(0).getSeq[org.apache.spark.sql.Row](0)
    // one entry per wordpiece (char-level tiny vocab splits every word)
    val expected = LocalModels.load(dir).tokenizer.tokenize("hello brave new world")
    assert(out.length == expected.length)
    assert(out.map(_.getString(0)) == expected)
    out.foreach { r =>
      assert(Set("LABEL_0", "LABEL_1", "LABEL_2").contains(r.getString(1)))
      assert(r.getFloat(2) > 1f / 3 - 1e-4 && r.getFloat(2) <= 1f)
    }
  }

  test("questionAnswering: answer is the span the offsets point at") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = LocalModels.ensureTinyModel(seed = 13L, qaHead = true)
    val context = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, "what jumps", context)).toDF("id", "q", "ctx")
    val row = LocalModels.questionAnswering(df, "q", "ctx", "ans", dir)
      .select("ans.answer", "ans.score", "ans.start", "ans.end").collect()(0)
    val answer = row.getString(0)
    assert(answer != null && answer.nonEmpty)
    assert(context.substring(row.getLong(2).toInt, row.getLong(3).toInt) == answer)
    assert(row.getFloat(1) > 0f && row.getFloat(1) <= 1f)
    // deterministic
    val again = LocalModels.questionAnswering(df, "q", "ctx", "ans", dir)
      .select("ans.answer").collect()(0).getString(0)
    assert(again == answer)
  }
}
