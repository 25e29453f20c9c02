package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** BPE pins + an independent naive reimplementation of BOTH CLIP towers
  * (per-position double vectors, no flattening) cross-checking the engine,
  * plus preprocessing pins and batch invariance.
  */
class ClipSpec extends AnyFunSuite {

  // ---- byte-level BPE ----------------------------------------------

  test("bytes_to_unicode: printable bytes map direct, space is Ġ") {
    assert(Bpe.byteToUnicode('!'.toInt) == '!')
    assert(Bpe.byteToUnicode('~'.toInt) == '~')
    assert(Bpe.byteToUnicode(' '.toInt) == 'Ġ') // Ġ
    assert(Bpe.byteToUnicode(0) == 'Ā') // Ā: first excluded byte
    assert(Bpe.byteToUnicode('\n'.toInt) == 'Ċ') // Ċ
  }

  private def tinyBpe: Bpe = {
    val (vocab, merges) = Bpe.tinyClipVocab
    new Bpe(vocab.zipWithIndex.toMap, merges, clipMode = true)
  }

  test("clip-mode BPE: end-of-word marker gates merges") {
    val bpe = tinyBpe
    val (vocab, _) = Bpe.tinyClipVocab
    val id = vocab.zipWithIndex.toMap
    // "the" → t+h merge, then th+e</w> merge → single token
    assert(bpe.encode("the") == Seq(id("the</w>")))
    // "an" → the (a,n) merge cannot fire because the word-final symbol is
    // "n</w>", not "n" → stays character-split
    assert(bpe.encode("an") == Seq(id("a"), id("n</w>")))
    // "than" → (t,h) fires, (a,n) blocked by the marker
    assert(bpe.encode("than") == Seq(id("th"), id("a"), id("n</w>")))
    // lowercasing + whitespace collapse
    assert(bpe.encode("THE   the") == Seq(id("the</w>"), id("the</w>")))
  }

  test("BPE round-trips through vocab.json + merges.txt files") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    val (vocab, merges) = Bpe.tinyClipVocab
    Bpe.writeFiles(s"$dir/vocab.json", s"$dir/merges.txt", vocab, merges)
    val loaded = Bpe.fromFiles(s"$dir/vocab.json", s"$dir/merges.txt")
    assert(loaded.encode("the quick fox") == tinyBpe.encode("the quick fox"))
  }

  // ---- naive reimplementation --------------------------------------

  private lazy val clipDir: String = LocalModels.ensureTinyClipModel(seed = 42L)

  private def ln(x: Array[Double], g: Tensor, b: Tensor, eps: Double): Array[Double] = {
    val mean = x.sum / x.length
    val v = x.map(d => (d - mean) * (d - mean)).sum / x.length
    x.indices.map(k => (x(k) - mean) / math.sqrt(v + eps) * g.data(k) + b.data(k)).toArray
  }

  private def matvec(w: Tensor, b: Option[Tensor], x: Array[Double]): Array[Double] =
    (0 until w.rows).map(o =>
      (0 until w.cols).map(k => w(o, k).toDouble * x(k)).sum +
        b.map(_.data(o).toDouble).getOrElse(0.0)).toArray

  /** Pre-LN stack on a seq of double vectors; causal optional. */
  private def naiveStack(bundle: LocalModels.ClipBundle, prefix: String,
      tower: ClipTowerConfig, xs0: Seq[Array[Double]], causal: Boolean): Seq[Array[Double]] = {
    val W = bundle.weights
    var xs = xs0
    val dh = tower.headDim
    for (l <- 0 until tower.numLayers) {
      val p = s"${prefix}encoder.layers.$l."
      val n1 = xs.map(ln(_, W(p + "layer_norm1.weight"), W(p + "layer_norm1.bias"), tower.layerNormEps))
      val q = n1.map(matvec(W(p + "self_attn.q_proj.weight"), Some(W(p + "self_attn.q_proj.bias")), _))
      val k = n1.map(matvec(W(p + "self_attn.k_proj.weight"), Some(W(p + "self_attn.k_proj.bias")), _))
      val v = n1.map(matvec(W(p + "self_attn.v_proj.weight"), Some(W(p + "self_attn.v_proj.bias")), _))
      val ctx = xs.indices.map { i =>
        val out = new Array[Double](tower.hiddenSize)
        for (head <- 0 until tower.numHeads) {
          val off = head * dh
          val js = xs.indices.filter(j => !causal || j <= i)
          val scores = js.map { j =>
            (0 until dh).map(d => q(i)(off + d) * k(j)(off + d)).sum / math.sqrt(dh.toDouble)
          }
          val mx = scores.max
          val exps = scores.map(s => math.exp(s - mx))
          val z = exps.sum
          for ((j, jj) <- js.zipWithIndex; d <- 0 until dh)
            out(off + d) += exps(jj) / z * v(j)(off + d)
        }
        out
      }
      val attnOut = ctx.map(matvec(W(p + "self_attn.out_proj.weight"), Some(W(p + "self_attn.out_proj.bias")), _))
      xs = xs.zip(attnOut).map { case (a, b) => a.zip(b).map { case (x1, x2) => x1 + x2 } }
      val n2 = xs.map(ln(_, W(p + "layer_norm2.weight"), W(p + "layer_norm2.bias"), tower.layerNormEps))
      val inter = n2.map(matvec(W(p + "mlp.fc1.weight"), Some(W(p + "mlp.fc1.bias")), _))
        .map(_.map(x => x / (1.0 + math.exp(-1.702 * x)))) // quick_gelu
      val ffOut = inter.map(matvec(W(p + "mlp.fc2.weight"), Some(W(p + "mlp.fc2.bias")), _))
      xs = xs.zip(ffOut).map { case (a, b) => a.zip(b).map { case (x1, x2) => x1 + x2 } }
    }
    xs
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(d => d * d).sum)
    v.map(_ / n)
  }

  private def naiveTextEmbed(bundle: LocalModels.ClipBundle, text: String): Array[Double] = {
    val W = bundle.weights
    val cfg = bundle.cfg.text
    val ids = bundle.encodeText(text)
    var xs: Seq[Array[Double]] = ids.toSeq.zipWithIndex.map { case (id, pos) =>
      (0 until cfg.hiddenSize).map(kk =>
        W("text_model.embeddings.token_embedding.weight")(id, kk).toDouble +
          W("text_model.embeddings.position_embedding.weight")(pos, kk)).toArray
    }
    xs = naiveStack(bundle, "text_model.", cfg, xs, causal = true)
    xs = xs.map(ln(_, W("text_model.final_layer_norm.weight"),
      W("text_model.final_layer_norm.bias"), cfg.layerNormEps))
    val eosPos = ids.indexOf(bundle.eosId)
    normalize(matvec(W("text_projection.weight"), None, xs(eosPos)))
  }

  private def naiveImageEmbed(bundle: LocalModels.ClipBundle,
      pix: Array[Float]): Array[Double] = {
    val W = bundle.weights
    val cfg = bundle.cfg.vision
    val s = cfg.imageSize; val p = cfg.patchSize; val grid = s / p
    val h = cfg.hiddenSize
    val pw = W("vision_model.embeddings.patch_embedding.weight")
    val pos = W("vision_model.embeddings.position_embedding.weight")
    val cls = (0 until h).map(kk =>
      W("vision_model.embeddings.class_embedding").data(kk).toDouble + pos(0, kk)).toArray
    val patches = for (gy <- 0 until grid; gx <- 0 until grid) yield {
      val t = 1 + gy * grid + gx
      (0 until h).map { o =>
        var acc = 0.0
        for (c <- 0 until 3; py <- 0 until p; px <- 0 until p)
          acc += pw.data(((o * 3 + c) * p + py) * p + px).toDouble *
            pix(c * s * s + (gy * p + py) * s + (gx * p + px))
        acc + pos(t, o)
      }.toArray
    }
    var xs: Seq[Array[Double]] = cls +: patches
    xs = xs.map(ln(_, W("vision_model.pre_layrnorm.weight"),
      W("vision_model.pre_layrnorm.bias"), cfg.layerNormEps))
    xs = naiveStack(bundle, "vision_model.", cfg, xs, causal = false)
    val pooled = ln(xs(0), W("vision_model.post_layernorm.weight"),
      W("vision_model.post_layernorm.bias"), cfg.layerNormEps)
    normalize(matvec(W("visual_projection.weight"), None, pooled))
  }

  test("text tower matches the independent naive implementation") {
    val bundle = LocalModels.loadClip(clipDir)
    for (text <- Seq("the quick brown fox", "a", "than the!")) {
      val fast = bundle.model.textEmbed(Seq(bundle.encodeText(text)))(0)
      val slow = naiveTextEmbed(bundle, text)
      assert(fast.length == slow.length && fast.length == 8)
      fast.zip(slow).foreach { case (f, sv) =>
        assert(math.abs(f - sv) < 1e-4, s"'$text': $f vs $sv")
      }
    }
  }

  test("vision tower matches the independent naive implementation") {
    val bundle = LocalModels.loadClip(clipDir)
    // deterministic non-uniform pixels exercise patch layout
    val s = bundle.cfg.vision.imageSize
    val pix = Array.tabulate(3 * s * s)(i => ((i * 37 % 113) / 113.0f) - 0.5f)
    val fast = bundle.model.imageEmbed(Seq(pix))(0)
    val slow = naiveImageEmbed(bundle, pix)
    fast.zip(slow).foreach { case (f, sv) =>
      assert(math.abs(f - sv) < 1e-4, s"$f vs $sv")
    }
  }

  test("text batch is bit-identical to one-at-a-time (causal + end padding)") {
    val bundle = LocalModels.loadClip(clipDir)
    val texts = Seq("a", "the quick brown fox jumps over a lazy dog", "mid size")
    val batched = bundle.model.textEmbed(texts.map(bundle.encodeText))
    val single = texts.map(t => bundle.model.textEmbed(Seq(bundle.encodeText(t)))(0))
    batched.zip(single).foreach { case (b, sv) => assert(b.toSeq == sv.toSeq) }
  }

  test("preprocess: solid white image hits the published mean/std constants") {
    val bundle = LocalModels.loadClip(clipDir)
    val img = new java.awt.image.BufferedImage(10, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 7; x <- 0 until 10) img.setRGB(x, y, 0xffffff)
    val pix = bundle.model.preprocess(img)
    val s = bundle.cfg.vision.imageSize
    assert(pix.length == 3 * s * s)
    val expected = (0 until 3).map(c =>
      ((1.0 - ClipModel.Mean(c)) / ClipModel.Std(c)).toFloat)
    for (c <- 0 until 3)
      assert(math.abs(pix(c * s * s) - expected(c)) < 1e-5f, s"channel $c")
  }

  test("both towers emit unit-norm projection_dim vectors") {
    val bundle = LocalModels.loadClip(clipDir)
    val te = bundle.model.textEmbed(Seq(bundle.encodeText("hello world")))(0)
    val s = bundle.cfg.vision.imageSize
    val ie = bundle.model.imageEmbed(Seq(new Array[Float](3 * s * s)))(0)
    for (v <- Seq(te, ie)) {
      assert(v.length == 8)
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    }
    // joint space: cosine is a valid similarity
    val cos = te.zip(ie).map { case (a, b) => a.toDouble * b }.sum
    assert(cos >= -1.0001 && cos <= 1.0001)
  }
}
