package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** SAM: independent naive reimplementation of the full promptable
  * forward — ViTDet vision encoder (window partition, decomposed
  * relative positions, LayerNorm2d neck), random-Fourier prompt
  * encoding, and the two-way mask decoder (token/image cross attention
  * with internal downsample, transposed-conv upscaling, hypernetwork
  * MLPs) — in per-position Double math vs the engine's flattened float
  * buffers, plus post-process geometry and the Spark surface.
  */
class SamSpec extends AnyFunSuite {

  private lazy val samDir: String = LocalModels.ensureTinySamModel(seed = 42L)

  // ---- naive vision encoder -------------------------------------------

  private def lin(W: Map[String, Tensor], stem: String, x: Array[Double]): Array[Double] = {
    val wt = W(stem + ".weight"); val b = W(stem + ".bias")
    Array.tabulate(wt.rows)(o => x.indices.map(k => x(k) * wt(o, k)).sum + b.data(o))
  }

  private def ln(W: Map[String, Tensor], stem: String, x: Array[Double], eps: Double): Array[Double] = {
    val g = W(stem + ".weight"); val b = W(stem + ".bias")
    val mean = x.sum / x.length
    val v = x.map(u => (u - mean) * (u - mean)).sum / x.length
    Array.tabulate(x.length)(k => (x(k) - mean) / math.sqrt(v + eps) * g.data(k) + b.data(k))
  }

  private def gelu(x: Double): Double = {
    // exact erf gelu via the engine's erf (scalar math, not a kernel)
    x * 0.5 * (1.0 + Tensors.erf(x / math.sqrt(2.0)))
  }

  /** Attention with decomposed rel-pos over a (gh×gw) grid of tokens. */
  private def naiveGridAttention(W: Map[String, Tensor], cfg: SamConfig, li: Int,
      toks: Seq[Array[Double]], gh: Int, gw: Int): Seq[Array[Double]] = {
    val hid = cfg.visionHidden; val dh = cfg.visionHeadDim
    val p = s"vision_encoder.layers.$li.attn."
    val qkv = toks.map(lin(W, p + "qkv", _))
    val relH = W(p + "rel_pos_h"); val relW = W(p + "rel_pos_w")
    toks.indices.map { qi =>
      val out = new Array[Double](hid)
      for (hd <- 0 until cfg.visionHeads) {
        val off = hd * dh
        val scores = toks.indices.map { ki =>
          val dot = (0 until dh).map(c => qkv(qi)(off + c) * qkv(ki)(hid + off + c)).sum /
            math.sqrt(dh.toDouble)
          val dy = qi / gw - ki / gw + gh - 1
          val dx = qi % gw - ki % gw + gw - 1
          val rh = (0 until dh).map(c => qkv(qi)(off + c) * relH(dy, c)).sum
          val rw = (0 until dh).map(c => qkv(qi)(off + c) * relW(dx, c)).sum
          dot + rh + rw
        }
        val mx = scores.max
        val exps = scores.map(s => math.exp(s - mx)); val z = exps.sum
        for (ki <- toks.indices; c <- 0 until dh)
          out(off + c) += exps(ki) / z * qkv(ki)(2 * hid + off + c)
      }
      lin(W, p + "proj", out)
    }
  }

  private def naiveVision(W: Map[String, Tensor], cfg: SamConfig,
      pix: Array[Float]): Seq[Array[Double]] = {
    val hid = cfg.visionHidden; val g = cfg.grid; val s = cfg.imageSize
    val patch = cfg.patchSize
    val pw = W("vision_encoder.patch_embed.projection.weight")
    val pb = W("vision_encoder.patch_embed.projection.bias")
    val pos = W("vision_encoder.pos_embed")
    var toks: Seq[Array[Double]] = (0 until g * g).map { t =>
      val py = t / g; val px = t % g
      Array.tabulate(hid) { oc =>
        var acc = pb.data(oc).toDouble
        for (ic <- 0 until 3; ky <- 0 until patch; kx <- 0 until patch)
          acc += pix((ic * s + py * patch + ky) * s + px * patch + kx) *
            pw.data(((oc * 3 + ic) * patch + ky) * patch + kx)
        acc + pos.data(t * hid + oc)
      }
    }
    for (li <- 0 until cfg.visionLayers) {
      val p = s"vision_encoder.layers.$li."
      val normed = toks.map(ln(W, p + "layer_norm1", _, cfg.vitEps))
      val attnOut: Seq[Array[Double]] =
        if (cfg.globalAttnIndexes.contains(li)) naiveGridAttention(W, cfg, li, normed, g, g)
        else {
          val ws = cfg.windowSize
          val out = Array.fill(g * g)(new Array[Double](hid))
          for (wy <- 0 until g / ws; wx <- 0 until g / ws) {
            val idxs = for (yy <- 0 until ws; xx <- 0 until ws)
              yield (wy * ws + yy) * g + (wx * ws + xx)
            val res = naiveGridAttention(W, cfg, li, idxs.map(normed), ws, ws)
            idxs.zip(res).foreach { case (gi, r) => out(gi) = r }
          }
          out.toSeq
        }
      toks = toks.zip(attnOut).map { case (a, b) => a.zip(b).map { case (u, v) => u + v } }
      toks = toks.map { x =>
        val n = ln(W, p + "layer_norm2", x, cfg.vitEps)
        val i1 = lin(W, p + "mlp.lin1", n).map(gelu)
        val o = lin(W, p + "mlp.lin2", i1)
        x.zip(o).map { case (u, v) => u + v }
      }
    }
    // neck with LayerNorm2d (normalize ACROSS channels per position)
    val c = cfg.outputChannels
    def ln2d(xs: Seq[Array[Double]], stem: String): Seq[Array[Double]] = {
      val gw2 = W(stem + ".weight"); val bw = W(stem + ".bias")
      xs.map { v =>
        val mean = v.sum / v.length
        val vv = v.map(u => (u - mean) * (u - mean)).sum / v.length
        Array.tabulate(v.length)(k => (v(k) - mean) / math.sqrt(vv + cfg.lnEps) * gw2.data(k) + bw.data(k))
      }
    }
    val conv1 = W("vision_encoder.neck.conv1.weight")
    var xs = toks.map(v => Array.tabulate(c)(oc =>
      (0 until cfg.visionHidden).map(ic => v(ic) * conv1.data(oc * cfg.visionHidden + ic)).sum))
    xs = ln2d(xs, "vision_encoder.neck.layer_norm1")
    val conv2 = W("vision_encoder.neck.conv2.weight")
    val c2 = (0 until g * g).map { t =>
      val ty = t / g; val tx = t % g
      Array.tabulate(c) { oc =>
        var acc = 0.0
        for (ic <- 0 until c; ky <- -1 to 1; kx <- -1 to 1) {
          val yy = ty + ky; val xx = tx + kx
          if (yy >= 0 && yy < g && xx >= 0 && xx < g)
            acc += xs(yy * g + xx)(ic) * conv2.data(((oc * c + ic) * 3 + ky + 1) * 3 + kx + 1)
        }
        acc
      }
    }
    ln2d(c2, "vision_encoder.neck.layer_norm2")
  }

  // ---- naive decoder ---------------------------------------------------

  private def naivePE(W: Map[String, Tensor], nf: Int, xn: Double, yn: Double): Array[Double] = {
    val gm = W("shared_image_embedding.positional_embedding")
    val f = Array.tabulate(nf)(j =>
      2 * math.Pi * ((2 * xn - 1) * gm.data(j) + (2 * yn - 1) * gm.data(nf + j)))
    Array.tabulate(2 * nf)(j => if (j < nf) math.sin(f(j)) else math.cos(f(j - nf)))
  }

  private def naiveAttn(W: Map[String, Tensor], stem: String, heads: Int,
      q: Seq[Array[Double]], k: Seq[Array[Double]], v: Seq[Array[Double]]): Seq[Array[Double]] = {
    val inner = W(stem + ".q_proj.weight").rows
    val dh = inner / heads
    val qp = q.map(lin(W, stem + ".q_proj", _))
    val kp = k.map(lin(W, stem + ".k_proj", _))
    val vp = v.map(lin(W, stem + ".v_proj", _))
    q.indices.map { i =>
      val out = new Array[Double](inner)
      for (hd <- 0 until heads) {
        val off = hd * dh
        val scores = k.indices.map(j =>
          (0 until dh).map(c => qp(i)(off + c) * kp(j)(off + c)).sum / math.sqrt(dh.toDouble))
        val mx = scores.max
        val exps = scores.map(x => math.exp(x - mx)); val z = exps.sum
        for (j <- k.indices; c <- 0 until dh) out(off + c) += exps(j) / z * vp(j)(off + c)
      }
      lin(W, stem + ".out_proj", out)
    }
  }

  private def naiveFF(W: Map[String, Tensor], stem: String, x: Array[Double]): Array[Double] = {
    var cur = lin(W, s"$stem.proj_in", x).map(math.max(0.0, _))
    var i = 0
    while (W.contains(s"$stem.layers.$i.weight")) {
      cur = lin(W, s"$stem.layers.$i", cur).map(math.max(0.0, _))
      i += 1
    }
    lin(W, s"$stem.proj_out", cur)
  }

  private def naiveDecoder(W: Map[String, Tensor], cfg: SamConfig,
      imgEmb: Seq[Array[Double]], sparse: Seq[Array[Double]])
      : (Seq[Seq[Array[Double]]], Array[Double]) = {
    val c = cfg.promptHidden; val g = cfg.grid; val nm = cfg.numMaskTokens
    val nf = cfg.numPosFeats
    val keyPE = (0 until g * g).map(t => naivePE(W, nf, (t % g + 0.5) / g, (t / g + 0.5) / g))
    val dense = W("prompt_encoder.no_mask_embed.weight")
    var keys: Seq[Array[Double]] =
      imgEmb.map(v => Array.tabulate(c)(ch => v(ch) + dense.data(ch)))
    val iouTok = Array.tabulate(c)(ch => W("mask_decoder.iou_token.weight").data(ch).toDouble)
    val maskToks = (0 until nm).map(m =>
      Array.tabulate(c)(ch => W("mask_decoder.mask_tokens.weight").data(m * c + ch).toDouble))
    val tokens = (iouTok +: maskToks) ++ sparse
    val tokenPE = tokens.map(_.clone())
    var queries: Seq[Array[Double]] = tokens
    def add(a: Seq[Array[Double]], b: Seq[Array[Double]]): Seq[Array[Double]] =
      a.zip(b).map { case (u, v) => u.zip(v).map { case (x, y) => x + y } }
    for (li <- 0 until 2) {
      val p = s"mask_decoder.transformer.layers.$li"
      if (li == 0) queries = naiveAttn(W, s"$p.self_attn", cfg.decoderHeads, queries, queries, queries)
      else {
        val q = add(queries, tokenPE)
        queries = add(queries, naiveAttn(W, s"$p.self_attn", cfg.decoderHeads, q, q, queries))
      }
      queries = queries.map(ln(W, s"$p.layer_norm1", _, cfg.lnEps))
      val q2 = add(queries, tokenPE); val k2 = add(keys, keyPE)
      queries = add(queries, naiveAttn(W, s"$p.cross_attn_token_to_image", cfg.decoderHeads, q2, k2, keys))
      queries = queries.map(ln(W, s"$p.layer_norm2", _, cfg.lnEps))
      queries = add(queries, queries.map(x =>
        lin(W, s"$p.mlp.lin2", lin(W, s"$p.mlp.lin1", x).map(math.max(0.0, _)))))
      queries = queries.map(ln(W, s"$p.layer_norm3", _, cfg.lnEps))
      val q4 = add(queries, tokenPE); val k4 = add(keys, keyPE)
      keys = add(keys, naiveAttn(W, s"$p.cross_attn_image_to_token", cfg.decoderHeads, k4, q4, queries))
      keys = keys.map(ln(W, s"$p.layer_norm4", _, cfg.lnEps))
    }
    val qf = add(queries, tokenPE); val kf = add(keys, keyPE)
    queries = add(queries, naiveAttn(W, "mask_decoder.transformer.final_attn_token_to_image",
      cfg.decoderHeads, qf, kf, keys))
    queries = queries.map(ln(W, "mask_decoder.transformer.layer_norm_final_attn", _, cfg.lnEps))
    // upscale keys: convT(2,2) → LN2d → gelu → convT → gelu
    def convT(xs: Seq[Array[Double]], gh: Int, gw: Int, stem: String): (Seq[Array[Double]], Int, Int) = {
      val wt = W(stem + ".weight"); val b = W(stem + ".bias")
      val cin = wt.shape(0); val cout = wt.shape(1)
      val oh = gh * 2; val ow = gw * 2
      val out = Array.fill(oh * ow)(Array.tabulate(cout)(oc => b.data(oc).toDouble))
      for (t <- 0 until gh * gw; ic <- 0 until cin; ky <- 0 until 2; kx <- 0 until 2; oc <- 0 until cout)
        out((t / gw * 2 + ky) * ow + t % gw * 2 + kx)(oc) +=
          xs(t)(ic) * wt.data(((ic * cout + oc) * 2 + ky) * 2 + kx)
      (out.toSeq, oh, ow)
    }
    def ln2d(xs: Seq[Array[Double]], stem: String): Seq[Array[Double]] = {
      val gw2 = W(stem + ".weight"); val bw = W(stem + ".bias")
      xs.map { v =>
        val mean = v.sum / v.length
        val vv = v.map(u => (u - mean) * (u - mean)).sum / v.length
        Array.tabulate(v.length)(k => (v(k) - mean) / math.sqrt(vv + cfg.lnEps) * gw2.data(k) + bw.data(k))
      }
    }
    val (u1, h1, w1) = convT(keys, g, g, "mask_decoder.upscale_conv1")
    val u1n = ln2d(u1, "mask_decoder.upscale_layer_norm").map(_.map(gelu))
    val (u2, h2, w2) = convT(u1n, h1, w1, "mask_decoder.upscale_conv2")
    val u2g = u2.map(_.map(gelu))
    val masks = (0 until nm).map { m =>
      val hyper = naiveFF(W, s"mask_decoder.output_hypernetworks_mlps.$m", queries(1 + m))
      (0 until h2 * w2).map(t =>
        Array(hyper.indices.map(ch => hyper(ch) * u2g(t)(ch)).sum)).toSeq
    }
    val iou = naiveFF(W, "mask_decoder.iou_prediction_head", queries(0))
    (masks, iou)
  }

  // ---- tests -----------------------------------------------------------

  test("vision encoder matches the independent naive implementation") {
    val b = LocalModels.loadSam(samDir)
    val s = b.cfg.imageSize
    val pix = Array.tabulate(3 * s * s)(i => ((i * 41 % 89) / 89.0f) - 0.45f)
    val fast = b.model.visionEncoder(pix)
    val slow = naiveVision(b.weights, b.cfg, pix)
    val c = b.cfg.outputChannels
    for (t <- 0 until b.cfg.grid * b.cfg.grid; ch <- 0 until c)
      assert(math.abs(fast(t * c + ch) - slow(t)(ch)) < 1e-3,
        s"neck t=$t ch=$ch: ${fast(t * c + ch)} vs ${slow(t)(ch)}")
  }

  test("mask decoder matches the independent naive implementation") {
    val b = LocalModels.loadSam(samDir)
    val cfg = b.cfg
    val s = cfg.imageSize
    val pix = Array.tabulate(3 * s * s)(i => ((i * 29 % 83) / 83.0f) - 0.35f)
    val imgEmb = b.model.visionEncoder(pix)
    val sparse = b.model.encodePrompts(Seq((5.0, 7.0, 1)), Seq(Array(2.0, 3.0, 12.0, 13.0)))
    val (fastM, fastIou) = b.model.maskDecoder(imgEmb, sparse)
    val c = cfg.outputChannels
    val imgEmbD = (0 until cfg.grid * cfg.grid).map(t =>
      Array.tabulate(c)(ch => imgEmb(t * c + ch).toDouble))
    val sparseD = sparse.toSeq.map(_.map(_.toDouble))
    val (slowM, slowIou) = naiveDecoder(b.weights, cfg, imgEmbD, sparseD)
    val g4 = cfg.grid * 4
    for (m <- 0 until cfg.numMaskTokens) {
      assert(math.abs(fastIou(m) - slowIou(m)) < 1e-3, s"iou m=$m")
      for (t <- 0 until g4 * g4)
        assert(math.abs(fastM(m * g4 * g4 + t) - slowM(m)(t)(0)) < 1e-2,
          s"mask m=$m t=$t: ${fastM(m * g4 * g4 + t)} vs ${slowM(m)(t)(0)}")
    }
  }

  test("prompt encoding: fourier PE formula, labels, box corners, padding point") {
    val b = LocalModels.loadSam(samDir)
    val W = b.weights
    val nf = b.cfg.numPosFeats
    // PE formula pinned against the naive version
    val pe = b.model.positionalEmbedding(0.3, 0.8)
    val npe = naivePE(W, nf, 0.3, 0.8)
    pe.zip(npe).foreach { case (a, bb) => assert(math.abs(a - bb) < 1e-5) }
    // a single point (no boxes) pads with the not-a-point embedding
    val one = b.model.encodePrompts(Seq((4.0, 4.0, 1)), Seq.empty)
    assert(one.length == 2)
    assert(one(1).zip(W("prompt_encoder.not_a_point_embed.weight").data)
      .forall { case (a, bb) => math.abs(a - bb) < 1e-6 })
    // a box becomes exactly two corner points, no padding
    val box = b.model.encodePrompts(Seq.empty, Seq(Array(1.0, 2.0, 9.0, 11.0)))
    assert(box.length == 2)
    val s = b.cfg.imageSize.toDouble
    val tl = naivePE(W, nf, (1.0 + 0.5) / s, (2.0 + 0.5) / s)
      .zip(W("prompt_encoder.point_embed.2.weight").data).map { case (a, bb) => a + bb }
    box(0).zip(tl).foreach { case (a, bb) => assert(math.abs(a - bb) < 1e-5) }
  }

  test("postProcessMask geometry: upscale, crop, resize round trip") {
    val b = LocalModels.loadSam(samDir)
    val g4 = b.cfg.grid * 4 // == imageSize for the tiny config
    // a logit map positive ONLY in the top-left quadrant
    val lg = Array.tabulate(g4 * g4)(i =>
      if (i / g4 < g4 / 2 && i % g4 < g4 / 2) 5f else -5f)
    // square original: no padding crop, mask upscales cleanly
    val m = b.model.postProcessMask(lg, g4, g4, b.cfg.imageSize, b.cfg.imageSize, 32, 32)
    assert(m.length == 32 && m(0).length == 32)
    assert(m(4)(4) && !m(4)(28) && !m(28)(4) && !m(28)(28))
    // wide original (2:1): the resized content occupies the top half of the
    // padded square; the crop must take rows [0, S/2) before resizing back
    val m2 = b.model.postProcessMask(lg, g4, g4, b.cfg.imageSize / 2, b.cfg.imageSize, 16, 32)
    assert(m2.length == 16 && m2(0).length == 32)
    assert(m2(2)(4) && !m2(2)(24))
  }

  test("segment: multimask instances ranked by iou, boxes bound the masks") {
    val b = LocalModels.loadSam(samDir)
    val img = graft.functions.Images.decode(
      graft.functions.Images.texturedPng(24, 20, 3L))
    val inst = b.model.segment(img, Seq((12.0, 10.0, 1)), Seq.empty)
    assert(inst.length == b.cfg.numMaskTokens - 1) // multimask: tokens 1..3
    assert(inst.map(_.score).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    inst.foreach { in =>
      assert(in.mask.length == 20 && in.mask(0).length == 24)
      val ys = in.mask.indices.filter(y => in.mask(y).exists(identity))
      if (ys.nonEmpty) {
        assert(in.box(1) == ys.min.toFloat && in.box(3) == (ys.max + 1).toFloat)
      } else assert(in.box.forall(_ == 0f))
    }
  }

  test("samSegmentation dataframe surface: partition invariant, null safe") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = (1 to 4).map(i =>
      (i.toLong, graft.functions.Images.texturedPng(20 + i, 18, i * 77L))) :+
      (9L, null.asInstanceOf[Array[Byte]])
    val df = rows.toDF("id", "png")
    def run(parts: Int): Map[Long, String] =
      LocalModels.samSegmentation(df.repartition(parts), "png", "seg", samDir,
        points = Seq((0.5, 0.5, 1)))
        .selectExpr("id", "cast(seg.scores as string) s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null)
    assert(a(1L) != null)
  }
}
