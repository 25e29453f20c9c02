package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** DETR panoptic segmentation: independent naive reimplementation of the
  * mask-head forward (MHAttentionMap joint softmax, GroupNorm, nearest
  * upsample, FPN laterals) in per-position Double math vs the engine's
  * flattened float buffers, plus post_process_panoptic_segmentation
  * semantics and the Spark surface.
  */
class DetrSegSpec extends AnyFunSuite {

  private lazy val segDir: String = LocalModels.ensureTinyDetrSegModel(seed = 42L)

  private type Img = Array[Array[Array[Double]]] // [c][y][x]

  private def naiveConv(x: Img, w: Tensor, b: Tensor, stride: Int, pad: Int): Img = {
    val cout = w.shape(0); val cin = w.shape(1); val kh = w.shape(2); val kw = w.shape(3)
    require(x.length == cin, s"naiveConv cin ${x.length} vs ${cin}")
    val h = x(0).length; val wd = x(0)(0).length
    val oh = (h + 2 * pad - kh) / stride + 1
    val ow = (wd + 2 * pad - kw) / stride + 1
    Array.tabulate(cout, oh, ow) { (oc, oy, ox) =>
      var acc = if (b == null) 0.0 else b.data(oc).toDouble
      for (ic <- 0 until cin; ky <- 0 until kh; kx <- 0 until kw) {
        val iy = oy * stride - pad + ky; val ix = ox * stride - pad + kx
        if (iy >= 0 && iy < h && ix >= 0 && ix < wd)
          acc += x(ic)(iy)(ix) * w.data(((oc * cin + ic) * kh + ky) * kw + kx)
      }
      acc
    }
  }

  private def naiveGroupNorm(x: Img, gamma: Tensor, beta: Tensor, groups: Int): Img = {
    val c = x.length; val per = c / groups
    val out = Array.ofDim[Double](c, x(0).length, x(0)(0).length)
    for (g <- 0 until groups) {
      val vals: Seq[Double] =
        (g * per until (g + 1) * per).flatMap(ch => x(ch).toSeq.flatMap(_.toSeq))
      val mean = vals.sum / vals.length
      val variance = vals.map(v => (v - mean) * (v - mean)).sum / vals.length
      val inv = 1.0 / math.sqrt(variance + 1e-5)
      for (ch <- g * per until (g + 1) * per; y <- x(ch).indices; xx <- x(ch)(y).indices)
        out(ch)(y)(xx) = (x(ch)(y)(xx) - mean) * inv * gamma.data(ch) + beta.data(ch)
    }
    out
  }

  private def naiveRelu(x: Img): Img = x.map(_.map(_.map(math.max(0.0, _))))

  private def naiveNearest(x: Img, oh: Int, ow: Int): Img = {
    val h = x(0).length; val wd = x(0)(0).length
    Array.tabulate(x.length, oh, ow) { (c, oy, ox) =>
      x(c)(math.min(h - 1, oy * h / oh))(math.min(wd - 1, ox * wd / ow))
    }
  }

  /** Naive mask-head forward from the engine's own intermediates (the
    * backbone/transformer are already pinned by DetrSpec; this pins the
    * segmentation-specific math on top of them).
    */
  private def naiveMaskLogits(bundle: LocalModels.DetrBundle, pix: Array[Float],
      h0: Int, w0: Int): (Seq[Img], Int, Int) = {
    val W = bundle.weights
    val cfg = bundle.cfg
    val d = cfg.dModel; val nq = cfg.numQueries; val heads = cfg.numHeads
    val dh = cfg.headDim
    // every input to the mask head (backbone stages, projected tokens,
    // encoder memory, decoder hidden) comes from NaiveDetr's independent
    // Double-math forward — nothing here touches the engine's kernels
    val naive = NaiveDetr.forward(W, cfg, pix, h0, w0)
    val (proj, memory, hid) = (naive.proj, naive.memory, naive.hid)
    val fh = naive.fh; val fw = naive.fw
    def lin(stem: String, x: Array[Double]): Array[Double] = {
      val wt = W(stem + ".weight"); val b = W(stem + ".bias")
      Array.tabulate(wt.rows)(o => x.indices.map(k => x(k) * wt(o, k)).sum + b.data(o))
    }
    // MHAttentionMap: joint softmax over heads × H × W
    val normalize = 1.0 / math.sqrt(dh.toDouble)
    val q = hid.map(lin("bbox_attention.q_linear", _))
    val k = memory.map(lin("bbox_attention.k_linear", _))
    val att: Seq[Array[Double]] = (0 until nq).map { qi =>
      val scores = Array.tabulate(heads * fh * fw) { j =>
        val hd = j / (fh * fw); val t = j % (fh * fw)
        (0 until dh).map(c => q(qi)(hd * dh + c) * normalize * k(t)(hd * dh + c)).sum
      }
      val mx = scores.max
      val exps = scores.map(s => math.exp(s - mx)); val z = exps.sum
      exps.map(_ / z)
    }
    val dim = d + heads
    def gnRelu(x: Img, name: String): Img =
      naiveRelu(naiveGroupNorm(x, W(s"mask_head.$name.weight"),
        W(s"mask_head.$name.bias"), math.min(8, x.length)))
    val fpns = Seq(naive.stages(2), naive.stages(1), naive.stages(0))
    val masks = (0 until nq).map { qi =>
      var x: Img = Array.tabulate(dim, fh, fw) { (c, y, xx) =>
        if (c < d) proj(y * fw + xx)(c)
        else att(qi)((c - d) * fh * fw + y * fw + xx)
      }
      x = gnRelu(naiveConv(x, W("mask_head.lay1.weight"), W("mask_head.lay1.bias"), 1, 1), "gn1")
      x = gnRelu(naiveConv(x, W("mask_head.lay2.weight"), W("mask_head.lay2.bias"), 1, 1), "gn2")
      for (i <- 0 until 3) {
        val lat = fpns(i)
        val lh = lat(0).length; val lw = lat(0)(0).length
        val ad = naiveConv(lat, W(s"mask_head.adapter${i + 1}.weight"),
          W(s"mask_head.adapter${i + 1}.bias"), 1, 0)
        val up = naiveNearest(x, lh, lw)
        val sum = Array.tabulate(ad.length, lh, lw)((c, y, xx) => ad(c)(y)(xx) + up(c)(y)(xx))
        x = gnRelu(naiveConv(sum, W(s"mask_head.lay${i + 3}.weight"),
          W(s"mask_head.lay${i + 3}.bias"), 1, 1), s"gn${i + 3}")
      }
      naiveConv(x, W("mask_head.out_lay.weight"), W("mask_head.out_lay.bias"), 1, 1)
    }
    (masks, naive.stages(0)(0).length, naive.stages(0)(0)(0).length)
  }

  test("mask logits match the independent naive implementation") {
    val bundle = LocalModels.loadDetrSeg(segDir)
    val h = 40; val w = 48 // 4 backbone stages: /4 /4 /8 /16 /32
    val pix = Array.tabulate(3 * h * w)(i => ((i * 53 % 97) / 97.0f) - 0.4f)
    val (_, _, fast, mh, mw) = bundle.model.segment(pix, h, w)
    val (slow, nh, nw) = naiveMaskLogits(bundle, pix, h, w)
    assert(mh == nh && mw == nw, s"mask resolution $mh x $mw vs $nh x $nw")
    for (qi <- 0 until bundle.cfg.numQueries; y <- 0 until mh; x <- 0 until mw)
      assert(math.abs(fast(qi * mh * mw + y * mw + x) - slow(qi)(0)(y)(x)) < 1e-2,
        s"mask q=$qi y=$y x=$x: ${fast(qi * mh * mw + y * mw + x)} vs ${slow(qi)(0)(y)(x)}")
  }

  test("postProcessPanoptic: keep set, argmax painting, validity, stuff fusion") {
    val bundle = LocalModels.loadDetrSeg(segDir)
    val cfg = bundle.cfg
    val nc = cfg.numLabels + 1
    val nq = cfg.numQueries
    // queries 0, 1 confident class 1; query 2 confident class 2;
    // query 3 no-object; rest uniform (score 1/nc < threshold)
    val logits = new Array[Float](nq * nc)
    logits(0 * nc + 1) = 9f
    logits(1 * nc + 1) = 9f
    logits(2 * nc + 2) = 9f
    logits(3 * nc + (nc - 1)) = 9f
    // 2x2 masks: query 0 owns the left column, query 1 the top-right,
    // query 2 the bottom-right (mask logits strongly +/-)
    val mh = 2; val mw = 2
    val masks = Array.fill(nq * mh * mw)(-9f)
    def setM(q: Int, y: Int, x: Int): Unit = masks(q * mh * mw + y * mw + x) = 9f
    setM(0, 0, 0); setM(0, 1, 0); setM(1, 0, 1); setM(2, 1, 1)
    val res = bundle.model.postProcessPanoptic(logits, masks, mh, mw,
      targetH = 2, targetW = 2, threshold = 0.5f, maskThreshold = 0.5f,
      overlapThreshold = 0.8f)
    // without fusion: three segments with distinct ids 1, 2, 3
    assert(res.segments.map(_.id) == Seq(1, 2, 3))
    assert(res.segments.map(_.labelId) == Seq(1, 1, 2))
    assert(res.segments.forall(!_.wasFused))
    assert(res.segmentation.map(_.toSeq).toSeq == Seq(Seq(1, 2), Seq(1, 3)))
    // with class 1 fused: queries 0 and 1 share one id
    val fused = bundle.model.postProcessPanoptic(logits, masks, mh, mw,
      2, 2, 0.5f, 0.5f, 0.8f, labelIdsToFuse = Set(1))
    assert(fused.segments.map(_.id) == Seq(1, 1, 2))
    assert(fused.segments.map(_.wasFused) == Seq(true, true, false))
    assert(fused.segmentation.map(_.toSeq).toSeq == Seq(Seq(1, 1), Seq(1, 2)))
    // empty keep set: -1-filled map, no segments
    val none = bundle.model.postProcessPanoptic(new Array[Float](nq * nc),
      masks, mh, mw, 2, 2, 0.9f, 0.5f, 0.8f)
    assert(none.segments.isEmpty)
    assert(none.segmentation.flatten.forall(_ == -1))
  }

  test("overlap validity: a query argmax-starved below the area ratio is dropped") {
    val bundle = LocalModels.loadDetrSeg(segDir)
    val cfg = bundle.cfg
    val nc = cfg.numLabels + 1
    val logits = new Array[Float](cfg.numQueries * nc)
    logits(0 * nc + 1) = 9f
    logits(1 * nc + 2) = 20f // higher score: wins every argmax tie-free pixel
    val mh = 2; val mw = 2
    val masks = Array.fill(cfg.numQueries * mh * mw)(-9f)
    // both queries claim the full 2x2 frame; query 1's higher class score
    // weights its probs above query 0's everywhere, so query 0 claims 0
    // of its 4 above-threshold pixels → area ratio 0 < 0.8 → dropped
    for (y <- 0 until 2; x <- 0 until 2) {
      masks(0 * mh * mw + y * mw + x) = 9f
      masks(1 * mh * mw + y * mw + x) = 9f
    }
    val res = bundle.model.postProcessPanoptic(logits, masks, mh, mw, 2, 2,
      0.5f, 0.5f, 0.8f)
    assert(res.segments.map(_.labelId) == Seq(2))
    assert(res.segmentation.flatten.forall(_ == 1))
  }

  test("panopticSegmentation dataframe surface: partition invariant, null safe") {
    val spark = graft.TestSpark.spark
    val rows = (1 to 4).map(i =>
      (i.toLong, graft.functions.Images.solidPng(40, 36, i * 456789 % 0xffffff))) :+
      (9L, null.asInstanceOf[Array[Byte]])
    import spark.implicits._
    val df = rows.toDF("id", "png")
    def run(parts: Int): Map[Long, String] =
      LocalModels.panopticSegmentation(df.repartition(parts), "png", "seg", segDir,
        threshold = 0.1f, shortestEdge = 32, maxSize = 64)
        .selectExpr("id", "cast(seg as string) s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null)
    assert(a(1L) != null)
  }
}
