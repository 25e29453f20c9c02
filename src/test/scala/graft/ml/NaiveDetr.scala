package graft.ml

/** Independent naive DETR forward (per-position Double math, no shared
  * kernels with the engine) exposing the intermediates the segmentation
  * head consumes: naive backbone stages, projected tokens, encoder
  * memory, decoder hidden. DetrSpec pins logits/boxes with its own copy
  * of this math; DetrSegSpec builds the mask-head cross-check on top of
  * these intermediates.
  */
object NaiveDetr {

  type Img = Array[Array[Array[Double]]] // [c][y][x]

  final case class Intermediates(stages: Seq[Img], proj: Seq[Array[Double]],
      memory: Seq[Array[Double]], hid: Seq[Array[Double]], fh: Int, fw: Int)

  private def conv(x: Img, w: Tensor, b: Option[Tensor], stride: Int, pad: Int): Img = {
    val cout = w.shape(0); val cin = w.shape(1); val kh = w.shape(2); val kw = w.shape(3)
    require(x.length == cin)
    val h = x(0).length; val wd = x(0)(0).length
    val oh = (h + 2 * pad - kh) / stride + 1
    val ow = (wd + 2 * pad - kw) / stride + 1
    Array.tabulate(cout, oh, ow) { (oc, oy, ox) =>
      var acc = b.map(_.data(oc).toDouble).getOrElse(0.0)
      for (ic <- 0 until cin; ky <- 0 until kh; kx <- 0 until kw) {
        val iy = oy * stride - pad + ky; val ix = ox * stride - pad + kx
        if (iy >= 0 && iy < h && ix >= 0 && ix < wd)
          acc += x(ic)(iy)(ix) * w.data(((oc * cin + ic) * kh + ky) * kw + kx)
      }
      acc
    }
  }

  def forward(W: Map[String, Tensor], cfg: DetrConfig, pix: Array[Float],
      h0: Int, w0: Int): Intermediates = {
    val BB = "model.backbone.conv_encoder.model."
    def bn(x: Img, stem: String): Img =
      Array.tabulate(x.length, x(0).length, x(0)(0).length) { (c, y, xx) =>
        (x(c)(y)(xx) - W(s"$stem.running_mean").data(c)) /
          math.sqrt(W(s"$stem.running_var").data(c).toDouble + cfg.bnEps) *
          W(s"$stem.weight").data(c) + W(s"$stem.bias").data(c)
      }
    def relu(x: Img): Img = x.map(_.map(_.map(math.max(0.0, _))))
    def maxPool(x: Img, k: Int, stride: Int, pad: Int): Img = {
      val h = x(0).length; val wd = x(0)(0).length
      val oh = (h + 2 * pad - k) / stride + 1; val ow = (wd + 2 * pad - k) / stride + 1
      Array.tabulate(x.length, oh, ow) { (c, oy, ox) =>
        (for {
          ky <- 0 until k; kx <- 0 until k
          iy = oy * stride - pad + ky; ix = ox * stride - pad + kx
          if iy >= 0 && iy < h && ix >= 0 && ix < wd
        } yield x(c)(iy)(ix)).max
      }
    }
    def convBn(x: Img, stem: String, stride: Int, pad: Int, doRelu: Boolean): Img = {
      val y = bn(conv(x, W(stem + "convolution.weight"), None, stride, pad),
        stem + "normalization")
      if (doRelu) relu(y) else y
    }
    var img: Img = Array.tabulate(3, h0, w0)((c, y, x) => pix((c * h0 + y) * w0 + x).toDouble)
    img = maxPool(convBn(img, BB + "embedder.embedder.", 2, 3, doRelu = true), 3, 2, 1)
    val stages = Seq.newBuilder[Img]
    for (s <- cfg.backbone.depths.indices) {
      for (l <- 0 until cfg.backbone.depths(s)) {
        val p = BB + s"encoder.stages.$s.layers.$l."
        val stride = if (l == 0 && s > 0) 2 else 1
        val sc = if (W.contains(p + "shortcut.convolution.weight"))
          convBn(img, p + "shortcut.", stride, 0, doRelu = false) else img
        val y = convBn(convBn(convBn(img, p + "layer.0.", 1, 0, doRelu = true),
          p + "layer.1.", stride, 1, doRelu = true), p + "layer.2.", 1, 0, doRelu = false)
        img = relu(Array.tabulate(y.length, y(0).length, y(0)(0).length)(
          (c, yy, xx) => y(c)(yy)(xx) + sc(c)(yy)(xx)))
      }
      stages += img
    }
    val projImg = conv(img, W("model.input_projection.weight"),
      Some(W("model.input_projection.bias")), 1, 0)
    val fh = projImg(0).length; val fw = projImg(0)(0).length
    val d = cfg.dModel
    val proj: Seq[Array[Double]] =
      (0 until fh * fw).map(t => Array.tabulate(d)(c => projImg(c)(t / fw)(t % fw)))
    val half = d / 2
    val dimT = Array.tabulate(half)(i => math.pow(10000.0, 2.0 * (i / 2) / half))
    val pos: Seq[Array[Double]] = (0 until fh * fw).map { t =>
      val yE = (t / fw + 1).toDouble / (fh + 1e-6) * 2 * math.Pi
      val xE = (t % fw + 1).toDouble / (fw + 1e-6) * 2 * math.Pi
      Array.tabulate(d) { kk =>
        val (e, j) = if (kk < half) (yE, kk) else (xE, kk - half)
        if (j % 2 == 0) math.sin(e / dimT(j)) else math.cos(e / dimT(j))
      }
    }
    def lin(stem: String, x: Array[Double]): Array[Double] = {
      val wt = W(stem + ".weight"); val b = W(stem + ".bias")
      Array.tabulate(wt.rows)(o => x.indices.map(k => x(k) * wt(o, k)).sum + b.data(o))
    }
    def ln(stem: String, x: Array[Double]): Array[Double] = {
      val g = W(stem + ".weight"); val b = W(stem + ".bias")
      val mean = x.sum / x.length
      val v = x.map(u => (u - mean) * (u - mean)).sum / x.length
      Array.tabulate(x.length)(k =>
        (x(k) - mean) / math.sqrt(v + cfg.layerNormEps) * g.data(k) + b.data(k))
    }
    def add(a: Array[Double], b: Array[Double]): Array[Double] =
      a.zip(b).map { case (u, v) => u + v }
    def attn(stem: String, qIn: Seq[Array[Double]], qPos: Seq[Array[Double]],
        kIn: Seq[Array[Double]], kPos: Seq[Array[Double]]): Seq[Array[Double]] = {
      val dh = cfg.headDim
      val q = qIn.zip(qPos).map { case (a, p) => lin(stem + "q_proj", add(a, p)) }
      val k = kIn.zip(kPos).map { case (a, p) => lin(stem + "k_proj", add(a, p)) }
      val v = kIn.map(lin(stem + "v_proj", _))
      qIn.indices.map { i =>
        val out = new Array[Double](d)
        for (hd <- 0 until cfg.numHeads) {
          val off = hd * dh
          val scores = kIn.indices.map(j =>
            (0 until dh).map(dd => q(i)(off + dd) * k(j)(off + dd)).sum / math.sqrt(dh.toDouble))
          val mx = scores.max
          val exps = scores.map(s => math.exp(s - mx)); val z = exps.sum
          for (j <- kIn.indices; dd <- 0 until dh)
            out(off + dd) += exps(j) / z * v(j)(off + dd)
        }
        lin(stem + "out_proj", out)
      }
    }
    def ffn(p: String, x: Array[Double]): Array[Double] =
      lin(p + "fc2", lin(p + "fc1", x).map(math.max(0.0, _)))
    var src = proj
    for (li <- 0 until cfg.encoderLayers) {
      val p = s"model.encoder.layers.$li."
      src = src.zip(attn(p + "self_attn.", src, pos, src, pos))
        .map { case (a, b) => ln(p + "self_attn_layer_norm", add(a, b)) }
      src = src.map(x => ln(p + "final_layer_norm", add(x, ffn(p, x))))
    }
    val qPos = (0 until cfg.numQueries).map(i =>
      Array.tabulate(d)(k => W("model.query_position_embeddings.weight")(i, k).toDouble))
    var hid: Seq[Array[Double]] = Seq.fill(cfg.numQueries)(new Array[Double](d))
    for (li <- 0 until cfg.decoderLayers) {
      val p = s"model.decoder.layers.$li."
      hid = hid.zip(attn(p + "self_attn.", hid, qPos, hid, qPos))
        .map { case (a, b) => ln(p + "self_attn_layer_norm", add(a, b)) }
      hid = hid.zip(attn(p + "encoder_attn.", hid, qPos, src, pos))
        .map { case (a, b) => ln(p + "encoder_attn_layer_norm", add(a, b)) }
      hid = hid.map(x => ln(p + "final_layer_norm", add(x, ffn(p, x))))
    }
    hid = hid.map(ln("model.decoder.layernorm", _))
    Intermediates(stages.result(), proj, src, hid, fh, fw)
  }
}
