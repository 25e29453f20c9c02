package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** DETR: independent naive reimplementation of the full forward (conv
  * backbone, sine positions, encoder/decoder, heads) in per-position
  * Double math vs the engine's flattened float buffers, plus
  * post-process semantics and the Spark surface.
  */
class DetrSpec extends AnyFunSuite {

  private lazy val detrDir: String = LocalModels.ensureTinyDetrModel(seed = 42L)

  // ---- independent naive forward -----------------------------------

  private type Img = Array[Array[Array[Double]]] // [c][y][x]

  private def naiveConv(x: Img, w: Tensor, b: Option[Tensor], stride: Int, pad: Int): Img = {
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

  private def naiveBn(x: Img, W: Map[String, Tensor], stem: String, eps: Double): Img =
    Array.tabulate(x.length, x(0).length, x(0)(0).length) { (c, y, xx) =>
      (x(c)(y)(xx) - W(s"$stem.running_mean").data(c)) /
        math.sqrt(W(s"$stem.running_var").data(c).toDouble + eps) *
        W(s"$stem.weight").data(c) + W(s"$stem.bias").data(c)
    }

  private def naiveRelu(x: Img): Img = x.map(_.map(_.map(math.max(0.0, _))))

  private def naiveMaxPool(x: Img, k: Int, stride: Int, pad: Int): Img = {
    val h = x(0).length; val wd = x(0)(0).length
    val oh = (h + 2 * pad - k) / stride + 1; val ow = (wd + 2 * pad - k) / stride + 1
    Array.tabulate(x.length, oh, ow) { (c, oy, ox) =>
      val vals = for {
        ky <- 0 until k; kx <- 0 until k
        iy = oy * stride - pad + ky; ix = ox * stride - pad + kx
        if iy >= 0 && iy < h && ix >= 0 && ix < wd
      } yield x(c)(iy)(ix)
      vals.max
    }
  }

  private def naiveForward(bundle: LocalModels.DetrBundle, pix: Array[Float],
      h0: Int, w0: Int): (Seq[Array[Double]], Seq[Array[Double]]) = {
    val W = bundle.weights
    val cfg = bundle.cfg
    val BB = "model.backbone.conv_encoder.model."
    def convBn(x: Img, stem: String, stride: Int, pad: Int, relu: Boolean): Img = {
      val y = naiveBn(naiveConv(x, W(stem + "convolution.weight"), None, stride, pad),
        W, stem + "normalization", cfg.bnEps)
      if (relu) naiveRelu(y) else y
    }
    var img: Img = Array.tabulate(3, h0, w0)((c, y, x) => pix((c * h0 + y) * w0 + x).toDouble)
    img = naiveMaxPool(convBn(img, BB + "embedder.embedder.", 2, 3, relu = true), 3, 2, 1)
    for (s <- cfg.backbone.depths.indices; l <- 0 until cfg.backbone.depths(s)) {
      val p = BB + s"encoder.stages.$s.layers.$l."
      val stride = if (l == 0 && s > 0) 2 else 1
      val sc = if (W.contains(p + "shortcut.convolution.weight"))
        convBn(img, p + "shortcut.", stride, 0, relu = false) else img
      val y = convBn(convBn(convBn(img, p + "layer.0.", 1, 0, relu = true),
        p + "layer.1.", stride, 1, relu = true), p + "layer.2.", 1, 0, relu = false)
      img = naiveRelu(Array.tabulate(y.length, y(0).length, y(0)(0).length)(
        (c, yy, xx) => y(c)(yy)(xx) + sc(c)(yy)(xx)))
    }
    val proj = naiveConv(img, W("model.input_projection.weight"),
      Some(W("model.input_projection.bias")), 1, 0)
    val fh = proj(0).length; val fw = proj(0)(0).length
    val d = cfg.dModel
    var src: Seq[Array[Double]] =
      (0 until fh * fw).map(t => Array.tabulate(d)(c => proj(c)(t / fw)(t % fw)))
    // sine positions
    val half = d / 2
    val dimT = Array.tabulate(half)(i => math.pow(10000.0, 2.0 * (i / 2) / half))
    val pos: Seq[Array[Double]] = (0 until fh * fw).map { t =>
      val yE = (t / fw + 1).toDouble / (fh + 1e-6) * 2 * math.Pi
      val xE = (t % fw + 1).toDouble / (fw + 1e-6) * 2 * math.Pi
      Array.tabulate(d) { k =>
        val (e, j) = if (k < half) (yE, k) else (xE, k - half)
        if (j % 2 == 0) math.sin(e / dimT(j)) else math.cos(e / dimT(j))
      }
    }
    def lin(stem: String, x: Array[Double]): Array[Double] = {
      val wt = W(stem + ".weight"); val b = W(stem + ".bias")
      Array.tabulate(wt.rows)(o =>
        x.indices.map(k => x(k) * wt(o, k)).sum + b.data(o))
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
    val logits = hid.map(lin("class_labels_classifier", _))
    val boxes = hid.map { x =>
      val b1 = lin("bbox_predictor.layers.0", x).map(math.max(0.0, _))
      val b2 = lin("bbox_predictor.layers.1", b1).map(math.max(0.0, _))
      lin("bbox_predictor.layers.2", b2).map(v => 1.0 / (1.0 + math.exp(-v)))
    }
    (logits, boxes)
  }

  test("full forward matches the independent naive implementation") {
    val bundle = LocalModels.loadDetr(detrDir)
    val h = 24; val w = 32 // deliberately non-square, not a multiple of 32
    val pix = Array.tabulate(3 * h * w)(i => ((i * 37 % 101) / 101.0f) - 0.3f)
    val (fastL, fastB) = bundle.model.detect(pix, h, w)
    val (slowL, slowB) = naiveForward(bundle, pix, h, w)
    val nc = bundle.cfg.numLabels + 1
    assert(fastL.length == bundle.cfg.numQueries * nc)
    for (q <- 0 until bundle.cfg.numQueries) {
      for (c <- 0 until nc)
        assert(math.abs(fastL(q * nc + c) - slowL(q)(c)) < 1e-3,
          s"logit q=$q c=$c: ${fastL(q * nc + c)} vs ${slowL(q)(c)}")
      for (b <- 0 until 4)
        assert(math.abs(fastB(q * 4 + b) - slowB(q)(b)) < 1e-4,
          s"box q=$q b=$b: ${fastB(q * 4 + b)} vs ${slowB(q)(b)}")
    }
  }

  test("postProcess: threshold gates, no-object class excluded, corner boxes scaled") {
    val bundle = LocalModels.loadDetr(detrDir)
    val cfg = bundle.cfg
    val nc = cfg.numLabels + 1
    // hand-built logits: query 0 strongly class 1; query 1 strongly no-object;
    // others uniform (score 1/nc, below any reasonable threshold)
    val logits = new Array[Float](cfg.numQueries * nc)
    logits(0 * nc + 1) = 8f
    logits(1 * nc + (nc - 1)) = 8f
    val boxes = new Array[Float](cfg.numQueries * 4)
    boxes(0) = 0.5f; boxes(1) = 0.5f; boxes(2) = 0.2f; boxes(3) = 0.4f
    val dets = bundle.model.postProcess(logits, boxes, 0.5f, targetW = 100, targetH = 50)
    assert(dets.length == 1) // query 1's winner is the no-object column → dropped
    assert(dets.head.label == 1 && dets.head.labelText == "OBJ_1")
    assert(dets.head.box.zip(Array(40f, 15f, 60f, 35f)).forall { case (a, b) => math.abs(a - b) < 1e-3 })
    // threshold 0 keeps every query (real-class softmax mass is always > 0,
    // the HF semantics); the no-object query survives with a tiny score
    val all = bundle.model.postProcess(logits, boxes, 0f, 100, 50)
    assert(all.length == cfg.numQueries)
    assert(all(1).score < 1e-3)
  }

  test("preprocess: shortest-edge resize with max cap, ImageNet normalization") {
    val bundle = LocalModels.loadDetr(detrDir)
    val img = new java.awt.image.BufferedImage(60, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 60, 30); g.dispose()
    val (pix, h, w) = bundle.model.preprocess(img, shortestEdge = 20, maxSize = 1333)
    assert(h == 20 && w == 40) // aspect preserved
    // white = (1 - mean) / std per channel
    assert(math.abs(pix(0) - (1 - 0.485) / 0.229) < 1e-4)
    assert(math.abs(pix(h * w) - (1 - 0.456) / 0.224) < 1e-4)
    assert(math.abs(pix(2 * h * w) - (1 - 0.406) / 0.225) < 1e-4)
    val (_, h2, w2) = bundle.model.preprocess(img, shortestEdge = 20, maxSize = 30)
    assert(w2 == 30 && h2 == 15) // longest-edge cap engages
  }

  test("objectDetection dataframe surface: partition invariant, null safe") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = (1 to 4).map(i =>
      (i.toLong, graft.functions.Images.solidPng(40, 32, i * 987654 % 0xffffff))) :+
      (9L, null.asInstanceOf[Array[Byte]])
    val df = rows.toDF("id", "png")
    def run(parts: Int): Map[Long, String] =
      LocalModels.objectDetection(df.repartition(parts), "png", "det", detrDir,
        threshold = 0.1f, shortestEdge = 24, maxSize = 48)
        .selectExpr("id", "cast(det as string) s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b = run(3)
    assert(a == b)
    assert(a(9L) == null)
  }
}
