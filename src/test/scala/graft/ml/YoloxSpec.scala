package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** YOLOX: independent naive reimplementation of the whole forward (Focus
  * space-to-depth, CSP/SPP backbone, PAFPN, decoupled head) in
  * per-position Double math vs the engine's flattened float buffers,
  * plus decode/NMS semantics and the Spark surface.
  */
class YoloxSpec extends AnyFunSuite {

  private lazy val yoloxDir: String = LocalModels.ensureTinyYoloxModel(seed = 42L)

  private type Img = Array[Array[Array[Double]]] // [c][y][x]

  private def conv(x: Img, w: Tensor, b: Option[Tensor], stride: Int, pad: Int): Img = {
    val cout = w.shape(0); val cin = w.shape(1); val k = w.shape(2)
    require(x.length == cin, s"conv cin ${x.length} != $cin")
    val h = x(0).length; val wd = x(0)(0).length
    val oh = (h + 2 * pad - k) / stride + 1
    val ow = (wd + 2 * pad - k) / stride + 1
    Array.tabulate(cout, oh, ow) { (oc, oy, ox) =>
      var acc = b.map(_.data(oc).toDouble).getOrElse(0.0)
      for (ic <- 0 until cin; ky <- 0 until k; kx <- 0 until k) {
        val iy = oy * stride - pad + ky; val ix = ox * stride - pad + kx
        if (iy >= 0 && iy < h && ix >= 0 && ix < wd)
          acc += x(ic)(iy)(ix) * w.data(((oc * cin + ic) * k + ky) * k + kx)
      }
      acc
    }
  }

  private def naive(W: Map[String, Tensor], cfg: YoloxConfig, pix: Array[Float],
      h0: Int, w0: Int): Seq[Img] = {
    def silu(x: Img): Img = x.map(_.map(_.map(v => v / (1.0 + math.exp(-v)))))
    def bn(x: Img, stem: String): Img =
      Array.tabulate(x.length, x(0).length, x(0)(0).length) { (c, y, xx) =>
        (x(c)(y)(xx) - W(s"$stem.running_mean").data(c)) /
          math.sqrt(W(s"$stem.running_var").data(c).toDouble + cfg.bnEps) *
          W(s"$stem.weight").data(c) + W(s"$stem.bias").data(c)
      }
    def bconv(x: Img, stem: String, stride: Int): Img = {
      val wt = W(s"$stem.conv.weight")
      silu(bn(conv(x, wt, None, stride, (wt.shape(2) - 1) / 2), s"$stem.bn"))
    }
    def cat(a: Img, b: Img): Img = a ++ b
    def csp(x: Img, stem: String, n: Int, shortcut: Boolean): Img = {
      var a = bconv(x, s"$stem.conv1", 1)
      val b = bconv(x, s"$stem.conv2", 1)
      for (i <- 0 until n) {
        val m = bconv(bconv(a, s"$stem.m.$i.conv1", 1), s"$stem.m.$i.conv2", 1)
        a = if (shortcut)
          Array.tabulate(m.length, m(0).length, m(0)(0).length)((c, y, xx) =>
            m(c)(y)(xx) + a(c)(y)(xx))
        else m
      }
      bconv(cat(a, b), s"$stem.conv3", 1)
    }
    def maxPool(x: Img, k: Int): Img = {
      val h = x(0).length; val wd = x(0)(0).length
      Array.tabulate(x.length, h, wd) { (c, oy, ox) =>
        (for {
          ky <- 0 until k; kx <- 0 until k
          iy = oy - k / 2 + ky; ix = ox - k / 2 + kx
          if iy >= 0 && iy < h && ix >= 0 && ix < wd
        } yield x(c)(iy)(ix)).max
      }
    }
    def spp(x: Img, stem: String): Img = {
      val a = bconv(x, s"$stem.conv1", 1)
      bconv(cat(cat(cat(a, maxPool(a, 5)), maxPool(a, 9)), maxPool(a, 13)),
        s"$stem.conv2", 1)
    }
    def upsample(x: Img, oh: Int, ow: Int): Img = {
      val h = x(0).length; val wd = x(0)(0).length
      Array.tabulate(x.length, oh, ow)((c, y, xx) =>
        x(c)(math.min(h - 1, y * h / oh))(math.min(wd - 1, xx * wd / ow)))
    }
    val B = "backbone.backbone"
    // Focus: [tl, bl, tr, br] blocks of 3 channels
    val img: Img = Array.tabulate(3, h0, w0)((c, y, x) => pix((c * h0 + y) * w0 + x).toDouble)
    val foc: Img = Array.tabulate(12, h0 / 2, w0 / 2) { (c, y, x) =>
      val src = c % 3; val block = c / 3
      val (dy, dx) = block match {
        case 0 => (0, 0); case 1 => (1, 0); case 2 => (0, 1); case _ => (1, 1)
      }
      img(src)(2 * y + dy)(2 * x + dx)
    }
    var x = bconv(foc, s"$B.stem.conv", 1)
    x = csp(bconv(x, s"$B.dark2.0", 2), s"$B.dark2.1", 1, shortcut = true)
    val d3 = csp(bconv(x, s"$B.dark3.0", 2), s"$B.dark3.1", 3, shortcut = true)
    val d4 = csp(bconv(d3, s"$B.dark4.0", 2), s"$B.dark4.1", 3, shortcut = true)
    val d5 = csp(spp(bconv(d4, s"$B.dark5.0", 2), s"$B.dark5.1"), s"$B.dark5.2", 1,
      shortcut = false)
    val P = "backbone"
    val f0 = bconv(d5, s"$P.lateral_conv0", 1)
    val p4 = csp(cat(upsample(f0, d4(0).length, d4(0)(0).length), d4), s"$P.C3_p4", 1, shortcut = false)
    val f1 = bconv(p4, s"$P.reduce_conv1", 1)
    val p3out = csp(cat(upsample(f1, d3(0).length, d3(0)(0).length), d3), s"$P.C3_p3", 1, shortcut = false)
    val p4out = csp(cat(bconv(p3out, s"$P.bu_conv2", 2), f1), s"$P.C3_n3", 1, shortcut = false)
    val p5out = csp(cat(bconv(p4out, s"$P.bu_conv1", 2), f0), s"$P.C3_n4", 1, shortcut = false)
    Seq(p3out, p4out, p5out).zipWithIndex.map { case (feat, l) =>
      val stem = bconv(feat, s"head.stems.$l", 1)
      val cls = bconv(bconv(stem, s"head.cls_convs.$l.0", 1), s"head.cls_convs.$l.1", 1)
      val reg = bconv(bconv(stem, s"head.reg_convs.$l.0", 1), s"head.reg_convs.$l.1", 1)
      val clsO = conv(cls, W(s"head.cls_preds.$l.weight"), Some(W(s"head.cls_preds.$l.bias")), 1, 0)
      val regO = conv(reg, W(s"head.reg_preds.$l.weight"), Some(W(s"head.reg_preds.$l.bias")), 1, 0)
      val objO = conv(reg, W(s"head.obj_preds.$l.weight"), Some(W(s"head.obj_preds.$l.bias")), 1, 0)
      regO ++ objO ++ clsO
    }
  }

  test("raw head outputs match the independent naive implementation") {
    val b = LocalModels.loadYolox(yoloxDir)
    val h = 64; val wd = 64
    val pix = Array.tabulate(3 * h * wd)(i => ((i * 31 % 251).toFloat)) // 0-255-ish
    // engine: decode with threshold 0 keeps every (cell, class) candidate;
    // reconstruct raw (reg, obj, cls) values is awkward post-sigmoid, so
    // compare the decoded candidate set against a naive decode instead
    val dets = b.model.detect(pix, h, wd, threshold = 0.0f, nmsIou = 2.0f)
    val naiveLevels = naive(b.weights, b.cfg, pix, h, wd)
    val naiveDets = Seq.newBuilder[(Double, Int, Double, Double)]
    naiveLevels.zipWithIndex.foreach { case (out, li) =>
      val s = b.cfg.strides(li)
      val nc = b.cfg.numClasses
      val hh = out(0).length; val ww = out(0)(0).length
      for (y <- 0 until hh; x <- 0 until ww; c <- 0 until nc) {
        val obj = 1.0 / (1.0 + math.exp(-out(4)(y)(x)))
        val cl = 1.0 / (1.0 + math.exp(-out(5 + c)(y)(x)))
        val cx = (out(0)(y)(x) + x) * s
        val cy = (out(1)(y)(x) + y) * s
        naiveDets += ((obj * cl, c, cx, cy))
      }
    }
    val nv = naiveDets.result().sortBy(d => (-d._1, d._2, d._3))
    val fast = dets.map(d => (d.score.toDouble, d.label,
      (d.box(0) + d.box(2)) / 2.0, (d.box(1) + d.box(3)) / 2.0))
      .sortBy(d => (-d._1, d._2, d._3))
    assert(fast.length == nv.length, s"${fast.length} vs ${nv.length} candidates")
    fast.zip(nv).foreach { case ((fs, fl, fx, fy), (ns, nl, nx, ny)) =>
      assert(math.abs(fs - ns) < 1e-3, s"score $fs vs $ns")
      assert(fl == nl)
      assert(math.abs(fx - nx) < 0.05 && math.abs(fy - ny) < 0.05)
    }
  }

  test("nms drops same-class overlaps but keeps cross-class ones") {
    val b = LocalModels.loadYolox(yoloxDir)
    val h = 64
    val pix = Array.tabulate(3 * h * h)(i => ((i * 13 % 200).toFloat))
    val all = b.model.detect(pix, h, h, threshold = 0.0f, nmsIou = 2.0f)
    val pruned = b.model.detect(pix, h, h, threshold = 0.0f, nmsIou = 0.45f)
    assert(pruned.length <= all.length)
    // at IoU 0 any same-class overlap suppresses: the random model's
    // stride-sized neighbor boxes do overlap slightly, so this must prune
    val zero = b.model.detect(pix, h, h, threshold = 0.0f, nmsIou = 0.0f)
    assert(zero.length < all.length)
    // within a class, every surviving pair has IoU <= 0.45
    def iou(a: Array[Float], bb: Array[Float]): Float = {
      val ix = math.max(0f, math.min(a(2), bb(2)) - math.max(a(0), bb(0)))
      val iy = math.max(0f, math.min(a(3), bb(3)) - math.max(a(1), bb(1)))
      val inter = ix * iy
      val ua = (a(2) - a(0)) * (a(3) - a(1)) + (bb(2) - bb(0)) * (bb(3) - bb(1)) - inter
      if (ua <= 0f) 0f else inter / ua
    }
    pruned.groupBy(_.label).values.foreach { ds =>
      for (i <- ds.indices; j <- i + 1 until ds.length)
        assert(iou(ds(i).box, ds(j).box) <= 0.45f + 1e-6f)
    }
  }

  test("preprocess: BGR order, 114 padding, aspect-preserving ratio") {
    val b = LocalModels.loadYolox(yoloxDir)
    val img = new java.awt.image.BufferedImage(32, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(10, 20, 200)) // r=10 g=20 b=200
    g.fillRect(0, 0, 32, 16); g.dispose()
    val (pix, ratio) = b.model.preprocess(img, 64)
    assert(math.abs(ratio - 2.0f) < 1e-6) // 32→64 wide, 16→32 tall
    // BGR: channel 0 = blue = 200
    assert(math.abs(pix(0) - 200f) < 1e-3)
    assert(math.abs(pix(64 * 64) - 20f) < 1e-3)
    assert(math.abs(pix(2 * 64 * 64) - 10f) < 1e-3)
    // padded rows (below 32) are 114 gray in all channels
    assert(pix(40 * 64 + 5) == 114f && pix(64 * 64 + 40 * 64 + 5) == 114f)
  }

  test("yoloxDetection dataframe surface + yoloToCoco: partition invariant, null safe") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = (1 to 3).map(i =>
      (i.toLong, graft.functions.Images.texturedPng(40, 30, i * 55L))) :+
      (9L, null.asInstanceOf[Array[Byte]])
    val df = rows.toDF("id", "png")
    def run(parts: Int): Map[Long, String] =
      LocalModels.yoloxDetection(df.repartition(parts), "png", "det", yoloxDir,
        threshold = 0.3f)
        .selectExpr("id", "cast(det as string) s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1); val b2 = run(3)
    assert(a == b2)
    assert(a(9L) == null && a(1L) != null)
    val coco = LocalModels.yoloxDetection(df.filter("id = 1"), "png", "det", yoloxDir,
      threshold = 0.3f)
      .withColumn("coco", LocalModels.yoloToCoco("det"))
      .selectExpr("size(det.scores) n", "size(coco) nc",
        "coco[0].bbox[2] w0", "det.bboxes[0][2] x2", "det.bboxes[0][0] x1")
      .collect()(0)
    assert(coco.getInt(0) == coco.getInt(1)) // every detection converted
    if (coco.getInt(0) > 0)
      assert(coco.getInt(2) == math.round(coco.getFloat(3) - coco.getFloat(4)))
  }
}
