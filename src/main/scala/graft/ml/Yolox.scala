package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import java.awt.image.BufferedImage

/** YOLOX anchor-free object detection (Ge et al. 2021, "YOLOX: Exceeding
  * YOLO Series in 2021") — the reference's `yolox` UDF family
  * (`/root/reference/pixeltable/functions/yolox.py:25`, the
  * pixeltable-yolox package). Architecture and module names follow the
  * public Megvii-BaseDetection/YOLOX layout:
  *
  *  - CSPDarknet backbone: Focus stem (2×2 space-to-depth + conv),
  *    Conv-BN-SiLU everywhere (BN eps 1e-3), dark2-5 stages of
  *    stride-2 conv + CSPLayer (split conv1/conv2, residual bottleneck
  *    chain, concat + conv3; dark5 adds SPP with 5/9/13 max-pools and
  *    drops the residual shortcut);
  *  - PAFPN neck: top-down FPN (lateral 1×1, nearest 2× upsample,
  *    concat, shortcut-free CSP) then bottom-up PAN (stride-2 conv,
  *    concat, CSP), yielding P3/P4/P5 at strides 8/16/32;
  *  - decoupled head per level: 1×1 stem, two 3×3 conv pairs for the
  *    cls and reg branches, 1×1 predictors (cls → classes, reg → 4,
  *    obj → 1);
  *  - anchor-free decode: center = (pred + grid)·stride,
  *    size = exp(pred)·stride, score = σ(obj)·σ(cls); score threshold,
  *    then per-class greedy NMS (IoU 0.45).
  */
final case class YoloxConfig(
    numClasses: Int, stemWidth: Int, depth: Int,
    bnEps: Double = 1e-3,
) extends Serializable {
  // stage widths: stem w, dark2 2w, dark3 4w, dark4 8w, dark5 16w
  def c2: Int = stemWidth * 2
  def c3: Int = stemWidth * 4
  def c4: Int = stemWidth * 8
  def c5: Int = stemWidth * 16
  def headHidden: Int = c3 // official: 256·width with in_channels 256·width
  val strides: Seq[Int] = Seq(8, 16, 32)
}

object YoloxConfig {
  def fromJson(json: String): YoloxConfig = {
    val n = new ObjectMapper().readTree(json)
    def i(name: String): Int = {
      require(n.has(name), s"yolox config missing $name"); n.get(name).asInt()
    }
    YoloxConfig(numClasses = i("num_classes"), stemWidth = i("stem_width"),
      depth = i("depth"))
  }
}

/** One YOLOX detection: [x1,y1,x2,y2] in original-image pixels. */
final case class YoloxDetection(box: Array[Float], score: Float, label: Int)

final class YoloxModel(val cfg: YoloxConfig, weights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"yolox checkpoint missing tensor $name"))

  private def silu(x: Array[Float]): Unit = {
    var i = 0
    while (i < x.length) {
      x(i) = (x(i) / (1.0 + math.exp(-x(i).toDouble))).toFloat
      i += 1
    }
  }

  /** BaseConv: conv (no bias) + BN(eps 1e-3) + SiLU. */
  private def baseConv(x: Array[Float], cin: Int, h: Int, wd: Int,
      stem: String, stride: Int): (Array[Float], Int, Int) = {
    val wt = w(stem + ".conv.weight")
    val pad = (wt.shape(2) - 1) / 2
    val (y, oh, ow) = Tensors.conv2d(x, cin, h, wd, wt, null, stride, pad)
    Tensors.batchNorm2d(y, wt.shape(0), oh * ow,
      w(stem + ".bn.weight"), w(stem + ".bn.bias"),
      w(stem + ".bn.running_mean"), w(stem + ".bn.running_var"), cfg.bnEps)
    silu(y)
    (y, oh, ow)
  }

  private def concat(a: Array[Float], b: Array[Float]): Array[Float] = {
    val y = new Array[Float](a.length + b.length)
    System.arraycopy(a, 0, y, 0, a.length)
    System.arraycopy(b, 0, y, a.length, b.length)
    y
  }

  /** CSPLayer: x → conv1 → n bottlenecks; x → conv2; concat → conv3. */
  private def cspLayer(x: Array[Float], cin: Int, h: Int, wd: Int,
      stem: String, n: Int, shortcut: Boolean): Array[Float] = {
    var (a, _, _) = baseConv(x, cin, h, wd, stem + ".conv1", 1)
    val hidden = w(stem + ".conv1.conv.weight").shape(0)
    val (b, _, _) = baseConv(x, cin, h, wd, stem + ".conv2", 1)
    var i = 0
    while (i < n) {
      val (m1, _, _) = baseConv(a, hidden, h, wd, s"$stem.m.$i.conv1", 1)
      val (m2, _, _) = baseConv(m1, hidden, h, wd, s"$stem.m.$i.conv2", 1)
      if (shortcut) Tensors.addInPlace(m2, a)
      a = m2
      i += 1
    }
    baseConv(concat(a, b), 2 * hidden, h, wd, stem + ".conv3", 1)._1
  }

  /** SPPBottleneck: conv1, [id ∥ maxpool 5 ∥ 9 ∥ 13] concat, conv2. */
  private def spp(x: Array[Float], cin: Int, h: Int, wd: Int,
      stem: String): Array[Float] = {
    val (a, _, _) = baseConv(x, cin, h, wd, stem + ".conv1", 1)
    val hidden = w(stem + ".conv1.conv.weight").shape(0)
    var cat = a
    Seq(5, 9, 13).foreach { k =>
      cat = concat(cat, Tensors.maxPool2d(a, hidden, h, wd, k, 1, k / 2)._1)
    }
    baseConv(cat, 4 * hidden, h, wd, stem + ".conv2", 1)._1
  }

  /** Focus stem: 2×2 space-to-depth (tl, bl, tr, br channel order — the
    * official patch order) then BaseConv.
    */
  private def focus(pix: Array[Float], h: Int, wd: Int): (Array[Float], Int, Int) = {
    val oh = h / 2; val ow = wd / 2
    val y = new Array[Float](12 * oh * ow)
    // channel blocks: [tl(3), bl(3), tr(3), br(3)]
    var c = 0
    while (c < 3) {
      var yy = 0
      while (yy < oh) {
        var xx = 0
        while (xx < ow) {
          val o = yy * ow + xx
          y(c * oh * ow + o) = pix((c * h + 2 * yy) * wd + 2 * xx)
          y((3 + c) * oh * ow + o) = pix((c * h + 2 * yy + 1) * wd + 2 * xx)
          y((6 + c) * oh * ow + o) = pix((c * h + 2 * yy) * wd + 2 * xx + 1)
          y((9 + c) * oh * ow + o) = pix((c * h + 2 * yy + 1) * wd + 2 * xx + 1)
          xx += 1
        }
        yy += 1
      }
      c += 1
    }
    baseConv(y, 12, oh, ow, "backbone.backbone.stem.conv", 1)
  }

  /** Backbone + PAFPN → three (features, h, w) at strides 8/16/32. */
  def pafpn(pix: Array[Float], h0: Int, w0: Int): Seq[(Array[Float], Int, Int)] = {
    val B = "backbone.backbone"
    val d = cfg.depth
    var (x, h, wd) = focus(pix, h0, w0)
    // dark2
    var t = baseConv(x, cfg.stemWidth, h, wd, s"$B.dark2.0", 2)
    x = cspLayer(t._1, cfg.c2, t._2, t._3, s"$B.dark2.1", d, shortcut = true)
    h = t._2; wd = t._3
    // dark3 (P3 source)
    t = baseConv(x, cfg.c2, h, wd, s"$B.dark3.0", 2)
    x = cspLayer(t._1, cfg.c3, t._2, t._3, s"$B.dark3.1", 3 * d, shortcut = true)
    val (d3, h3, w3) = (x, t._2, t._3)
    // dark4
    t = baseConv(x, cfg.c3, h3, w3, s"$B.dark4.0", 2)
    x = cspLayer(t._1, cfg.c4, t._2, t._3, s"$B.dark4.1", 3 * d, shortcut = true)
    val (d4, h4, w4) = (x, t._2, t._3)
    // dark5: conv, SPP, shortcut-free CSP
    t = baseConv(x, cfg.c4, h4, w4, s"$B.dark5.0", 2)
    x = spp(t._1, cfg.c5, t._2, t._3, s"$B.dark5.1")
    x = cspLayer(x, cfg.c5, t._2, t._3, s"$B.dark5.2", d, shortcut = false)
    val (d5, h5, w5) = (x, t._2, t._3)
    // top-down FPN
    val P = "backbone"
    val (fpnOut0, _, _) = baseConv(d5, cfg.c5, h5, w5, s"$P.lateral_conv0", 1) // c4 ch
    val up0 = Tensors.resizeNearest(fpnOut0, cfg.c4, h5, w5, h4, w4)
    val p4 = cspLayer(concat(up0, d4), 2 * cfg.c4, h4, w4, s"$P.C3_p4", d, shortcut = false)
    val (fpnOut1, _, _) = baseConv(p4, cfg.c4, h4, w4, s"$P.reduce_conv1", 1) // c3 ch
    val up1 = Tensors.resizeNearest(fpnOut1, cfg.c3, h4, w4, h3, w3)
    val panOut2 = cspLayer(concat(up1, d3), 2 * cfg.c3, h3, w3, s"$P.C3_p3", d, shortcut = false)
    // bottom-up PAN
    val bu2 = baseConv(panOut2, cfg.c3, h3, w3, s"$P.bu_conv2", 2)
    val panOut1 = cspLayer(concat(bu2._1, fpnOut1), 2 * cfg.c3, h4, w4,
      s"$P.C3_n3", d, shortcut = false)
    val bu1 = baseConv(panOut1, cfg.c4, h4, w4, s"$P.bu_conv1", 2)
    val panOut0 = cspLayer(concat(bu1._1, fpnOut0), 2 * cfg.c4, h5, w5,
      s"$P.C3_n4", d, shortcut = false)
    Seq((panOut2, h3, w3), (panOut1, h4, w4), (panOut0, h5, w5))
  }

  /** Decoupled head over one level → raw predictions
    * [(5+numClasses) · h · w] CHW (reg 4, obj 1, cls C — the official
    * output concat order).
    */
  private def headLevel(feat: Array[Float], cin: Int, h: Int, wd: Int,
      level: Int): Array[Float] = {
    val hid = cfg.headHidden
    val (stem, _, _) = baseConv(feat, cin, h, wd, s"head.stems.$level", 1)
    var cls = stem
    var i = 0
    while (i < 2) {
      cls = baseConv(cls, hid, h, wd, s"head.cls_convs.$level.$i", 1)._1
      i += 1
    }
    val (clsOut, _, _) = Tensors.conv2d(cls, hid, h, wd,
      w(s"head.cls_preds.$level.weight"), w(s"head.cls_preds.$level.bias"), 1, 0)
    var reg = stem
    i = 0
    while (i < 2) {
      reg = baseConv(reg, hid, h, wd, s"head.reg_convs.$level.$i", 1)._1
      i += 1
    }
    val (regOut, _, _) = Tensors.conv2d(reg, hid, h, wd,
      w(s"head.reg_preds.$level.weight"), w(s"head.reg_preds.$level.bias"), 1, 0)
    val (objOut, _, _) = Tensors.conv2d(reg, hid, h, wd,
      w(s"head.obj_preds.$level.weight"), w(s"head.obj_preds.$level.bias"), 1, 0)
    val out = new Array[Float]((5 + cfg.numClasses) * h * wd)
    System.arraycopy(regOut, 0, out, 0, 4 * h * wd)
    System.arraycopy(objOut, 0, out, 4 * h * wd, h * wd)
    System.arraycopy(clsOut, 0, out, 5 * h * wd, cfg.numClasses * h * wd)
    out
  }

  /** Full forward + anchor-free decode: per cell center=(pred+grid)·s,
    * size=exp(pred)·s, score=σ(obj)·σ(cls); threshold then per-class
    * greedy NMS. Boxes come back in PREPROCESSED-frame pixels; divide by
    * the resize ratio for original coordinates.
    */
  def detect(pix: Array[Float], h0: Int, w0: Int, threshold: Float,
      nmsIou: Float = 0.45f): Seq[YoloxDetection] = {
    val levels = pafpn(pix, h0, w0)
    val chans = Seq(cfg.c3, cfg.c4, cfg.c5)
    val cands = Seq.newBuilder[YoloxDetection]
    levels.zipWithIndex.foreach { case ((feat, h, wd), li) =>
      val out = headLevel(feat, chans(li), h, wd, li)
      val s = cfg.strides(li).toFloat
      val hw = h * wd
      var cell = 0
      while (cell < hw) {
        val obj = 1.0 / (1.0 + math.exp(-out(4 * hw + cell).toDouble))
        var c = 0
        while (c < cfg.numClasses) {
          val cl = 1.0 / (1.0 + math.exp(-out((5 + c) * hw + cell).toDouble))
          val score = (obj * cl).toFloat
          if (score > threshold) {
            val cx = (out(cell) + cell % wd) * s
            val cy = (out(hw + cell) + cell / wd) * s
            val bw = (math.exp(out(2 * hw + cell).toDouble) * s).toFloat
            val bh = (math.exp(out(3 * hw + cell).toDouble) * s).toFloat
            cands += YoloxDetection(
              Array(cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2), score, c)
          }
          c += 1
        }
        cell += 1
      }
    }
    // per-class greedy NMS, highest score first
    def iou(a: Array[Float], b: Array[Float]): Float = {
      val ix = math.max(0f, math.min(a(2), b(2)) - math.max(a(0), b(0)))
      val iy = math.max(0f, math.min(a(3), b(3)) - math.max(a(1), b(1)))
      val inter = ix * iy
      val ua = (a(2) - a(0)) * (a(3) - a(1)) + (b(2) - b(0)) * (b(3) - b(1)) - inter
      if (ua <= 0f) 0f else inter / ua
    }
    val kept = Seq.newBuilder[YoloxDetection]
    cands.result().groupBy(_.label).toSeq.sortBy(_._1).foreach { case (_, ds) =>
      var remaining = ds.sortBy(-_.score).toList
      while (remaining.nonEmpty) {
        val top = remaining.head
        kept += top
        remaining = remaining.tail.filter(d => iou(top.box, d.box) <= nmsIou)
      }
    }
    kept.result().sortBy(-_.score)
  }

  /** YOLOX val preprocessing: aspect-preserving resize so the image fits
    * `target`×`target` (nearest like the official cv2 INTER_LINEAR is
    * bilinear — use bilinear), gray-114 padding bottom/right, BGR channel
    * order, raw 0-255 floats (YOLOX dropped mean/std normalization).
    * Returns (pixels [3·T·T], ratio).
    */
  def preprocess(img: BufferedImage, target: Int): (Array[Float], Float) = {
    val sw = img.getWidth; val sh = img.getHeight
    val r = math.min(target.toDouble / sw, target.toDouble / sh)
    val rw = math.max(1, (sw * r).toInt)
    val rh = math.max(1, (sh * r).toInt)
    val out = Array.fill(3 * target * target)(114f)
    var y = 0
    while (y < rh) {
      val fy = (y + 0.5) * sh / rh - 0.5
      val y0 = math.max(0, math.min(sh - 1, math.floor(fy).toInt))
      val y1 = math.min(sh - 1, y0 + 1)
      val wy = fy - y0
      var x = 0
      while (x < rw) {
        val fx = (x + 0.5) * sw / rw - 0.5
        val x0 = math.max(0, math.min(sw - 1, math.floor(fx).toInt))
        val x1 = math.min(sw - 1, x0 + 1)
        val wx = fx - x0
        val p00 = img.getRGB(x0, y0); val p01 = img.getRGB(x1, y0)
        val p10 = img.getRGB(x0, y1); val p11 = img.getRGB(x1, y1)
        var c = 0
        while (c < 3) {
          val sh8 = 8 * c // BGR: c=0 reads the low (blue) byte
          val v = ((p00 >> sh8 & 0xff) * (1 - wx) + (p01 >> sh8 & 0xff) * wx) * (1 - wy) +
            ((p10 >> sh8 & 0xff) * (1 - wx) + (p11 >> sh8 & 0xff) * wx) * wy
          out(c * target * target + y * target + x) = v.toFloat
          c += 1
        }
        x += 1
      }
      y += 1
    }
    (out, r.toFloat)
  }
}
