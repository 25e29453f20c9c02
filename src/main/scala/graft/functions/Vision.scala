package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** Detection-evaluation ops (reference `/root/reference/pixeltable/
  * functions/vision.py:100-281`, mmdet-style matching): per-row
  * `evalDetections` produces TP/FP flags per class, and `MeanAp` aggregates
  * them into per-class average precision across the table. Pure math — no
  * image decode — so this is full-fidelity reference surface.
  *
  * Matching semantics (as the reference): predictions are visited in
  * descending score; a prediction is TP iff its best-IoU ground-truth box
  * has IoU >= minIou and is not yet matched; every other prediction is FP.
  * One deliberate fix vs the reference: tp/fp flags are emitted in
  * descending-score order, aligned with the emitted scores (the reference
  * emits flags in input order but scores sorted, which misaligns them when
  * inputs are unsorted).
  */
object Vision {

  final case class DetectionEval(
      min_iou: Double, category: Int, tp: Seq[Int], fp: Seq[Int],
      scores: Seq[Double], num_gts: Int)

  private val Eps: Double = java.lang.Math.ulp(1.0f).toDouble

  private[functions] def bboxArea(b: Seq[Double]): Double =
    (b(2) - b(0)) * (b(3) - b(1))

  /** IoU of two xyxy boxes (float-eps clamped union, like the reference). */
  def iou(b1: Seq[Double], b2: Seq[Double]): Double = {
    val w = math.max(math.min(b1(2), b2(2)) - math.max(b1(0), b2(0)), 0.0)
    val h = math.max(math.min(b1(3), b2(3)) - math.max(b1(1), b2(1)), 0.0)
    val inter = w * h
    inter / math.max(bboxArea(b1) + bboxArea(b2) - inter, Eps)
  }

  /** One image's detections vs ground truth → one eval per label class. */
  def evalDetections(
      predBoxes: Seq[Seq[Double]], predLabels: Seq[Int], predScores: Seq[Double],
      gtBoxes: Seq[Seq[Double]], gtLabels: Seq[Int], minIou: Double = 0.5,
  ): Seq[DetectionEval] = {
    val classes = (predLabels ++ gtLabels).distinct.sorted
    classes.map { cls =>
      val pIdx = predLabels.indices.filter(predLabels(_) == cls)
      val gIdx = gtLabels.indices.filter(gtLabels(_) == cls)
      val order = pIdx.sortBy(i => -predScores(i)) // descending score
      val gtCovered = Array.fill(gIdx.length)(false)
      val tp = scala.collection.mutable.ArrayBuffer.empty[Int]
      order.foreach { i =>
        val ious = gIdx.map(g => iou(predBoxes(i), gtBoxes(g)))
        val best = if (ious.isEmpty) -1 else ious.indices.maxBy(ious(_))
        if (best >= 0 && ious(best) >= minIou && !gtCovered(best)) {
          gtCovered(best) = true; tp += 1
        } else tp += 0
      }
      DetectionEval(minIou, cls, tp.toSeq, tp.map(1 - _).toSeq,
        order.map(predScores(_)), gIdx.length)
    }
  }

  /** UDF form for DataFrame use: boxes as array<array<double>>. */
  val evalDetectionsUdf = udf(
    (pb: Seq[Seq[Double]], pl: Seq[Int], ps: Seq[Double],
        gb: Seq[Seq[Double]], gl: Seq[Int], minIou: Double) =>
      evalDetections(pb, pl, ps, gb, gl, minIou))

  final case class ClassAcc(
      tp: List[Int], fp: List[Int], scores: List[Double], numGts: Int)

  /** mean_ap UDA: aggregates evalDetections rows into per-class AP using
    * all-point interpolation (monotone precision envelope), exactly the
    * reference's computation. Partial-aggregation friendly.
    */
  object MeanAp extends Aggregator[Seq[DetectionEval], Map[Int, ClassAcc], Map[Int, Double]] {
    def zero: Map[Int, ClassAcc] = Map.empty

    def reduce(b: Map[Int, ClassAcc], evals: Seq[DetectionEval]): Map[Int, ClassAcc] =
      evals.foldLeft(b) { (acc, e) =>
        val cur = acc.getOrElse(e.category, ClassAcc(Nil, Nil, Nil, 0))
        // PREPEND (O(per-row) not O(accumulated)) — `finish` sorts by score,
        // so accumulation order is irrelevant; appending made reduce
        // quadratic per group. The three lists permute together, keeping
        // tp/fp/scores index-aligned.
        acc.updated(e.category, ClassAcc(
          e.tp.toList ::: cur.tp, e.fp.toList ::: cur.fp,
          e.scores.toList ::: cur.scores, cur.numGts + e.num_gts))
      }

    def merge(a: Map[Int, ClassAcc], b: Map[Int, ClassAcc]): Map[Int, ClassAcc] =
      (a.keySet ++ b.keySet).map { k =>
        val x = a.getOrElse(k, ClassAcc(Nil, Nil, Nil, 0))
        val y = b.getOrElse(k, ClassAcc(Nil, Nil, Nil, 0))
        k -> ClassAcc(x.tp ++ y.tp, x.fp ++ y.fp, x.scores ++ y.scores,
          x.numGts + y.numGts)
      }.toMap

    def finish(b: Map[Int, ClassAcc]): Map[Int, Double] = b.map { case (cls, acc) =>
      // materialize to arrays FIRST: positional indexing on the accumulated
      // Lists inside the sorted scan is O(n) per access → O(n²) per class
      // (measured 4.4 s at 30k rows; arrays make it n log n)
      val scores = acc.scores.toArray
      val tps = acc.tp.toArray
      val fps = acc.fp.toArray
      val order = scores.indices.sortBy(i => -scores(i))
      var tpCum = 0.0
      var fpCum = 0.0
      val pr = order.map { i =>
        tpCum += tps(i); fpCum += fps(i)
        (tpCum / math.max(tpCum + fpCum, Eps), tpCum / math.max(acc.numGts, Eps))
      }
      // all-point interpolation: envelope precision from the right, sum
      // precision * recall-step at every recall change
      val mrec = 0.0 +: pr.map(_._2) :+ 1.0
      val mpre = (0.0 +: pr.map(_._1) :+ 0.0).toArray
      for (i <- mpre.length - 1 until 0 by -1)
        mpre(i - 1) = math.max(mpre(i - 1), mpre(i))
      val ap = (0 until mrec.length - 1).collect {
        case i if mrec(i + 1) != mrec(i) => (mrec(i + 1) - mrec(i)) * mpre(i + 1)
      }.sum
      cls -> ap
    }

    def bufferEncoder: Encoder[Map[Int, ClassAcc]] = Encoders.kryo[Map[Int, ClassAcc]]
    def outputEncoder: Encoder[Map[Int, Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Double]]()
  }

  def mean_ap(evals: Column): Column =
    org.apache.spark.sql.functions.udaf(MeanAp).apply(evals)

  // ---- bbox geometry family (reference vision.py:460-1426) -------------
  //
  // Per-row list-of-boxes transforms in three formats (xyxy, xywh,
  // cxcywh). The reference distinguishes int vs float boxes by Python
  // type; on Spark everything is array<double>, so INT SEMANTICS are
  // inferred from all-integral values (documented divergence: a float box
  // that happens to be whole-valued gets the int rounding). Int rounding
  // is floor(x + 0.5) — the reference deliberately avoids banker's
  // round(). Degenerate boxes (non-positive extent) pass through
  // UNCHANGED in every op, exactly as the reference's `valid` masking.

  private val BoxFormats = Set("xyxy", "xywh", "cxcywh")

  private def requireFormat(f: String): Unit =
    require(BoxFormats.contains(f), s"invalid format: $f")

  private def isIntBoxes(bs: Seq[Seq[Double]]): Boolean =
    bs.forall(_.forall(v => v == math.floor(v) && !v.isInfinite))

  private def rnd(x: Double): Double = math.floor(x + 0.5)

  private def toCxcywh(b: Seq[Double], format: String): (Double, Double, Double, Double) =
    format match {
      case "xyxy"   => val w = b(2) - b(0); val h = b(3) - b(1)
        (b(0) + w / 2, b(1) + h / 2, w, h)
      case "xywh"   => (b(0) + b(2) / 2, b(1) + b(3) / 2, b(2), b(3))
      case _        => (b(0), b(1), b(2), b(3))
    }

  private def fromCxcywh(cx: Double, cy: Double, w0: Double, h0: Double,
      format: String, isInt: Boolean): Seq[Double] = {
    // int path: round w/h FIRST, derive positions from the rounded dims so
    // x2 − x1 == round(w) (the reference's consistency rule)
    val w = if (isInt) rnd(w0) else w0
    val h = if (isInt) rnd(h0) else h0
    format match {
      case "xyxy" =>
        if (isInt) { val x1 = rnd(cx - w / 2); val y1 = rnd(cy - h / 2)
          Seq(x1, y1, x1 + w, y1 + h) }
        else Seq(cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)
      case "xywh" =>
        if (isInt) Seq(rnd(cx - w / 2), rnd(cy - h / 2), w, h)
        else Seq(cx - w / 2, cy - h / 2, w, h)
      case _ =>
        if (isInt) Seq(rnd(cx), rnd(cy), w, h) else Seq(cx, cy, w, h)
    }
  }

  private def degenerate(b: Seq[Double], format: String): Boolean =
    format match {
      case "xyxy" => !(b(2) > b(0) && b(3) > b(1))
      case _      => !(b(2) > 0 && b(3) > 0)
    }

  /** bboxes_convert (vision.py:460): reformat between xyxy/xywh/cxcywh. */
  val bboxesConvert = udf { (bs: Seq[Seq[Double]], src: String, dst: String) =>
    requireFormat(src); requireFormat(dst)
    if (bs.isEmpty || src == dst) bs
    else {
      val isInt = isIntBoxes(bs)
      bs.map { b =>
        val (cx, cy, w, h) = toCxcywh(b, src)
        // convert never renormalizes w/h, so go through exact corner math
        val (x1, y1) = (cx - w / 2, cy - h / 2)
        val out = dst match {
          case "xyxy"   => Seq(x1, y1, x1 + w, y1 + h)
          case "xywh"   => Seq(x1, y1, w, h)
          case _        => Seq(cx, cy, w, h)
        }
        if (isInt) out.map(rnd) else out
      }
    }
  }

  /** bboxes_scale (vision.py:733): center-anchored w/h re-scale; pass 0
    * for an unset factor (at least one must be set; `factor` exclusive
    * with the axis factors).
    */
  val bboxesScale = udf { (bs: Seq[Seq[Double]], format: String,
      factor: Double, xFactor: Double, yFactor: Double) =>
    requireFormat(format)
    require(factor > 0 || xFactor > 0 || yFactor > 0, "no scale factor set")
    require(!(factor > 0 && (xFactor > 0 || yFactor > 0)),
      "factor is exclusive with x_factor/y_factor")
    val fx = if (factor > 0) factor else if (xFactor > 0) xFactor else 1.0
    val fy = if (factor > 0) factor else if (yFactor > 0) yFactor else 1.0
    val isInt = isIntBoxes(bs)
    bs.map { b =>
      if (degenerate(b, format)) b
      else {
        val (cx, cy, w, h) = toCxcywh(b, format)
        fromCxcywh(cx, cy, w * fx, h * fy, format, isInt)
      }
    }
  }

  /** bboxes_resize (vision.py:519): center-anchored resize to a target
    * width OR height (other dimension keeps aspect), or to an aspect
    * ratio with mode "crop" (shrink the oversized dim) / "pad" (grow the
    * undersized dim). Pass 0 for unset width/height/aspect.
    */
  val bboxesResize = udf { (bs: Seq[Seq[Double]], format: String,
      width: Double, height: Double, aspect: Double, aspectMode: String) =>
    requireFormat(format)
    val set = Seq(width > 0, height > 0, aspect > 0).count(identity)
    require(set == 1, "exactly one of width, height, aspect must be set")
    require(aspect <= 0 || aspectMode == "crop" || aspectMode == "pad",
      s"aspect_mode must be crop|pad: $aspectMode")
    val isInt = isIntBoxes(bs)
    bs.map { b =>
      if (degenerate(b, format)) b
      else {
        val (cx, cy, w, h) = toCxcywh(b, format)
        val (nw, nh) =
          if (width > 0) (width, h * (width / w))
          else if (height > 0) (w * (height / h), height)
          else {
            val tooWide = w / h > aspect
            if (aspectMode == "crop")
              (if (tooWide) h * aspect else w, if (tooWide) h else w / aspect)
            else
              (if (tooWide) w else h * aspect, if (tooWide) w / aspect else h)
          }
        fromCxcywh(cx, cy, nw, nh, format, isInt)
      }
    }
  }

  /** bboxes_pad (vision.py:847): grow boxes by per-side pixel amounts
    * (absolute coordinates by contract).
    */
  val bboxesPad = udf { (bs: Seq[Seq[Double]], format: String,
      left: Double, right: Double, top: Double, bottom: Double) =>
    requireFormat(format)
    require(left >= 0 && right >= 0 && top >= 0 && bottom >= 0,
      "padding must be >= 0")
    val isInt = isIntBoxes(bs)
    bs.map { b =>
      if (degenerate(b, format)) b
      else {
        val out = format match {
          case "xyxy" => Seq(b(0) - left, b(1) - top, b(2) + right, b(3) + bottom)
          case "xywh" => Seq(b(0) - left, b(1) - top,
            b(2) + left + right, b(3) + top + bottom)
          case _ => Seq(b(0) + (right - left) / 2, b(1) + (bottom - top) / 2,
            b(2) + left + right, b(3) + top + bottom)
        }
        if (isInt) out.map(rnd) else out
      }
    }
  }

  /** bboxes_clip_to_canvas (vision.py:951): clip to [0,w]×[0,h] (pass
    * w=h=0 for relative [0,1] boxes); boxes failing min_visibility /
    * min_area become NULL entries; degenerate boxes pass through.
    */
  val bboxesClipToCanvas = udf { (bs: Seq[Seq[Double]], format: String,
      width: Double, height: Double, minVisibility: Double, minArea: Double) =>
    requireFormat(format)
    require((width > 0) == (height > 0), "width/height must be set together")
    require(minVisibility >= 0 && minVisibility <= 1.0, "bad min_visibility")
    require(minArea >= 0, "bad min_area")
    val isInt = isIntBoxes(bs)
    val xMax = if (width > 0) width else 1.0
    val yMax = if (height > 0) height else 1.0
    bs.map { b =>
      if (b == null || degenerate(b, format)) b
      else {
        val (cx0, cy0, w, h) = toCxcywh(b, format)
        val (x1, y1, x2, y2) = (cx0 - w / 2, cy0 - h / 2, cx0 + w / 2, cy0 + h / 2)
        val (cx1, cy1) = (math.max(0.0, math.min(x1, xMax)), math.max(0.0, math.min(y1, yMax)))
        val (cx2, cy2) = (math.max(0.0, math.min(x2, xMax)), math.max(0.0, math.min(y2, yMax)))
        val origArea = (x2 - x1) * (y2 - y1)
        val clippedArea = math.max(cx2 - cx1, 0) * math.max(cy2 - cy1, 0)
        val visOk = minVisibility <= 0 ||
          (origArea > 0 && clippedArea / origArea >= minVisibility)
        val areaOk = minArea <= 0 || clippedArea >= minArea
        if (!visOk || !areaOk) null
        else {
          val out = format match {
            case "xyxy" => Seq(cx1, cy1, cx2, cy2)
            case "xywh" => Seq(cx1, cy1, cx2 - cx1, cy2 - cy1)
            case _ => Seq((cx1 + cx2) / 2, (cy1 + cy2) / 2, cx2 - cx1, cy2 - cy1)
          }
          if (isInt) out.map(rnd) else out
        }
      }
    }
  }

  /** bboxes_crop_canvas (vision.py:1071): re-base boxes after a canvas
    * crop (region in its own format; pass canvasW=canvasH=0 for relative
    * boxes, which also renormalize by the crop size).
    */
  val bboxesCropCanvas = udf { (bs: Seq[Seq[Double]], format: String,
      region: Seq[Double], regionFormat: String,
      canvasW: Double, canvasH: Double) =>
    requireFormat(format); requireFormat(regionFormat)
    require(region != null && region.length == 4, "canvas_region must have 4 coords")
    val (rcx, rcy, rw, rh) = toCxcywh(region, regionFormat)
    val (rx1, ry1) = (rcx - rw / 2, rcy - rh / 2)
    require(rw > 0 && rh > 0, "empty canvas_region")
    val absolute = canvasW > 0
    val isInt = isIntBoxes(bs)
    bs.map { b =>
      if (degenerate(b, format)) b
      else {
        val (cx, cy, w, h) = toCxcywh(b, format)
        val (ncx, ncy, nw, nh) =
          if (absolute) (cx - rx1, cy - ry1, w, h)
          else ((cx - rx1) / rw, (cy - ry1) / rh, w / rw, h / rh)
        fromCxcywh(ncx, ncy, nw, nh, format, isInt)
      }
    }
  }

  /** bboxes_resize_canvas (vision.py:1208): scale box COORDS for a canvas
    * resize — absolute mode (old + new canvas dims) or factor mode (pass
    * dims as 0 and factors > 0; unset axis factor = 1).
    */
  val bboxesResizeCanvas = udf { (bs: Seq[Seq[Double]], format: String,
      canvasW: Double, canvasH: Double, newW: Double, newH: Double,
      scaleX: Double, scaleY: Double) =>
    requireFormat(format)
    val dims = canvasW > 0 && canvasH > 0 && newW > 0 && newH > 0
    require(dims || scaleX > 0 || scaleY > 0, "no resize specified")
    require(!(dims && (scaleX > 0 || scaleY > 0)),
      "canvas dims exclusive with scale factors")
    val sx = if (dims) newW / canvasW else if (scaleX > 0) scaleX else 1.0
    val sy = if (dims) newH / canvasH else if (scaleY > 0) scaleY else 1.0
    val isInt = isIntBoxes(bs)
    bs.map { b =>
      if (degenerate(b, format)) b
      else {
        val out = Seq(b(0) * sx, b(1) * sy, b(2) * sx, b(3) * sy)
        if (isInt) out.map(rnd) else out
      }
    }
  }

  /** The reference's per-label color assignment (vision.py:280-296,
    * `__create_label_colors`): md5(str(label)) as an integer, hue =
    * (hash % 360)/360, HSV(hue, 0.7, 0.95) → RGB. Deterministic: the
    * same label always draws in the same color.
    */
  private[graft] def labelColor(label: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(label.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hue = new java.math.BigInteger(hex, 16)
      .mod(java.math.BigInteger.valueOf(360)).intValue() / 360.0
    // colorsys.hsv_to_rgb + int(c*255) truncation, matching the reference
    // exactly (Color.getHSBColor would round instead)
    val h6 = (hue * 6.0); val i = h6.toInt % 6; val f = h6 - h6.toInt
    val v = 0.95; val s = 0.7
    val p = v * (1 - s); val q = v * (1 - s * f); val t = v * (1 - s * (1 - f))
    val (r, gc, b) = i match {
      case 0 => (v, t, p); case 1 => (q, v, p); case 2 => (p, v, t)
      case 3 => (p, q, v); case 4 => (t, p, v); case _ => (v, p, q)
    }
    ((r * 255).toInt << 16) | ((gc * 255).toInt << 8) | (b * 255).toInt
  }

  /** bboxes_draw (vision.py:302): draw xyxy boxes on the image. `rgb` >= 0
    * is the single color for all boxes; `rgb` < 0 assigns each box the
    * deterministic md5-hash color of its label (vision.py's
    * `__create_label_colors`; boxes beyond the label list share the null
    * label's color, mirroring `labels = [None] * num_boxes`). `alpha`
    * blends the outline, `fillAlpha` the optional fill.
    */
  val bboxesDraw = udf { (png: Array[Byte], bs: Seq[Seq[Double]],
      labels: Seq[String], rgb: Int, alpha: Double, fill: Boolean,
      fillAlpha: Double, width: Int) =>
    val img = Images.decode(png)
    val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, null)
    val labelList = if (labels == null) Seq.empty else labels
    bs.filter(_ != null).zipWithIndex.foreach { case (b, bi) =>
      val boxRgb =
        if (rgb >= 0) rgb & 0xffffff
        else labelColor(labelList.lift(bi).map(String.valueOf).getOrElse("None"))
      val color = new java.awt.Color(boxRgb)
      val x1 = b(0).toInt; val y1 = b(1).toInt
      val w = math.max(1, (b(2) - b(0)).toInt); val h = math.max(1, (b(3) - b(1)).toInt)
      if (fill) {
        g.setColor(new java.awt.Color(color.getRed, color.getGreen,
          color.getBlue, math.round(255 * fillAlpha).toInt))
        g.fillRect(x1, y1, w, h)
      }
      g.setColor(new java.awt.Color(color.getRed, color.getGreen,
        color.getBlue, math.round(255 * alpha).toInt))
      g.setStroke(new java.awt.BasicStroke(math.max(1, width).toFloat))
      g.drawRect(x1, y1, w, h)
    }
    g.dispose()
    Images.encodePng(out)
  }

  /** overlay_segmentation (vision.py:1428): alpha-blend an integer id map
    * over the image (id 0 = background, untouched); deterministic
    * id-keyed palette; optional contour mode draws only the 8-neighbour
    * boundary of each region (`_get_contours` semantics).
    */
  val overlaySegmentation = udf { (png: Array[Byte], mask: Seq[Seq[Int]],
      alpha: Double, contoursOnly: Boolean, thickness: Int) =>
    val img = Images.decode(png)
    val hgt = math.min(img.getHeight, mask.length)
    val wid = if (hgt == 0) 0 else math.min(img.getWidth, mask.head.length)
    val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
    def at(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= wid || y >= hgt) 0 else mask(y)(x)
    def isBoundary(x: Int, y: Int): Boolean = {
      val id = at(x, y)
      id != 0 && (for (dy <- -1 to 1; dx <- -1 to 1) yield at(x + dx, y + dy))
        .exists(_ != id)
    }
    // thickness > 1 dilates the boundary set
    lazy val boundary: Set[(Int, Int)] = {
      var cur = (for (y <- 0 until hgt; x <- 0 until wid
        if isBoundary(x, y)) yield (x, y)).toSet
      for (_ <- 2 to thickness)
        cur = cur.flatMap { case (x, y) =>
          for (dy <- -1 to 1; dx <- -1 to 1) yield (x + dx, y + dy)
        }.filter { case (x, y) => x >= 0 && y >= 0 && x < wid && y < hgt &&
          at(x, y) != 0 }
      cur
    }
    def palette(id: Int): Int = { // deterministic id-keyed color
      val h = Integer.hashCode(id * 0x9e3779b9)
      ((h & 0x7f) + 96) << 16 | (((h >> 8) & 0x7f) + 96) << 8 | (((h >> 16) & 0x7f) + 96)
    }
    for (y <- 0 until hgt; x <- 0 until wid) {
      val id = at(x, y)
      val paint = id != 0 && (!contoursOnly || boundary.contains((x, y)))
      if (paint) {
        val base = out.getRGB(x, y)
        val c = palette(id)
        def mix(shift: Int): Int = {
          val b0 = (base >> shift) & 0xff; val c0 = (c >> shift) & 0xff
          math.round(b0 * (1 - alpha) + c0 * alpha).toInt
        }
        out.setRGB(x, y, (mix(16) << 16) | (mix(8) << 8) | mix(0))
      }
    }
    Images.encodePng(out)
  }
}
