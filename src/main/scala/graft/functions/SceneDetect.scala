package graft.functions

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions.udf

/** The reference's scene-detection family (`/root/reference/pixeltable/
  * functions/video/scene_detect.py:27-483`): five detectors —
  * adaptive / content / threshold / histogram / hash — wrapping the public
  * PySceneDetect algorithms. The reference delegates to the scenedetect
  * package; this implements the same published detector semantics directly
  * over decoded MJPEG-AVI frames (no external codec/library):
  *
  *  - content:   OpenCV-style HSV per-channel mean absolute frame deltas,
  *               weighted (hue/sat/lum/edges, default 1/1/1/0), cut when
  *               the score reaches `threshold` (`scene_detect.py:133`).
  *  - adaptive:  content score divided by the average score of the
  *               `windowWidth` frames on each side — a rolling two-sided
  *               ratio that ignores gradual drift (`scene_detect.py:27`).
  *  - threshold: mean frame brightness against a floor/ceiling — fade-out/
  *               fade-in transitions, cut placed inside the fade by
  *               `fadeBias` (`scene_detect.py:236`).
  *  - histogram: normalized Y-channel histograms of consecutive frames,
  *               cut when half the L1 distance (∈[0,1]) exceeds
  *               `threshold` (`scene_detect.py:329`).
  *  - hash:      DCT perceptual hash (resize to size·lowpass, 2-D DCT-II,
  *               top-left size×size vs its median), cut when the
  *               normalized Hamming distance exceeds `threshold`
  *               (`scene_detect.py:403`).
  *
  * Known approximations vs the third-party library (documented, default
  * weights unaffected): the edges component uses a Sobel-magnitude binary
  * mask rather than auto-threshold Canny + dilation, and hue deltas take
  * plain channel differences (no wraparound) exactly as PySceneDetect's
  * uint8 arithmetic does.
  *
  * Scene assembly mirrors `_scene_detect` (`scene_detect.py:489-552`):
  * one SceneInfo per cut (start of the previous scene, duration up to the
  * cut frame); a cut-less video with content returns a single full-span
  * scene whose duration ends at the LAST frame's timestamp. `start_pts`
  * is the frame index (the AVI stream's scale-tick timebase).
  *
  * Each detector is a scalar UDF over the binary video column — per-video
  * work stays on the executor holding the row; nothing shuffles.
  */
object SceneDetect {

  final case class SceneInfo(start_time: Double, start_pts: Long,
      duration: Double)

  // ---- frame features -------------------------------------------------

  private def frames(v: Array[Byte]): (IndexedSeq[BufferedImage], Double) = {
    val meta = Video.readMetaAny(v)
    val fps = if (meta.fps > 0) meta.fps else 30.0
    (Video.readFramesAny(v).map(Images.decode).toIndexedSeq, fps)
  }

  /** OpenCV-convention HSV planes: H ∈ [0,180), S,V ∈ [0,255]. */
  private def hsvPlanes(img: BufferedImage): (Array[Double], Array[Double], Array[Double]) = {
    val n = img.getWidth * img.getHeight
    val h = new Array[Double](n); val s = new Array[Double](n)
    val v = new Array[Double](n)
    var i = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        val mx = math.max(r, math.max(g, b)); val mn = math.min(r, math.min(g, b))
        val d = (mx - mn).toDouble
        v(i) = mx
        s(i) = if (mx == 0) 0.0 else 255.0 * d / mx
        h(i) =
          if (d == 0) 0.0
          else if (mx == r) 30.0 * (((g - b) / d + 6.0) % 6.0)
          else if (mx == g) 30.0 * ((b - r) / d + 2.0)
          else 30.0 * ((r - g) / d + 4.0)
        i += 1; x += 1
      }
      y += 1
    }
    (h, s, v)
  }

  /** Binary Sobel-magnitude edge mask scaled to {0, 255}. */
  private def edgeMask(img: BufferedImage): Array[Double] = {
    val w = img.getWidth; val ht = img.getHeight
    val lum = new Array[Double](w * ht)
    var y = 0
    while (y < ht) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        lum(y * w + x) = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
          0.114 * (p & 0xff)
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](w * ht)
    var yy = 1
    while (yy < ht - 1) {
      var xx = 1
      while (xx < w - 1) {
        def l(dx: Int, dy: Int) = lum((yy + dy) * w + (xx + dx))
        val gx = (l(1, -1) + 2 * l(1, 0) + l(1, 1)) - (l(-1, -1) + 2 * l(-1, 0) + l(-1, 1))
        val gy = (l(-1, 1) + 2 * l(0, 1) + l(1, 1)) - (l(-1, -1) + 2 * l(0, -1) + l(1, -1))
        if (math.sqrt(gx * gx + gy * gy) > 127.0) out(yy * w + xx) = 255.0
        xx += 1
      }
      yy += 1
    }
    out
  }

  private def meanAbsDelta(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) return 0.0
    var s = 0.0; var i = 0
    while (i < n) { s += math.abs(a(i) - b(i)); i += 1 }
    s / n
  }

  /** Per-frame content scores; scores(0) = 0 (no previous frame). */
  private[functions] def contentScores(fs: IndexedSeq[BufferedImage],
      wHue: Double, wSat: Double, wLum: Double, wEdges: Double,
      lumaOnly: Boolean): Array[Double] = {
    val scores = new Array[Double](fs.length)
    if (fs.isEmpty) return scores
    var prev = hsvPlanes(fs(0))
    var prevEdges: Array[Double] = if (wEdges > 0) edgeMask(fs(0)) else null
    var i = 1
    while (i < fs.length) {
      val cur = hsvPlanes(fs(i))
      val dLum = meanAbsDelta(prev._3, cur._3)
      scores(i) =
        if (lumaOnly) dLum
        else {
          val curEdges = if (wEdges > 0) edgeMask(fs(i)) else null
          val dE = if (wEdges > 0) meanAbsDelta(prevEdges, curEdges) else 0.0
          if (wEdges > 0) prevEdges = curEdges
          val wSum = wHue + wSat + wLum + wEdges
          if (wSum == 0) 0.0
          else (wHue * meanAbsDelta(prev._1, cur._1) +
            wSat * meanAbsDelta(prev._2, cur._2) +
            wLum * dLum + wEdges * dE) / wSum
        }
      prev = cur
      i += 1
    }
    scores
  }

  /** cuts → SceneInfo list (reference `_scene_detect` semantics). */
  private[functions] def scenes(cuts: Seq[Int], nFrames: Int,
      fps: Double): Seq[SceneInfo] = {
    if (nFrames == 0) Seq.empty
    else if (cuts.isEmpty) Seq(SceneInfo(0.0, 0L, (nFrames - 1) / fps))
    else {
      var start = 0
      cuts.map { c =>
        val s = SceneInfo(start / fps, start.toLong, (c - start) / fps)
        start = c
        s
      }
    }
  }

  private def gated(candidates: Seq[Int], minSceneLen: Int): Seq[Int] = {
    var last = 0
    candidates.filter { c =>
      if (c - last >= minSceneLen) { last = c; true } else false
    }
  }

  // ---- detectors ------------------------------------------------------

  def detectContent(v: Array[Byte], threshold: Double, minSceneLen: Int,
      lumaOnly: Boolean, wHue: Double = 1.0, wSat: Double = 1.0,
      wLum: Double = 1.0, wEdges: Double = 0.0): Seq[SceneInfo] = {
    val (fs, fps) = frames(v)
    val sc = contentScores(fs, wHue, wSat, wLum, wEdges, lumaOnly)
    scenes(gated((1 until fs.length).filter(sc(_) >= threshold), minSceneLen),
      fs.length, fps)
  }

  def detectAdaptive(v: Array[Byte], adaptiveThreshold: Double,
      minSceneLen: Int, windowWidth: Int, minContentVal: Double,
      lumaOnly: Boolean = false): Seq[SceneInfo] = {
    require(windowWidth >= 1, s"windowWidth must be >= 1: $windowWidth")
    val (fs, fps) = frames(v)
    val sc = contentScores(fs, 1.0, 1.0, 1.0, 0.0, lumaOnly)
    val cand = (1 until fs.length).filter { i =>
      val lo = math.max(1, i - windowWidth)
      val hi = math.min(fs.length - 1, i + windowWidth)
      val neigh = (lo to hi).filter(_ != i).map(sc)
      val avg = if (neigh.isEmpty) 0.0 else neigh.sum / neigh.size
      val ratio =
        if (avg > 1e-5) sc(i) / avg
        else if (sc(i) >= minContentVal) adaptiveThreshold // flat window, real jump
        else 0.0
      ratio >= adaptiveThreshold && sc(i) >= minContentVal
    }
    scenes(gated(cand, minSceneLen), fs.length, fps)
  }

  def detectThreshold(v: Array[Byte], threshold: Double, minSceneLen: Int,
      fadeBias: Double, addFinalScene: Boolean,
      method: String): Seq[SceneInfo] = {
    require(method == "floor" || method == "ceiling", s"bad method: $method")
    val (fs, fps) = frames(v)
    val avg = fs.map { img =>
      var s = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      s / (3.0 * img.getWidth * img.getHeight)
    }
    def inFade(i: Int): Boolean =
      if (method == "floor") avg(i) < threshold else avg(i) > threshold
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var fadeStart = -1
    var i = 0
    while (i < fs.length) {
      if (inFade(i) && fadeStart < 0) fadeStart = i
      else if (!inFade(i) && fadeStart >= 0) {
        // fade ended at frame i: place the cut inside [fadeStart, i] by bias
        // (-1 → fade-out start, 0 → midpoint, +1 → fade-in frame)
        cuts += fadeStart +
          math.round((i - fadeStart) * (1.0 + fadeBias) / 2.0).toInt
        fadeStart = -1
      }
      i += 1
    }
    if (addFinalScene && fadeStart > 0) cuts += fadeStart
    scenes(gated(cuts.toSeq.filter(_ > 0), minSceneLen), fs.length, fps)
  }

  private def yHistogram(img: BufferedImage, bins: Int): Array[Double] = {
    val h = new Array[Double](bins)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        val lum = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
          0.114 * (p & 0xff)
        h(math.min(bins - 1, (lum * bins / 256.0).toInt)) += 1.0
        x += 1
      }
      y += 1
    }
    val n = img.getWidth * img.getHeight
    if (n > 0) { var i = 0; while (i < bins) { h(i) /= n; i += 1 } }
    h
  }

  def detectHistogram(v: Array[Byte], threshold: Double, bins: Int,
      minSceneLen: Int): Seq[SceneInfo] = {
    val (fs, fps) = frames(v)
    val hists = fs.map(yHistogram(_, bins))
    val cand = (1 until fs.length).filter { i =>
      val (a, b) = (hists(i - 1), hists(i))
      var d = 0.0; var j = 0
      while (j < bins) { d += math.abs(a(j) - b(j)); j += 1 }
      d / 2.0 > threshold
    }
    scenes(gated(cand, minSceneLen), fs.length, fps)
  }

  /** DCT perceptual hash bits of one frame. */
  private[functions] def pHash(img: BufferedImage, size: Int,
      lowpass: Int): Array[Boolean] = {
    val d = size * lowpass
    // grayscale + bilinear resize to d×d in one pass
    val g = new Array[Double](d * d)
    val sx = img.getWidth.toDouble / d
    val sy = img.getHeight.toDouble / d
    var y = 0
    while (y < d) {
      var x = 0
      while (x < d) {
        val fx = math.min(img.getWidth - 1.0, x * sx)
        val fy = math.min(img.getHeight - 1.0, y * sy)
        val x0 = fx.toInt; val y0 = fy.toInt
        val x1 = math.min(img.getWidth - 1, x0 + 1)
        val y1 = math.min(img.getHeight - 1, y0 + 1)
        val ax = fx - x0; val ay = fy - y0
        def lum(px: Int, py: Int): Double = {
          val p = img.getRGB(px, py)
          0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
        }
        g(y * d + x) = lum(x0, y0) * (1 - ax) * (1 - ay) +
          lum(x1, y0) * ax * (1 - ay) + lum(x0, y1) * (1 - ax) * ay +
          lum(x1, y1) * ax * ay
        x += 1
      }
      y += 1
    }
    // 2-D DCT-II, keep only the top-left size×size block
    val block = new Array[Double](size * size)
    var u = 0
    while (u < size) {
      var w = 0
      while (w < size) {
        var s = 0.0
        var yy = 0
        while (yy < d) {
          var xx = 0
          while (xx < d) {
            s += g(yy * d + xx) *
              math.cos((2 * xx + 1) * u * math.Pi / (2.0 * d)) *
              math.cos((2 * yy + 1) * w * math.Pi / (2.0 * d))
            xx += 1
          }
          yy += 1
        }
        block(w * size + u) = s
        w += 1
      }
      u += 1
    }
    val sorted = block.sorted
    val med =
      if (block.length % 2 == 1) sorted(block.length / 2)
      else (sorted(block.length / 2 - 1) + sorted(block.length / 2)) / 2.0
    block.map(_ > med)
  }

  def detectHash(v: Array[Byte], threshold: Double, size: Int, lowpass: Int,
      minSceneLen: Int): Seq[SceneInfo] = {
    val (fs, fps) = frames(v)
    val hashes = fs.map(pHash(_, size, lowpass))
    val cand = (1 until fs.length).filter { i =>
      val (a, b) = (hashes(i - 1), hashes(i))
      var ham = 0; var j = 0
      while (j < a.length) { if (a(j) != b(j)) ham += 1; j += 1 }
      ham.toDouble / (size * size) > threshold
    }
    scenes(gated(cand, minSceneLen), fs.length, fps)
  }

  // ---- Spark surface (reference defaults) -----------------------------

  val sceneDetectContentUdf = udf {
    (v: Array[Byte], threshold: Double, minSceneLen: Int, lumaOnly: Boolean) =>
      detectContent(v, threshold, minSceneLen, lumaOnly)
  }

  val sceneDetectAdaptiveUdf = udf {
    (v: Array[Byte], adaptiveThreshold: Double, minSceneLen: Int,
        windowWidth: Int, minContentVal: Double) =>
      detectAdaptive(v, adaptiveThreshold, minSceneLen, windowWidth,
        minContentVal)
  }

  val sceneDetectThresholdUdf = udf {
    (v: Array[Byte], threshold: Double, minSceneLen: Int, fadeBias: Double,
        addFinalScene: Boolean, method: String) =>
      detectThreshold(v, threshold, minSceneLen, fadeBias, addFinalScene,
        method)
  }

  val sceneDetectHistogramUdf = udf {
    (v: Array[Byte], threshold: Double, bins: Int, minSceneLen: Int) =>
      detectHistogram(v, threshold, bins, minSceneLen)
  }

  val sceneDetectHashUdf = udf {
    (v: Array[Byte], threshold: Double, size: Int, lowpass: Int,
        minSceneLen: Int) =>
      detectHash(v, threshold, size, lowpass, minSceneLen)
  }
}
