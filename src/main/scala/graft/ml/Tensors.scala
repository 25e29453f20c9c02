package graft.ml

/** Dense row-major float tensor plus the handful of kernels a transformer
  * encoder forward pass needs (linear, layernorm, softmax, gelu).
  *
  * This is the executor-side compute core for local-model inference (the
  * reference's `functions/huggingface.py:32-110` sentence_transformer runs
  * torch in-process; here the forward pass is hand-rolled JVM float math so
  * inference needs no native libs and no egress). Weights are small
  * relative to data (tens-to-hundreds of MB) and are broadcast once per
  * executor; all math below is per-batch, allocation-conscious, and
  * accumulates in Double so results are independent of batch grouping.
  */
final case class Tensor(shape: Array[Int], data: Array[Float]) extends Serializable {
  def rank: Int = shape.length
  def size: Long = shape.foldLeft(1L)(_ * _.toLong)
  def rows: Int = { require(rank == 2, s"rank-2 expected, got ${rank}"); shape(0) }
  def cols: Int = { require(rank == 2, s"rank-2 expected, got ${rank}"); shape(1) }
  def apply(i: Int, j: Int): Float = data(i * shape(1) + j)
  require(size == data.length.toLong,
    s"shape ${shape.mkString("x")} != data length ${data.length}")
}

object Tensors {

  /** SIMD tile kernel if the incubator vector module is loadable (the
    * build passes --add-modules; a JVM without it just runs scalar).
    * The LinkageError guard keeps `Tensors` loadable either way.
    */
  private val vectorTile: VectorGemm =
    try { val v = new VectorGemm; if (v.usable) v else null }
    catch { case _: LinkageError => null }

  /** Which GEMM path is active — surfaced for diagnostics/COVERAGE. */
  def gemmBackend: String =
    if (vectorTile != null) "vector-api" else "scalar-blocked"

  /** y[m, out] = x[m, in] · Wᵀ + b, with W stored [out, in] — the
    * torch/HF `nn.Linear` weight convention, so safetensors load untransposed.
    *
    * Row-blocked (8-row tiles, one accumulator per row): each (row, out)
    * pair still accumulates over k STRICTLY sequentially in Double, so
    * results are bit-identical to the naive triple loop for any batch
    * size/padding (the ml specs pin this) — but the eight independent
    * accumulator chains break the FP-add latency dependency (the naive
    * loop's real bottleneck) and each weight row is streamed once per
    * 8 input rows instead of once per row, an 8× cut in W traffic when
    * W exceeds cache (production-sized checkpoints).
    */
  def linear(x: Array[Float], m: Int, in: Int, w: Tensor, b: Tensor): Array[Float] = {
    require(w.cols == in, s"linear: weight in-dim ${w.cols} != input ${in}")
    val out = w.rows
    require(b.data.length == out, s"linear: bias ${b.data.length} != out ${out}")
    val y = new Array[Float](m * out)
    val wd = w.data
    // packed tile: xt(k*8 + r) = row r's k-th input, pre-widened — the 8
    // per-k loads become one contiguous 64-byte run and the float→double
    // conversion happens once per element instead of once per output
    val xt = new Array[Double](in * 8)
    var i = 0
    while (i + 8 <= m) {
      var r = 0
      while (r < 8) {
        val xOff = (i + r) * in
        var k = 0
        while (k < in) { xt(k * 8 + r) = x(xOff + k).toDouble; k += 1 }
        r += 1
      }
      var o = 0
      if (vectorTile != null) {
        val acc = new Array[Double](8)
        while (o < out) {
          vectorTile.tile8(xt, wd, o * in, in, b.data(o).toDouble, acc)
          val yOff = i * out + o
          var r = 0
          while (r < 8) { y(yOff + r * out) = acc(r).toFloat; r += 1 }
          o += 1
        }
      } else while (o < out) {
        val wOff = o * in
        val bias = b.data(o).toDouble
        var a0 = bias; var a1 = bias; var a2 = bias; var a3 = bias
        var a4 = bias; var a5 = bias; var a6 = bias; var a7 = bias
        var k = 0
        var kk = 0
        while (k < in) {
          val wv = wd(wOff + k).toDouble
          a0 += xt(kk) * wv
          a1 += xt(kk + 1) * wv
          a2 += xt(kk + 2) * wv
          a3 += xt(kk + 3) * wv
          a4 += xt(kk + 4) * wv
          a5 += xt(kk + 5) * wv
          a6 += xt(kk + 6) * wv
          a7 += xt(kk + 7) * wv
          k += 1; kk += 8
        }
        val yOff = i * out + o
        y(yOff) = a0.toFloat; y(yOff + out) = a1.toFloat
        y(yOff + 2 * out) = a2.toFloat; y(yOff + 3 * out) = a3.toFloat
        y(yOff + 4 * out) = a4.toFloat; y(yOff + 5 * out) = a5.toFloat
        y(yOff + 6 * out) = a6.toFloat; y(yOff + 7 * out) = a7.toFloat
        o += 1
      }
      i += 8
    }
    // remainder rows: the reference naive loop (same per-element order)
    while (i < m) {
      val xOff = i * in
      var o = 0
      while (o < out) {
        val wOff = o * in
        var acc: Double = b.data(o)
        var k = 0
        while (k < in) {
          acc += x(xOff + k).toDouble * wd(wOff + k)
          k += 1
        }
        y(i * out + o) = acc.toFloat
        o += 1
      }
      i += 1
    }
    y
  }

  /** The pre-blocking triple loop, kept PRIVATE as the bit-identity and
    * speedup reference for TensorsGemmSpec — not called by models.
    */
  private[ml] def linearNaive(x: Array[Float], m: Int, in: Int, w: Tensor,
      b: Tensor): Array[Float] = {
    val out = w.rows
    val y = new Array[Float](m * out)
    var i = 0
    while (i < m) {
      val xOff = i * in
      var o = 0
      while (o < out) {
        val wOff = o * in
        var acc: Double = b.data(o)
        var k = 0
        while (k < in) {
          acc += x(xOff + k).toDouble * w.data(wOff + k)
          k += 1
        }
        y(i * out + o) = acc.toFloat
        o += 1
      }
      i += 1
    }
    y
  }

  /** In-place row-wise layer norm over trailing dim `h` with learned
    * gamma/beta (biased variance, like torch LayerNorm).
    */
  def layerNorm(x: Array[Float], m: Int, h: Int, gamma: Tensor, beta: Tensor,
      eps: Double): Unit = {
    require(gamma.data.length == h && beta.data.length == h, "layerNorm dims")
    var i = 0
    while (i < m) {
      val off = i * h
      var sum = 0.0; var k = 0
      while (k < h) { sum += x(off + k); k += 1 }
      val mean = sum / h
      var varSum = 0.0; k = 0
      while (k < h) { val d = x(off + k) - mean; varSum += d * d; k += 1 }
      val inv = 1.0 / math.sqrt(varSum / h + eps)
      k = 0
      while (k < h) {
        x(off + k) = ((x(off + k) - mean) * inv * gamma.data(k) + beta.data(k)).toFloat
        k += 1
      }
      i += 1
    }
  }

  /** Exact (erf-based) GELU, the BERT default (`gelu`, not `gelu_new`). */
  def gelu(x: Array[Float]): Unit = {
    var i = 0
    while (i < x.length) {
      val v = x(i).toDouble
      x(i) = (v * 0.5 * (1.0 + erf(v / 1.4142135623730951))).toFloat
      i += 1
    }
  }

  /** y[m, out] = x[m, in] · W + b with W stored [in, out] — the GPT-2
    * `Conv1D` convention (transposed relative to `nn.Linear`).
    *
    * Row-blocked like `linear` (4-row tiles here — the per-row state is
    * a full `out`-sized Double accumulator array, so the tile is kept
    * small to stay inside L2): per (row, out) accumulation remains
    * strictly k-sequential (bit-identical to the naive loop), while W
    * streams once per 4 rows instead of once per row.
    */
  def linearT(x: Array[Float], m: Int, in: Int, w: Tensor, b: Tensor): Array[Float] = {
    require(w.rows == in, s"linearT: weight in-dim ${w.rows} != input $in")
    val out = w.cols
    require(b.data.length == out, s"linearT: bias ${b.data.length} != out $out")
    val y = new Array[Float](m * out)
    val wd = w.data
    val useVec = vectorTile != null && vectorTile.usableT
    val a0 = new Array[Double](if (useVec) 32 else out)
    val a1 = new Array[Double](if (useVec) 0 else out)
    val a2 = new Array[Double](if (useVec) 0 else out)
    val a3 = new Array[Double](if (useVec) 0 else out)
    var i = 0
    while (i + 4 <= m) {
      val x0 = i * in; val x1 = x0 + in; val x2 = x1 + in; val x3 = x2 + in
      if (useVec) {
        // 8-column chunks, accumulators in vector registers
        var o = 0
        while (o + 8 <= out) {
          vectorTile.tileT4x8(x, x0, x1, x2, x3, wd, in, out, o, b.data, a0)
          val yOff = i * out + o
          var j = 0
          while (j < 8) {
            y(yOff + j) = a0(j).toFloat
            y(yOff + out + j) = a0(8 + j).toFloat
            y(yOff + 2 * out + j) = a0(16 + j).toFloat
            y(yOff + 3 * out + j) = a0(24 + j).toFloat
            j += 1
          }
          o += 8
        }
        while (o < out) { // column remainder, scalar
          var r = 0
          while (r < 4) {
            val xOff = (i + r) * in
            var acc: Double = b.data(o)
            var k = 0
            while (k < in) { acc += x(xOff + k).toDouble * wd(k * out + o); k += 1 }
            y((i + r) * out + o) = acc.toFloat
            r += 1
          }
          o += 1
        }
      } else {
        var o = 0
        while (o < out) {
          val bias = b.data(o).toDouble
          a0(o) = bias; a1(o) = bias; a2(o) = bias; a3(o) = bias
          o += 1
        }
        var k = 0
        while (k < in) {
          val v0 = x(x0 + k).toDouble; val v1 = x(x1 + k).toDouble
          val v2 = x(x2 + k).toDouble; val v3 = x(x3 + k).toDouble
          val wOff = k * out
          o = 0
          while (o < out) {
            val wv = wd(wOff + o).toDouble
            a0(o) += v0 * wv; a1(o) += v1 * wv
            a2(o) += v2 * wv; a3(o) += v3 * wv
            o += 1
          }
          k += 1
        }
        val yOff = i * out
        o = 0
        while (o < out) {
          y(yOff + o) = a0(o).toFloat
          y(yOff + out + o) = a1(o).toFloat
          y(yOff + 2 * out + o) = a2(o).toFloat
          y(yOff + 3 * out + o) = a3(o).toFloat
          o += 1
        }
      }
      i += 4
    }
    if (i < m) { // row remainder: the naive per-row loop
      val acc = new Array[Double](out)
      while (i < m) {
        val xOff = i * in
        val yOff = i * out
        var o = 0
        while (o < out) { acc(o) = b.data(o); o += 1 }
        var k = 0
        while (k < in) {
          val xv = x(xOff + k).toDouble
          val wOff = k * out
          o = 0
          while (o < out) { acc(o) += xv * wd(wOff + o); o += 1 }
          k += 1
        }
        o = 0
        while (o < out) { y(yOff + o) = acc(o).toFloat; o += 1 }
        i += 1
      }
    }
    y
  }

  /** Pre-blocking linearT, private speedup/bit-identity reference. */
  private[ml] def linearTNaive(x: Array[Float], m: Int, in: Int, w: Tensor,
      b: Tensor): Array[Float] = {
    val out = w.cols
    val y = new Array[Float](m * out)
    val acc = new Array[Double](out)
    var i = 0
    while (i < m) {
      val xOff = i * in
      val yOff = i * out
      var o = 0
      while (o < out) { acc(o) = b.data(o); o += 1 }
      var k = 0
      while (k < in) {
        val xv = x(xOff + k).toDouble
        val wOff = k * out
        o = 0
        while (o < out) { acc(o) += xv * w.data(wOff + o); o += 1 }
        k += 1
      }
      o = 0
      while (o < out) { y(yOff + o) = acc(o).toFloat; o += 1 }
      i += 1
    }
    y
  }

  /** GPT-2's `gelu_new`: 0.5x(1 + tanh(√(2/π)(x + 0.044715x³))). */
  def geluNew(x: Array[Float]): Unit = {
    val c = math.sqrt(2.0 / math.Pi)
    var i = 0
    while (i < x.length) {
      val v = x(i).toDouble
      x(i) = (0.5 * v * (1.0 + math.tanh(c * (v + 0.044715 * v * v * v)))).toFloat
      i += 1
    }
  }

  /** CLIP's `quick_gelu`: x · sigmoid(1.702 x). */
  def quickGelu(x: Array[Float]): Unit = {
    var i = 0
    while (i < x.length) {
      val v = x(i).toDouble
      x(i) = (v / (1.0 + math.exp(-1.702 * v))).toFloat
      i += 1
    }
  }

  /** erf via the Numerical-Recipes erfc rational approximation
    * (|error| < 1.2e-7 everywhere — well under float32 resolution).
    */
  def erf(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val erfc = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 +
      t * (0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (-1.13520398 +
      t * (1.48851587 + t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) 1.0 - erfc else erfc - 1.0
  }

  /** In-place softmax over each row of an [m, n] block (max-subtracted). */
  def softmaxRows(x: Array[Float], m: Int, n: Int): Unit = {
    var i = 0
    while (i < m) {
      val off = i * n
      var mx = Float.NegativeInfinity; var k = 0
      while (k < n) { if (x(off + k) > mx) mx = x(off + k); k += 1 }
      var sum = 0.0; k = 0
      while (k < n) {
        val e = math.exp((x(off + k) - mx).toDouble); x(off + k) = e.toFloat
        sum += e; k += 1
      }
      val inv = 1.0 / sum; k = 0
      while (k < n) { x(off + k) = (x(off + k) * inv).toFloat; k += 1 }
      i += 1
    }
  }

  def tanhInPlace(x: Array[Float]): Unit = {
    var i = 0
    while (i < x.length) { x(i) = math.tanh(x(i).toDouble).toFloat; i += 1 }
  }

  /** a += b elementwise (residual connections). */
  def addInPlace(a: Array[Float], b: Array[Float]): Unit = {
    require(a.length == b.length, "addInPlace length mismatch")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
  }

  def l2NormalizeInPlace(v: Array[Float]): Unit = {
    var sum = 0.0; var i = 0
    while (i < v.length) { sum += v(i).toDouble * v(i); i += 1 }
    if (sum > 0) {
      val inv = 1.0 / math.sqrt(sum); i = 0
      while (i < v.length) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
  }

  // -------------------------------------------------------------------
  // Convolutional kernels (the ResNet backbone a DETR tower sits on)
  // -------------------------------------------------------------------

  /** 2-D convolution over one CHW image. `w` is the torch layout
    * [cout, cin, kh, kw]; `b` may be null (HF ResNet convs are
    * bias-free, batchnorm supplies the shift). Zero padding, Double
    * accumulation. Returns (out, outH, outW) with out in CHW.
    */
  def conv2d(x: Array[Float], cin: Int, h: Int, wIn: Int, w: Tensor,
      b: Tensor, stride: Int, pad: Int): (Array[Float], Int, Int) = {
    require(w.rank == 4 && w.shape(1) == cin,
      s"conv2d: weight ${w.shape.mkString("x")} vs cin $cin")
    val cout = w.shape(0); val kh = w.shape(2); val kw = w.shape(3)
    val oh = (h + 2 * pad - kh) / stride + 1
    val ow = (wIn + 2 * pad - kw) / stride + 1
    require(oh > 0 && ow > 0, s"conv2d: output ${oh}x$ow empty (input ${h}x$wIn)")
    val y = new Array[Float](cout * oh * ow)
    var oc = 0
    while (oc < cout) {
      val bias = if (b == null) 0.0 else b.data(oc).toDouble
      var oy = 0
      while (oy < oh) {
        val iy0 = oy * stride - pad
        var ox = 0
        while (ox < ow) {
          val ix0 = ox * stride - pad
          var acc = bias
          var ic = 0
          while (ic < cin) {
            val xBase = ic * h * wIn
            val wBase = (oc * cin + ic) * kh * kw
            var ky = 0
            while (ky < kh) {
              val iy = iy0 + ky
              if (iy >= 0 && iy < h) {
                val xRow = xBase + iy * wIn
                val wRow = wBase + ky * kw
                var kx = 0
                while (kx < kw) {
                  val ix = ix0 + kx
                  if (ix >= 0 && ix < wIn) acc += x(xRow + ix).toDouble * w.data(wRow + kx)
                  kx += 1
                }
              }
              ky += 1
            }
            ic += 1
          }
          y(oc * oh * ow + oy * ow + ox) = acc.toFloat
          ox += 1
        }
        oy += 1
      }
      oc += 1
    }
    (y, oh, ow)
  }

  /** In-place inference-mode (frozen) batchnorm over a CHW block:
    * y = (x - mean) / sqrt(var + eps) * gamma + beta per channel — the
    * DetrFrozenBatchNorm2d semantics.
    */
  def batchNorm2d(x: Array[Float], c: Int, hw: Int, gamma: Tensor, beta: Tensor,
      mean: Tensor, variance: Tensor, eps: Double): Unit = {
    require(gamma.data.length == c && mean.data.length == c, "batchNorm2d dims")
    var ch = 0
    while (ch < c) {
      val scale = gamma.data(ch) / math.sqrt(variance.data(ch).toDouble + eps)
      val shift = beta.data(ch) - mean.data(ch) * scale
      val off = ch * hw
      var i = 0
      while (i < hw) { x(off + i) = (x(off + i) * scale + shift).toFloat; i += 1 }
      ch += 1
    }
  }

  def reluInPlace(x: Array[Float]): Unit = {
    var i = 0
    while (i < x.length) { if (x(i) < 0f) x(i) = 0f; i += 1 }
  }

  /** Max-pool one CHW image (zero-pad cells never win: pads are -Inf). */
  def maxPool2d(x: Array[Float], c: Int, h: Int, w: Int, k: Int, stride: Int,
      pad: Int): (Array[Float], Int, Int) = {
    val oh = (h + 2 * pad - k) / stride + 1
    val ow = (w + 2 * pad - k) / stride + 1
    val y = new Array[Float](c * oh * ow)
    var ch = 0
    while (ch < c) {
      val base = ch * h * w
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var mx = Float.NegativeInfinity
          var ky = 0
          while (ky < k) {
            val iy = oy * stride - pad + ky
            if (iy >= 0 && iy < h) {
              var kx = 0
              while (kx < k) {
                val ix = ox * stride - pad + kx
                if (ix >= 0 && ix < w) { val v = x(base + iy * w + ix); if (v > mx) mx = v }
                kx += 1
              }
            }
            ky += 1
          }
          y(ch * oh * ow + oy * ow + ox) = mx
          ox += 1
        }
        oy += 1
      }
      ch += 1
    }
    (y, oh, ow)
  }

  /** In-place GroupNorm over a CHW block: channels split into `groups`
    * contiguous groups, each normalized over (c/groups)·H·W elements,
    * then scaled/shifted per channel (torch.nn.GroupNorm inference).
    */
  def groupNorm(x: Array[Float], c: Int, hw: Int, groups: Int, gamma: Tensor,
      beta: Tensor, eps: Double): Unit = {
    require(c % groups == 0, s"groupNorm: $c channels not divisible by $groups")
    val per = c / groups
    var g = 0
    while (g < groups) {
      val off = g * per * hw
      val n = per * hw
      var sum = 0.0
      var i = 0
      while (i < n) { sum += x(off + i); i += 1 }
      val mean = sum / n
      var vs = 0.0
      i = 0
      while (i < n) { val d = x(off + i) - mean; vs += d * d; i += 1 }
      val inv = 1.0 / math.sqrt(vs / n + eps)
      var ch = 0
      while (ch < per) {
        val cAbs = g * per + ch
        val scale = gamma.data(cAbs) * inv
        val shift = beta.data(cAbs) - mean * scale
        val base = off + ch * hw
        i = 0
        while (i < hw) { x(base + i) = (x(base + i) * scale + shift).toFloat; i += 1 }
        ch += 1
      }
      g += 1
    }
  }

  /** Nearest-neighbor resize of a CHW block to (oh, ow) — PyTorch
    * `interpolate(mode="nearest")`: src index = floor(dst · in/out).
    */
  def resizeNearest(x: Array[Float], c: Int, h: Int, w: Int, oh: Int,
      ow: Int): Array[Float] = {
    val y = new Array[Float](c * oh * ow)
    val sy = h.toDouble / oh
    val sx = w.toDouble / ow
    var ch = 0
    while (ch < c) {
      var oy = 0
      while (oy < oh) {
        val iy = math.min(h - 1, (oy * sy).toInt)
        var ox = 0
        while (ox < ow) {
          val ix = math.min(w - 1, (ox * sx).toInt)
          y((ch * oh + oy) * ow + ox) = x((ch * h + iy) * w + ix)
          ox += 1
        }
        oy += 1
      }
      ch += 1
    }
    y
  }

  /** Bilinear resize of one HW plane to (oh, ow) — PyTorch
    * `interpolate(mode="bilinear", align_corners=False)`:
    * src = (dst + 0.5) · in/out − 0.5, edge-clamped.
    */
  def resizeBilinear(x: Array[Float], h: Int, w: Int, oh: Int,
      ow: Int): Array[Float] = {
    val y = new Array[Float](oh * ow)
    val sy = h.toDouble / oh
    val sx = w.toDouble / ow
    var oy = 0
    while (oy < oh) {
      val fy = math.max(0.0, (oy + 0.5) * sy - 0.5)
      val y0 = math.min(h - 1, fy.toInt)
      val y1 = math.min(h - 1, y0 + 1)
      val wy = fy - y0
      var ox = 0
      while (ox < ow) {
        val fx = math.max(0.0, (ox + 0.5) * sx - 0.5)
        val x0 = math.min(w - 1, fx.toInt)
        val x1 = math.min(w - 1, x0 + 1)
        val wx = fx - x0
        y(oy * ow + ox) = ((x(y0 * w + x0) * (1 - wx) + x(y0 * w + x1) * wx) * (1 - wy) +
          (x(y1 * w + x0) * (1 - wx) + x(y1 * w + x1) * wx) * wy).toFloat
        ox += 1
      }
      oy += 1
    }
    y
  }

  def sigmoidInPlace(x: Array[Float]): Unit = {
    var i = 0
    while (i < x.length) { x(i) = (1.0 / (1.0 + math.exp(-x(i).toDouble))).toFloat; i += 1 }
  }
}
