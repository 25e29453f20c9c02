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

  /** y[m, out] = x[m, in] · Wᵀ + b, with W stored [out, in] — the
    * torch/HF `nn.Linear` weight convention, so safetensors load untransposed.
    */
  def linear(x: Array[Float], m: Int, in: Int, w: Tensor, b: Tensor): Array[Float] = {
    require(w.cols == in, s"linear: weight in-dim ${w.cols} != input ${in}")
    val out = w.rows
    require(b.data.length == out, s"linear: bias ${b.data.length} != out ${out}")
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
    */
  def linearT(x: Array[Float], m: Int, in: Int, w: Tensor, b: Tensor): Array[Float] = {
    require(w.rows == in, s"linearT: weight in-dim ${w.rows} != input $in")
    val out = w.cols
    require(b.data.length == out, s"linearT: bias ${b.data.length} != out $out")
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
}
