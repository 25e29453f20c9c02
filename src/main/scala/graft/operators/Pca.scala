package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column (the classic covariance-eigen
  * route — one pass + tiny driver solve; the dimensionality-reduction
  * sibling of the reference's embedding-index surfaces, e.g.
  * `similarity()` over `Array[Float]` columns).
  *
  * Scale shape: `fit` is ONE `treeAggregate` packing
  * (n, Σx, upper-tri Σxxᵀ) — d(d+3)/2 + 1 doubles per partition, so the
  * driver holds O(d²) state independent of row count (d=4096 → 32 MB);
  * the eigen-solve is cyclic Jacobi on the d×d symmetric covariance,
  * milliseconds for embedding-sized d. `project` is PURE Column
  * composition (zip_with/aggregate dot products against literal
  * component vectors — whole-stage codegen, map-only, no shuffle), so
  * the transform inherits parquet pushdown and pipelines into any
  * downstream operator.
  */
object Pca {

  /** Principal components in DESCENDING eigenvalue order; `components(j)`
    * is the j-th eigenvector (length `dim`, unit norm). `trace` is the
    * total population variance (Σ per-dimension variance).
    */
  final case class Model(dim: Int, n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]],
      trace: Double) {
    def varianceFraction(k: Int): Double =
      if (trace <= 0) 0.0 else eigenvalues.take(k).sum / trace
  }

  /** One-pass covariance + driver-side Jacobi eigen-decomposition. */
  def fit(df: DataFrame, embCol: String): Model = {
    val d = df.select(size(col(embCol))).head().getInt(0)
    require(d > 0, s"empty embedding column $embCol")
    val data = df.select(col(embCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    val len = 1 + d + d * (d + 1) / 2
    val acc = data.treeAggregate(new Array[Double](len))(
      seqOp = { (a, v) =>
        require(v.length == d, s"ragged embedding: ${v.length} != $d")
        a(0) += 1
        var i = 0
        while (i < d) { a(1 + i) += v(i); i += 1 }
        var idx = 1 + d
        var r = 0
        while (r < d) {
          val vr = v(r)
          var c = r
          while (c < d) { a(idx) += vr * v(c); c += 1; idx += 1 }
          r += 1
        }
        a
      },
      combOp = { (a, b) =>
        var i = 0
        while (i < len) { a(i) += b(i); i += 1 }
        a
      },
      depth = 2)
    val n = acc(0).toLong
    require(n > 1, s"need >1 rows to fit PCA, got $n")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var idx = 1 + d
    var r = 0
    while (r < d) {
      var c = r
      while (c < d) {
        val v = acc(idx) / n - mean(r) * mean(c)
        cov(r)(c) = v; cov(c)(r) = v
        c += 1; idx += 1
      }
      r += 1
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val (eigs, vecs) = jacobiEigSym(cov)
    Model(d, n, mean, eigs, vecs, trace)
  }

  /** Project onto the top-k components: adds `outCol` =
    * array((x−mean)·v₁, …, (x−mean)·vₖ). Map-only Column composition —
    * the mean offset folds into a per-component constant so each
    * coordinate is one codegen'd dot product.
    */
  def project(df: DataFrame, embCol: String, model: Model, k: Int,
      outCol: String = "pca"): DataFrame = {
    require(k >= 1 && k <= model.dim, s"k=$k out of range 1..${model.dim}")
    val xs = col(embCol).cast("array<double>")
    val coords: Seq[Column] = (0 until k).map { j =>
      val vj = model.components(j)
      val offset = dot(model.mean, vj)
      aggregate(zip_with(xs, typedLit(vj.toSeq), (a, b) => a * b),
        lit(0.0), (s, e) => s + e) - lit(offset)
    }
    df.withColumn(outCol, array(coords: _*))
  }

  /** Reconstruct from the top-k projection: mean + Σⱼ projⱼ·vⱼ. */
  def reconstruct(df: DataFrame, projCol: String, model: Model, k: Int,
      outCol: String = "recon"): DataFrame = {
    val comps = typedLit((0 until k).map(j => model.components(j).toSeq))
    val meanL = typedLit(model.mean.toSeq)
    // out[i] = mean[i] + Σ_j proj[j] * comp[j][i]
    val recon = zip_with(meanL, sequence(lit(0), lit(model.dim - 1)),
      (m, i) => m + aggregate(
        zip_with(col(projCol), comps, (p, c) => p * element_at(c, i + 1)),
        lit(0.0), (s, e) => s + e))
    df.withColumn(outCol, recon)
  }

  private[graft] def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cyclic Jacobi for symmetric matrices: rotations until the
    * off-diagonal mass vanishes. Returns (eigenvalues, eigenvectors)
    * sorted by descending eigenvalue; eigenvectors are rows of the
    * result (each length d, orthonormal).
    */
  private[operators] def jacobiEigSym(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(1e-300,
      (0 until d).map(i => math.abs(a(i)(i))).max)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (offDiag() > 1e-24 * scale * scale && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
              case s0  => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eigs = order.map(i => a(i)(i)).toArray
    val vecs = order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray
    (eigs, vecs)
  }
}
