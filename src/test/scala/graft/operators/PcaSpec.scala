package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def almost(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("jacobi eigen solves a known symmetric matrix") {
    // [[2,1],[1,2]] -> eigenvalues 3,1 with vectors (1,1)/√2, (1,-1)/√2
    val (e, v) = Pca.jacobiEigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(almost(e(0), 3.0) && almost(e(1), 1.0))
    assert(almost(math.abs(v(0)(0)), 1 / math.sqrt(2), 1e-9))
    assert(almost(math.abs(Pca.dot(v(0), v(1))), 0.0, 1e-9))
  }

  test("fit recovers axis-aligned variances on separable data") {
    // axis 0 has variance 25, axis 1 has 4, axis 2 constant
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { _ =>
      (Seq(5.0 * rnd.nextGaussian() + 10, 2.0 * rnd.nextGaussian() - 3, 1.5))
    }
    val df = rows.toDF("embedding")
    val m = Pca.fit(df, "embedding")
    assert(m.dim == 3 && m.n == 400)
    assert(almost(m.mean(2), 1.5, 1e-12))
    // top component aligns with axis 0, second with axis 1, third eigen ~0
    assert(math.abs(m.components(0)(0)) > 0.99)
    assert(math.abs(m.components(1)(1)) > 0.99)
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(2) < 1e-9)
    // eigen sum == trace
    assert(almost(m.eigenvalues.sum, m.trace, 1e-9))
    // variance along axes matches the eigenvalues (sample population var)
    val stats = df.select(
      sum(element_at($"embedding", 1)), sum(element_at($"embedding", 1) * element_at($"embedding", 1))).head()
    val v0 = stats.getDouble(1) / 400 - math.pow(stats.getDouble(0) / 400, 2)
    // sample cross-covariance (~N^-1/2) rotates the top component slightly
    // off-axis, so λ0 only approximates the axis variance; the EXACT
    // λ == projection-variance identity is pinned in the next test.
    assert(almost(m.eigenvalues(0), v0, 5e-3))
  }

  test("projection variance equals eigenvalues; reconstruction identity holds") {
    val rnd = new scala.util.Random(11)
    // correlated 4-d data
    val rows = (0 until 300).map { _ =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      Seq(3 * a + b, a - b, 0.5 * b + 1, a + 0.1 * rnd.nextGaussian())
    }
    val df = rows.toDF("embedding")
    val m = Pca.fit(df, "embedding")
    val k = 2
    val proj = Pca.project(df, "embedding", m, k).persist()
    // var_pop of each projected coordinate == eigenvalue j
    (0 until k).foreach { j =>
      val c = element_at(col("pca"), j + 1)
      val r = proj.agg(sum(c), sum(c * c)).head()
      val vp = r.getDouble(1) / m.n - math.pow(r.getDouble(0) / m.n, 2)
      assert(almost(vp, m.eigenvalues(j), 1e-7))
    }
    // mean squared reconstruction error == sum of residual eigenvalues
    val rec = Pca.reconstruct(proj, "pca", m, k)
    val err = rec.select(
      aggregate(zip_with(col("embedding").cast("array<double>"), col("recon"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (s, e) => s + e).as("e"))
      .agg(sum("e")).head().getDouble(0) / m.n
    assert(almost(err, m.eigenvalues.drop(k).sum, 1e-7))
    proj.unpersist(false)
    ()
  }

  test("components are orthonormal on real testdata embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.fit(df, "embedding")
    assert(m.dim == 64)
    val maxDev = (for { i <- 0 until 8; j <- i until 8 } yield
      math.abs(Pca.dot(m.components(i), m.components(j)) - (if (i == j) 1 else 0))).max
    assert(maxDev < 1e-8, s"orthonormality deviation $maxDev")
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.varianceFraction(8) > 0 && m.varianceFraction(8) <= 1 + 1e-12)
  }
}
