package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ: ADC score vs naive decode-then-dot, deterministic training,
  * perfect recall on separable data, full-probe+full-rerank == brute
  * force, and compression accounting.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  /** 4 well-separated clusters on distinct axes + small deterministic noise */
  private def clustered(n: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      val c = i % 4
      val v = Array.tabulate(dim)(j =>
        (if (j / (dim / 4) == c) 10.0 else 0.0) +
          ((i * 31 + j * 17) % 7 - 3) * 0.05)
      (i.toLong, v.toSeq)
    }

  test("ADC score equals naive decode-then-dot on every vector") {
    val data = clustered(80)
    val df = data.toDF("vec_id", "embedding")
    val model = Pq.build(df, "embedding", "vec_id", kc = 4, m = 4, ks = 8)
    val q = Array.tabulate(dim)(j => math.sin(j + 1.0))
    val qn = { val n = math.sqrt(q.map(x => x * x).sum); q.map(_ / n) }
    val ds = dim / model.m
    data.foreach { case (_, v0) =>
      val vn = { val n = math.sqrt(v0.map(x => x * x).sum); v0.map(_ / n).toArray }
      val (cell, code) = Pq.encodeVec(model, v0.toArray)
      // naive: reconstruct = coarse centroid + per-subspace codeword, dot q
      val rec = model.coarse(cell).clone()
      for (mi <- 0 until model.m; i <- 0 until ds)
        rec(mi * ds + i) += model.codebooks(mi)(code(mi) & 0xff)(i)
      val naive = rec.zip(qn).map { case (a, b) => a * b }.sum
      // ADC: cell dot + LUT sum (same decomposition, factored)
      val adc = model.coarse(cell).zip(qn).map { case (a, b) => a * b }.sum +
        (0 until model.m).map { mi =>
          (0 until ds).map(i =>
            qn(mi * ds + i) * model.codebooks(mi)(code(mi) & 0xff)(i)).sum
        }.sum
      assert(math.abs(adc - naive) < 1e-9)
      // quantization is lossy but bounded on this data: the
      // reconstruction stays close to the true unit vector
      val err = math.sqrt(rec.zip(vn).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(err < 0.5, s"reconstruction error $err")
    }
  }

  test("training is deterministic; codes are M bytes") {
    val df = clustered(60).toDF("vec_id", "embedding")
    val m1 = Pq.build(df, "embedding", "vec_id", kc = 4, m = 4, ks = 8)
    val m2 = Pq.build(df, "embedding", "vec_id", kc = 4, m = 4, ks = 8)
    assert(m1.coarse.map(_.toSeq).toSeq == m2.coarse.map(_.toSeq).toSeq)
    assert(m1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      m2.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = Pq.encode(df, "embedding", "vec_id", m1)
    assert(codes.select(length(col("code"))).distinct().as[Int].collect()
      .toSeq == Seq(4))
    assert(codes.count() == 60)
  }

  test("separable clusters: IVFPQ top-10 equals brute force exactly") {
    val data = clustered(120)
    val df = data.toDF("vec_id", "embedding")
    val model = Pq.build(df, "embedding", "vec_id", kc = 4, m = 4, ks = 8)
    val codes = Pq.encode(df, "embedding", "vec_id", model)
    // query near cluster 1's axis
    val q = Array.tabulate(dim)(j => if (j / (dim / 4) == 1) 1.0 else 0.01).toSeq
    val got = Pq.search(df, codes, "embedding", "vec_id", model, q,
      k = 10, nprobe = 2, rerank = 40)
      .select("vec_id").as[Long].collect().toSeq
    val brute = df.select(col("vec_id"),
        aggregate(zip_with(ExactAnn.normalized(col("embedding")),
          array({ val n = math.sqrt(q.map(x => x * x).sum)
            q.map(x => lit(x / n)) }: _*),
          (x, y) => x * y), lit(0.0), (a, x) => a + x).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == brute)
  }

  test("full probe + full rerank degenerates to exact brute force on any data") {
    val rnd = new scala.util.Random(42)
    val data = (0 until 90).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
    val df = data.toDF("vec_id", "embedding")
    val model = Pq.build(df, "embedding", "vec_id", kc = 3, m = 4, ks = 8)
    val codes = Pq.encode(df, "embedding", "vec_id", model)
    val q = Seq.fill(dim)(rnd.nextGaussian())
    val got = Pq.search(df, codes, "embedding", "vec_id", model, q,
      k = 5, nprobe = 3, rerank = 90) // all cells, all candidates
      .select("vec_id").as[Long].collect().toSeq
    val qn = { val n = math.sqrt(q.map(x => x * x).sum); q.map(_ / n) }
    val brute = df.select(col("vec_id"),
        aggregate(zip_with(ExactAnn.normalized(col("embedding")),
          array(qn.map(lit): _*), (x, y) => x * y),
          lit(0.0), (a, x) => a + x).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == brute) // exact re-rank over everything == brute force
  }
}
