package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog sketch: hash-column determinism against a reference
  * implementation of the same md5-hex scheme, the register merge law
  * (sketch of a union == max-merge of the parts), estimate accuracy in
  * both the raw and linear-counting regimes, and duplicate invariance.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent JVM-side reference of the same (bucket, rho) scheme. */
  private def refBucketRho(s: String): (Int, Int) = {
    val hx = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bucket = Integer.parseInt(hx.substring(0, 2), 16)
    val win = hx.substring(2, 15)
    val z = win.takeWhile(_ == '0').length
    val rho =
      if (z == 13) 53
      else {
        val d = Integer.parseInt(win(z).toString, 16)
        val lz = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
        4 * z + lz + 1
      }
    (bucket, rho)
  }

  test("hashCols matches the reference scheme value by value") {
    val vals = (0 until 500).map(_.toString) :+ "hello" :+ ""
    val (b, r) = Hll.hashCols(col("v"))
    val got = vals.toDF("v").select(col("v"), b.as("b"), r.as("r"))
      .collect().map(x => x.getString(0) -> ((x.getInt(1), x.getInt(2))))
      .toMap
    vals.foreach { v =>
      assert(got(v) == refBucketRho(v), s"value $v")
    }
  }

  test("register merge law: sketch(A ++ B) == max-merge(sketch A, sketch B)") {
    val a = (0 until 3000).map(i => ("g", i.toLong)).toDF("k", "v")
    val b = (2000 until 7000).map(i => ("g", i.toLong)).toDF("k", "v")
    val whole = Hll.registers(a.union(b), Seq("k"), col("v"))
    val merged = Hll.registers(a, Seq("k"), col("v"))
      .union(Hll.registers(b, Seq("k"), col("v")))
      .groupBy("k", "bucket").agg(max("m").as("m"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
  }

  test("estimate accuracy: raw regime within 4 standard errors") {
    val n = 20000
    val df = (0 until n).map(i => ("g", s"item_$i")).toDF("k", "v")
    val est = Hll.distinctSketch(df, Seq("k"), col("v"))
      .select("estimate").as[Double].head()
    val se = 1.04 / math.sqrt(Hll.M) // ≈ 6.5%
    assert(math.abs(est / n - 1.0) < 4 * se, s"est $est for n=$n")
  }

  test("linear-counting regime: small cardinalities are near-exact") {
    for (n <- Seq(1, 7, 40)) {
      val df = (0 until n).map(i => ("g", s"small_$i")).toDF("k", "v")
      val est = Hll.distinctSketch(df, Seq("k"), col("v"))
        .select("estimate").as[Double].head()
      assert(math.abs(est - n) <= math.max(1.0, 0.15 * n),
        s"est $est for n=$n")
    }
  }

  test("duplicate invariance and per-group independence") {
    val base = (0 until 1000).flatMap(i =>
      Seq(("a", s"x$i"), ("a", s"x$i"), ("b", s"x${i % 100}")))
    val out = Hll.distinctSketch(base.toDF("k", "v"), Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("estimate"))
      .toMap
    // group a: 1000 distinct (each duplicated); group b: 100 distinct
    assert(math.abs(out("a") / 1000.0 - 1.0) < 0.3)
    assert(math.abs(out("b") / 100.0 - 1.0) < 0.3)
    // dup invariance: sketching the deduped set gives identical registers
    val dups = Hll.registers(base.toDF("k", "v"), Seq("k"), col("v"))
    val dedup = Hll.registers(base.distinct.toDF("k", "v"), Seq("k"),
      col("v"))
    assert(dups.except(dedup).isEmpty && dedup.except(dups).isEmpty)
  }

  test("null values are ignored (no null-bucket register, V unchanged)") {
    val clean = (0 until 50).map(i => ("g", s"n$i")).toDF("k", "v")
    val withNulls = clean.union(
      Seq(("g", null), ("g", null)).toDF("k", "v"))
    val ra = Hll.registers(clean, Seq("k"), col("v"))
    val rb = Hll.registers(withNulls, Seq("k"), col("v"))
    assert(rb.where(col("bucket").isNull).isEmpty)
    assert(ra.except(rb).isEmpty && rb.except(ra).isEmpty)
    val ea = Hll.distinctSketch(clean, Seq("k"), col("v"))
      .select("estimate").as[Double].head()
    val eb = Hll.distinctSketch(withNulls, Seq("k"), col("v"))
      .select("estimate").as[Double].head()
    assert(ea == eb && !eb.isNaN)
  }
}
