package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(0.0f, 10.0f)),
    (2L, Seq(5.0f, -10.0f)),
    (3L, Seq(10.0f, 5.0f)),
  ).toDF("vec_id", "embedding")

  test("scaleStat: global max abs") {
    assert(Quantize.scaleStat(vecs, "embedding") == 10.0)
  }

  test("encodeValue: endpoints, rounding, clamping, degenerate scale") {
    assert(Quantize.encodeValue(10.0, 10.0) == 127)
    assert(Quantize.encodeValue(-10.0, 10.0) == -127)
    assert(Quantize.encodeValue(0.0, 10.0) == 0)
    assert(Quantize.encodeValue(5.0, 10.0) == 64) // round(63.5) half-up
    assert(Quantize.encodeValue(42.0, 10.0) == 127)
    assert(Quantize.encodeValue(7.0, 0.0) == 0)
  }

  test("encode column matches encodeValue; round-trip error bounded") {
    val s = Quantize.scaleStat(vecs, "embedding")
    val codes = vecs.select(col("vec_id"),
      Quantize.encode(col("embedding"), s).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L) == Seq(0, 127))
    assert(codes(2L) == Seq(64, -127))
    assert(codes(3L) == Seq(127, 64))
    val step = s / 127
    codes.foreach { case (id, cs) =>
      val orig = vecs.where(col("vec_id") === id).collect()(0).getSeq[Float](1)
      cs.zip(orig).foreach { case (c, v) =>
        assert(math.abs(c * step - v) <= step / 2 + 1e-9)
      }
    }
  }

  test("searchQuantized: integer dot ranking with id tie-break") {
    val s = Quantize.scaleStat(vecs, "embedding")
    val res = Quantize.searchQuantized(vecs, "embedding", "vec_id",
      Seq(10.0, 0.0), 3, s).collect().map(r => (r.getLong(0), r.getLong(1)))
    // query scale 10 → q codes (127, 0); doc codes above
    assert(res.toSeq == Seq(
      (3L, 127L * 127L), (2L, 64L * 127L), (1L, 0L)))
  }

  test("searchQuantized approximates exact dot ranking on random data") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = Seq.fill(16)(rnd.nextGaussian())
    val s = Quantize.scaleStat(data, "embedding")
    val approx = Quantize.searchQuantized(data, "embedding", "vec_id", q, 10, s)
      .collect().map(_.getLong(0)).toSet
    val exact = data.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).zip(q).map { case (a, b) => a * b }.sum))
      .sortBy(-_._2).take(10).map(_._1).toSet
    assert((approx & exact).size >= 9, s"recall too low: ${(approx & exact).size}")
  }
}
