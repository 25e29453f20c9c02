package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VisionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("iou") {
    assert(Vision.iou(Seq(0, 0, 10, 10).map(_.toDouble), Seq(0, 0, 10, 10).map(_.toDouble)) == 1.0)
    assert(Vision.iou(Seq(0, 0, 10, 10).map(_.toDouble), Seq(20, 20, 30, 30).map(_.toDouble)) == 0.0)
    // [0,0,10,10] vs [5,0,15,10]: inter 50, union 150
    assert(math.abs(Vision.iou(Seq(0.0, 0.0, 10.0, 10.0), Seq(5.0, 0.0, 15.0, 10.0)) - 1.0 / 3) < 1e-9)
  }

  test("evalDetections: greedy match by score, one gt per pred") {
    val evals = Vision.evalDetections(
      predBoxes = Seq(Seq(0, 0, 10, 10), Seq(0, 0, 5, 5), Seq(100, 100, 110, 110)).map(_.map(_.toDouble)),
      predLabels = Seq(0, 0, 1),
      predScores = Seq(0.9, 0.8, 0.7),
      gtBoxes = Seq(Seq(0, 0, 10, 10), Seq(0, 0, 9, 9)).map(_.map(_.toDouble)),
      gtLabels = Seq(0, 1))
    val c0 = evals.find(_.category == 0).get
    assert(c0.tp == Seq(1, 0))            // best pred matches, iou(0.25) pred is FP
    assert(c0.fp == Seq(0, 1))
    assert(c0.scores == Seq(0.9, 0.8))
    assert(c0.num_gts == 1)
    val c1 = evals.find(_.category == 1).get
    assert(c1.tp == Seq(0) && c1.num_gts == 1) // no overlap → FP, gt missed
  }

  test("mean_ap over a grouped DataFrame") {
    val df = Seq(
      (1L,
        Seq(Seq(0.0, 0.0, 10.0, 10.0), Seq(0.0, 0.0, 5.0, 5.0)),
        Seq(0, 0), Seq(0.9, 0.8),
        Seq(Seq(0.0, 0.0, 10.0, 10.0)), Seq(0)),
      (2L,
        Seq(Seq(0.0, 0.0, 8.0, 8.0)),
        Seq(0), Seq(0.95),
        Seq(Seq(0.0, 0.0, 8.0, 8.0)), Seq(0)),
    ).toDF("img", "pb", "pl", "ps", "gb", "gl")
    val out = df
      .withColumn("evals", Vision.evalDetectionsUdf(
        col("pb"), col("pl"), col("ps"), col("gb"), col("gl"), lit(0.5)))
      .agg(Vision.mean_ap(col("evals")).as("ap"))
      .head().getAs[Map[Int, Double]]("ap")
    // class 0 across both images: scores .95(tp) .9(tp) .8(fp), 2 gts →
    // precision [1, 1, 2/3], recall [.5, 1, 1] → AP = 1.0
    assert(math.abs(out(0) - 1.0) < 1e-9)
  }
}
