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

  test("bbox geometry family: convert/scale/pad/clip/crop/resize-canvas semantics") {
    def one(c: org.apache.spark.sql.Column): Seq[Seq[Double]] =
      Seq(1).toDF("one").select(c.as("r")).head().getSeq[Seq[Double]](0)
    val boxes = typedLit(Seq(Seq(10.0, 20.0, 30.0, 40.0)))

    // convert: xyxy → cxcywh → xyxy round-trips for even dims; int
    // rounding is floor(x+0.5), not banker's
    assert(one(Vision.bboxesConvert(boxes, lit("xyxy"), lit("cxcywh"))) ==
      Seq(Seq(20.0, 30.0, 20.0, 20.0)))
    assert(one(Vision.bboxesConvert(
      typedLit(Seq(Seq(20.0, 30.0, 20.0, 20.0))), lit("cxcywh"), lit("xyxy"))) ==
      Seq(Seq(10.0, 20.0, 30.0, 40.0)))
    assert(one(Vision.bboxesConvert(
      typedLit(Seq(Seq(0.0, 0.0, 5.0, 5.0))), lit("xyxy"), lit("cxcywh"))) ==
      Seq(Seq(3.0, 3.0, 5.0, 5.0))) // floor(2.5+0.5)=3
    // float boxes skip the rounding
    assert(one(Vision.bboxesConvert(
      typedLit(Seq(Seq(0.0, 0.0, 5.5, 5.0))), lit("xyxy"), lit("xywh"))) ==
      Seq(Seq(0.0, 0.0, 5.5, 5.0)))

    // scale: center-anchored, factor 2 doubles dims around (20,30)
    assert(one(Vision.bboxesScale(boxes, lit("xyxy"), lit(2.0), lit(0.0), lit(0.0))) ==
      Seq(Seq(0.0, 10.0, 40.0, 50.0)))
    // degenerate boxes pass through untouched
    assert(one(Vision.bboxesScale(
      typedLit(Seq(Seq(10.0, 20.0, 10.0, 40.0))), lit("xyxy"), lit(2.0), lit(0.0), lit(0.0))) ==
      Seq(Seq(10.0, 20.0, 10.0, 40.0)))

    // resize to width 10: height keeps aspect (20×20 → 10×10)
    assert(one(Vision.bboxesResize(boxes, lit("xyxy"), lit(10.0), lit(0.0),
      lit(0.0), lit(""))) == Seq(Seq(15.0, 25.0, 25.0, 35.0)))
    // aspect 2:1 pad mode grows the undersized dimension
    assert(one(Vision.bboxesResize(boxes, lit("xyxy"), lit(0.0), lit(0.0),
      lit(2.0), lit("pad"))) == Seq(Seq(0.0, 20.0, 40.0, 40.0)))

    // pad: per-side amounts
    assert(one(Vision.bboxesPad(boxes, lit("xyxy"), lit(1.0), lit(2.0),
      lit(3.0), lit(4.0))) == Seq(Seq(9.0, 17.0, 32.0, 44.0)))

    // clip: clamp to canvas; min_visibility filters to NULL
    assert(one(Vision.bboxesClipToCanvas(boxes, lit("xyxy"), lit(25.0),
      lit(35.0), lit(0.0), lit(0.0))) == Seq(Seq(10.0, 20.0, 25.0, 35.0)))
    val filtered = one(Vision.bboxesClipToCanvas(boxes, lit("xyxy"),
      lit(25.0), lit(35.0), lit(0.6), lit(0.0))) // visibility 225/400 < 0.6
    assert(filtered == Seq(null))

    // crop canvas: re-base by the region origin
    assert(one(Vision.bboxesCropCanvas(boxes, lit("xyxy"),
      typedLit(Seq(5.0, 5.0, 50.0, 50.0)), lit("xyxy"), lit(100.0), lit(100.0))) ==
      Seq(Seq(5.0, 15.0, 25.0, 35.0)))

    // resize canvas: coordinate scaling, not center-anchored
    assert(one(Vision.bboxesResizeCanvas(boxes, lit("xyxy"), lit(100.0),
      lit(100.0), lit(50.0), lit(200.0), lit(0.0), lit(0.0))) ==
      Seq(Seq(5.0, 40.0, 15.0, 80.0)))
  }

  test("bboxesDraw and overlaySegmentation: pixels land where the geometry says") {
    val df = Seq(1).toDF("one")
      .withColumn("img", Images.makeSolidPng(lit(20), lit(16), lit(0x000000)))
    // filled red box [4,4,12,10]
    val drawn = df.select(Vision.bboxesDraw(col("img"),
        typedLit(Seq(Seq(4.0, 4.0, 12.0, 10.0))), typedLit(Seq.empty[String]),
        lit(0xff0000), lit(1.0), lit(true),
        lit(1.0), lit(1))).head().getAs[Array[Byte]](0)
    val img = Images.decode(drawn)
    assert((img.getRGB(8, 7) & 0xffffff) == 0xff0000) // inside: filled
    assert((img.getRGB(1, 1) & 0xffffff) == 0x000000) // outside: untouched

    // per-label md5-hash colors: pinned against the reference's
    // __create_label_colors (hashlib.md5 → hue → colorsys.hsv_to_rgb with
    // int() truncation), computed independently in CPython
    assert(Vision.labelColor("person") == 0x48f248)
    assert(Vision.labelColor("None") == 0x48c5f2)
    assert(Vision.labelColor("cat") == 0xa348f2)
    // rgb < 0 → label-keyed auto colors; box beyond labels gets "None"'s
    val auto = df.select(Vision.bboxesDraw(col("img"),
        typedLit(Seq(Seq(2.0, 2.0, 8.0, 8.0), Seq(10.0, 10.0, 14.0, 14.0))),
        typedLit(Seq("person")), lit(-1), lit(1.0), lit(true),
        lit(1.0), lit(1))).head().getAs[Array[Byte]](0)
    val autoImg = Images.decode(auto)
    assert((autoImg.getRGB(5, 5) & 0xffffff) == 0x48f248)   // "person" fill
    assert((autoImg.getRGB(12, 12) & 0xffffff) == 0x48c5f2) // null-label fill

    // segmentation overlay: mask id 1 over rows 2-5, cols 3-9
    val mask = (0 until 16).map(y => (0 until 20).map(x =>
      if (y >= 2 && y <= 5 && x >= 3 && x <= 9) 1 else 0))
    val seg = df.select(Vision.overlaySegmentation(col("img"),
        typedLit(mask), lit(1.0), lit(false), lit(1)))
      .head().getAs[Array[Byte]](0)
    val segImg = Images.decode(seg)
    assert((segImg.getRGB(5, 3) & 0xffffff) != 0x000000) // painted
    assert((segImg.getRGB(15, 12) & 0xffffff) == 0x000000) // background kept
    // contours-only leaves the interior unpainted
    val contour = df.select(Vision.overlaySegmentation(col("img"),
        typedLit(mask), lit(1.0), lit(true), lit(1)))
      .head().getAs[Array[Byte]](0)
    val cImg = Images.decode(contour)
    assert((cImg.getRGB(3, 2) & 0xffffff) != 0x000000) // boundary painted
    assert((cImg.getRGB(6, 4) & 0xffffff) == 0x000000) // interior untouched
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
