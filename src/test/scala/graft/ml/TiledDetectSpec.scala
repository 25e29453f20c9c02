package graft.ml

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** SAHI-style tiled inference (tile grid × YOLOX × global NMS):
  * merge-step NMS pins, single-tile identity with the plain detection
  * path, and exact translation equivariance — content moved one full
  * tile to the right yields the identical detections shifted by the
  * tile size (the property that makes tiling sound at any image size).
  */
class TiledDetectSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val yoloxDir = LocalModels.ensureTinyYoloxModel()

  test("nmsPerClass: same-class IoU suppression only, score-ordered output") {
    val a = (Array(0f, 0f, 10f, 10f), 0.9f, 1)
    val b = (Array(1f, 1f, 11f, 11f), 0.8f, 1)   // IoU ≈ 0.68 with a
    val c = (Array(0f, 0f, 10f, 10f), 0.7f, 2)   // other class: survives
    val d = (Array(20f, 20f, 30f, 30f), 0.6f, 1) // disjoint: survives
    val kept = LocalModels.nmsPerClass(Seq(a, b, c, d), 0.45f)
    assert(kept.map(x => (x._2, x._3)) == Seq((0.9f, 1), (0.7f, 2), (0.6f, 1)))
    // raising the threshold above the pair IoU disables the suppression
    assert(LocalModels.nmsPerClass(Seq(a, b), 0.7f).length == 2)
  }

  private def collectDets(df: org.apache.spark.sql.DataFrame): Seq[(Int, Float, Seq[Float])] =
    df.selectExpr("explode(arrays_zip(det.bboxes, det.scores, det.labels)) z")
      .selectExpr("z.labels l", "z.scores s", "z.bboxes b")
      .collect()
      .map(r => (r.getInt(0), r.getFloat(1), r.getSeq[Float](2)))
      .sortBy(t => (t._1, t._2, t._3.headOption.getOrElse(0f)))

  test("single tile, no overlap: tiled path equals the plain detection path") {
    val img = graft.functions.Images.texturedPng(64, 64, 77L)
    val df = Seq((1L, img)).toDF("id", "png")
    val plain = collectDets(LocalModels.yoloxDetection(
      df, "png", "det", yoloxDir, threshold = 0.3f, inputSize = 64))
    val tiled = collectDets(LocalModels.yoloxTiledDetection(
      df, "png", "det", yoloxDir, tileSize = 64, overlap = 0,
      threshold = 0.3f, nmsIou = 2.0f))
    assert(plain.nonEmpty, "fixture must produce detections")
    assert(tiled == plain)
  }

  test("translation equivariance: content moved one tile right shifts detections exactly") {
    val content = graft.functions.Images.decode(
      graft.functions.Images.texturedPng(64, 64, 77L))
    def canvas(offsetX: Int): Array[Byte] = {
      val c = new BufferedImage(128, 64, BufferedImage.TYPE_INT_RGB)
      val g = c.createGraphics(); g.drawImage(content, offsetX, 0, null); g.dispose()
      graft.functions.Images.encodePng(c)
    }
    def detsOf(offsetX: Int): Seq[(Int, Float, Seq[Float])] = {
      val df = Seq((1L, canvas(offsetX))).toDF("id", "png")
      collectDets(LocalModels.yoloxTiledDetection(
        df, "png", "det", yoloxDir, tileSize = 64, overlap = 0,
        threshold = 0.3f, nmsIou = 2.0f))
    }
    val left = detsOf(0)
    val right = detsOf(64)
    assert(left.nonEmpty)
    // The two canvases hold the SAME two tiles, swapped. Detections can
    // spill across the tile boundary, so a geometric half-split is not
    // provenance — compare translation-invariant profiles instead:
    // (label, score) multisets are bitwise equal (identical tile pixels,
    // position plays no role in the forward pass)…
    assert(left.map(d => (d._1, d._2)).sorted == right.map(d => (d._1, d._2)).sorted)
    def approxSorted(a: Seq[Float], b: Seq[Float]): Unit = {
      assert(a.length == b.length)
      a.sorted.zip(b.sorted).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-3, s"$x vs $y")
      }
    }
    // …y spans and box shapes are untouched by a horizontal tile swap…
    approxSorted(left.map(_._3(1)), right.map(_._3(1)))
    approxSorted(left.map(d => d._3(3) - d._3(1)), right.map(d => d._3(3) - d._3(1)))
    approxSorted(left.map(d => d._3(2) - d._3(0)), right.map(d => d._3(2) - d._3(0)))
    // …and x positions agree modulo the tile size (the swap moves every
    // box by exactly ±tileSize)
    def xMod(d: (Int, Float, Seq[Float])): Float =
      (((d._3(0) % 64) + 64) % 64)
    approxSorted(left.map(xMod), right.map(xMod))
  }
}
