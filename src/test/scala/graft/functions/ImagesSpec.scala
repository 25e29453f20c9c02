package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val png = Images.solidPng(32, 16, 0xAA5500)

  test("decode/resize/crop/rotate/grayscale round-trips through real codec") {
    val df = Seq(Tuple1(png)).toDF("img")
    val out = df.select(
      Images.getMetadata(col("img")).as("meta"),
      Images.getMetadata(Images.resize(col("img"), lit(8), lit(4))).as("resized"),
      Images.getMetadata(Images.crop(col("img"), lit(2), lit(2), lit(10), lit(12))).as("cropped"),
      Images.getMetadata(Images.rotate(col("img"), lit(90))).as("rotated"),
      Images.getMetadata(Images.grayscale(col("img"))).as("gray"),
      Images.getPixel(col("img"), lit(5), lit(5)).as("px"),
    ).head()
    assert(out.getAs[org.apache.spark.sql.Row]("meta").getInt(0) == 32)
    assert(out.getAs[org.apache.spark.sql.Row]("resized").getInt(0) == 8)
    assert(out.getAs[org.apache.spark.sql.Row]("resized").getInt(1) == 4)
    assert(out.getAs[org.apache.spark.sql.Row]("cropped").getInt(0) == 8)   // 10-2
    assert(out.getAs[org.apache.spark.sql.Row]("cropped").getInt(1) == 10)  // 12-2
    assert(out.getAs[org.apache.spark.sql.Row]("rotated").getInt(0) == 16)  // dims swap
    assert(out.getAs[org.apache.spark.sql.Row]("rotated").getInt(1) == 32)
    assert(out.getAs[org.apache.spark.sql.Row]("gray").getString(2) == "L")
    assert(out.getAs[scala.collection.Seq[Int]]("px").toSeq == Seq(0xAA, 0x55, 0x00))
  }

  test("tiles + stitch round-trip reassembles the image") {
    val df = Seq(Tuple1(Images.solidPng(32, 16, 0x112233))).toDF("img")
    val tiled = df.select(explode(Images.tiles(col("img"), lit(16), lit(8))).as("t"))
      .select(col("t._1").as("x"), col("t._2").as("y"),
        col("t._3").as("w"), col("t._4").as("h"), col("t._5").as("tile"))
    assert(tiled.count() == 4)
    val stitch = udaf(StitchTiles)
    val out = tiled
      .agg(stitch(col("x"), col("y"), col("w"), col("h"), col("tile")).as("img"))
      .select(Images.getMetadata(col("img")).as("meta")).head()
    val meta = out.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getInt(0) == 32 && meta.getInt(1) == 16)
  }

  test("rotate 90 moves pixels correctly") {
    // 2x1 image: left red, right green → rotated 90 CCW: top green, bottom red
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    val bytes = Images.encodePng(img)
    val df = Seq(Tuple1(bytes)).toDF("img")
    val top = df.select(Images.getPixel(Images.rotate(col("img"), lit(90)), lit(0), lit(0)))
      .head().getAs[scala.collection.Seq[Int]](0).toSeq
    assert(top == Seq(0, 255, 0)) // green rotated to top
  }
}
