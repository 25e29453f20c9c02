package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("image metadata extraction with per-cell error capture") {
    val df = Seq(
      ("ok", graft.functions.Images.solidPng(40, 20, 0x336699)),
      ("bad", "not an image".getBytes("UTF-8")),
    ).toDF("name", "bytes")
    val out = Multimodal.withImageMeta(df, "bytes", "meta")
    val rows = out.select("name", "meta.*").orderBy("name").collect()
    val bad = rows(0)
    assert(bad.getAs[String]("errortype") == "IllegalArgumentException")
    assert(bad.isNullAt(bad.fieldIndex("width")))
    val ok = rows(1)
    assert(ok.getAs[Int]("width") == 40 && ok.getAs[Int]("height") == 20)
    assert(ok.getAs[String]("mode") == "RGB")
    assert(ok.isNullAt(ok.fieldIndex("errortype")))
  }

  test("frame sampling expands one row per frame, distributed") {
    val df = Seq(("v1", "0123456789abcdefghijklmnopqrstuvwxyz"))
      .toDF("vid", "payload")
      .withColumn("bytes", col("payload").cast("binary"))
    val out = Multimodal.sampleFrames(df, "bytes", 4)
    assert(out.count() == 4)
    assert(out.select("frame_idx").as[Int].collect().toSeq == Seq(0, 1, 2, 3))
    assert(out.columns.contains("frame_bytes"))
  }

  test("fetchMedia loads file:// URIs executor-side with error capture") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media-uri")
    val png = graft.functions.Images.solidPng(6, 3, 0xABCDEF)
    java.nio.file.Files.write(dir.resolve("x.png"), png)
    val df = Seq(
      (1L, dir.resolve("x.png").toUri.toString),
      (2L, dir.resolve("missing.png").toUri.toString),
    ).toDF("id", "uri")
    val out = Multimodal.fetchMedia(df, "uri", "media").orderBy("id").collect()
    assert(java.util.Arrays.equals(
      out(0).getAs[org.apache.spark.sql.Row]("media").getAs[Array[Byte]]("data"), png))
    assert(out(0).getAs[org.apache.spark.sql.Row]("media").getAs[String]("errormsg") == null)
    val err = out(1).getAs[org.apache.spark.sql.Row]("media")
    assert(err.getAs[Array[Byte]]("data") == null)
    assert(err.getAs[String]("errortype") == "FileNotFoundException")
  }

  test("localpath short-circuits file URIs and errors on missing files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-localpath")
    val cache = java.nio.file.Files.createTempDirectory("graft-cache").toString
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    val df = Seq(
      (1L, dir.resolve("a.bin").toUri.toString),
      (2L, dir.resolve("nope.bin").toUri.toString),
    ).toDF("id", "uri")
    val out = Multimodal.withLocalPath(df, "uri", "localpath", cache)
      .orderBy("id").collect()
    // file:// → its own path, no copy into the cache
    assert(out(0).getAs[String]("localpath") == dir.resolve("a.bin").toString)
    assert(out(0).getAs[String]("localpath_errormsg") == null)
    assert(out(1).getAs[String]("localpath") == null)
    assert(out(1).getAs[String]("localpath_errormsg") != null)
    assert(new java.io.File(cache).listFiles().forall(_.getName.startsWith("."))) // nothing cached
  }

  test("saveMedia writes content-addressed cells executor-side and round-trips") {
    val dest = java.nio.file.Files.createTempDirectory("graft-save").toString
    val df = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, Array[Byte](9, 8, 7, 6)),
      (3L, Array[Byte](1, 2, 3)), // duplicate content → same object
      (4L, null.asInstanceOf[Array[Byte]]),
    ).toDF("id", "data")
    val out = Multimodal.saveMedia(df, "data", dest, ext = "png")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("data_url") != null)
    assert(out(0).getAs[String]("data_url") == out(2).getAs[String]("data_url"))
    assert(out(1).getAs[String]("data_url") != out(0).getAs[String]("data_url"))
    assert(out(3).isNullAt(out(3).fieldIndex("data_url"))) // null cell → null url
    assert(out.forall(_.getAs[String]("data_url_errormsg") == null))
    // two distinct objects on disk, content-addressed names, no temp litter
    val files = new java.io.File(dest).listFiles().filter(_.getName.endsWith(".png"))
    assert(files.length == 2 && files.forall(!_.getName.startsWith("_tmp")))
    // fetch back through the URI path: bytes round-trip
    val fetched = Multimodal.fetchMedia(
      out.map(r => (r.getLong(0), r.getAs[String]("data_url"))).toSeq
        .filter(_._2 != null).toDF("id", "uri"), "uri", "media")
      .orderBy("id").collect()
    assert(java.util.Arrays.equals(
      fetched(0).getStruct(2).getAs[Array[Byte]](0), Array[Byte](1, 2, 3)))
  }
}
