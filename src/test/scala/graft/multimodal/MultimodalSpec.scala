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
}
