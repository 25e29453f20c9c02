package graft.io

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CocoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coco export produces valid structure with xywh boxes") {
    val df = Seq(
      (1L, "img1.jpg", Seq(Seq(10.0, 20.0, 30.0, 60.0)), Seq(2)),
      (2L, "img2.jpg", Seq.empty[Seq[Double]], Seq.empty[Int]),
    ).toDF("image_id", "file_name", "bboxes", "labels")
    val path = java.nio.file.Files.createTempDirectory("coco").toString + "/out.json"
    Coco.exportCocoJson(df, path)
    val json = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(json.contains(""""file_name":"img1.jpg""""))
    assert(json.contains(""""bbox":[10.0,20.0,20.0,40.0]""")) // xyxy → xywh
    assert(json.contains(""""categories":[{"id":2,"name":"category_2"}]"""))
    // parseable by a strict JSON reader
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
  }
}
