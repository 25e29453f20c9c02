package graft.io

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ConnectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv and json round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    Connectors.exportCsv(df, s"$tmp/csv")
    val csv = Connectors.importCsv(spark, s"$tmp/csv")
    assert(csv.count() == 2 && csv.columns.toSeq == Seq("id", "name", "x"))
    Connectors.exportJson(df, s"$tmp/json")
    val json = Connectors.importJson(spark, s"$tmp/json")
    assert(json.count() == 2)
    assert(json.select("name").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }
}
