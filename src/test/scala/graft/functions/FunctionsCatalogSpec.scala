package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class FunctionsCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("listFunctions enumerates the scalar families with plausible coverage") {
    val fns = FunctionsCatalog.functions
    val byFamily = fns.groupBy(_._1).view.mapValues(_.size).toMap
    // Column-builder floors (media families are byte-level kernels surfaced
    // through UDFs/queries, so they contribute few or no Column builders)
    assert(byFamily.getOrElse("strings", 0) >= 49, s"strings: $byFamily")
    assert(byFamily.getOrElse("maths", 0) >= 14)
    assert(byFamily.getOrElse("timestamps", 0) >= 20)
    assert(byFamily.getOrElse("jsons", 0) >= 17)
    assert(byFamily.getOrElse("text", 0) >= 10)
    assert(byFamily.getOrElse("vector", 0) >= 5)
    // UDF-surfaced media families now enumerate too
    assert(byFamily.getOrElse("images", 0) >= 30, s"images: $byFamily")
    assert(byFamily.getOrElse("video", 0) >= 25)
    assert(byFamily.getOrElse("audio", 0) >= 8)
    assert(byFamily.getOrElse("scene", 0) >= 5)
    // well-known members resolve
    assert(fns.exists(f => f._1 == "strings" && f._2 == "capitalize"))
    assert(fns.exists(f => f._1 == "vector" && f._2 == "cosineSimilarity"))
    assert(fns.exists(f => f._1 == "scene" && f._2 == "sceneDetectContentUdf"))
    assert(fns.exists(f => f._1 == "video" && f._2 == "videoSplitter"))
    // DataFrame form round-trips
    assert(FunctionsCatalog.listFunctions(spark).count() == fns.size)
  }
}
