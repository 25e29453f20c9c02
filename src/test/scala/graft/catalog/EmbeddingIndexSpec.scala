package graft.catalog

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("embedding index: stored computed column + cosine top-k") {
    val cat = new Catalog(java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val t = GraftTable.create(spark, cat, "vecs", Seq(
      ColumnDef("id", "bigint"), ColumnDef("x", "double"), ColumnDef("y", "double")))
    t.insert(Seq((1L, 1.0, 0.0), (2L, 0.0, 1.0), (3L, 0.9, 0.1))
      .toDF("id", "x", "y"))
    val idx = EmbeddingIndex.create(t, "xy", "array(cast(x as float), cast(y as float))")
    // index column materialized on existing rows
    assert(t.read().columns.contains("xy_idx_emb"))
    val top = idx.search(Seq(1.0, 0.0), 2).select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 3L)) // exact match first, then the near vector

    // index maintenance: later inserts compute the embedding column too
    t.insert(Seq((4L, 0.99, 0.01)).toDF("id", "x", "y"))
    val top2 = idx.search(Seq(1.0, 0.0), 2).select("id").as[Long].collect().toSeq
    assert(top2 == Seq(1L, 4L)) // new row ranks above the old near vector
  }
}
