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

  test("searchText: string similarity() through the index's own embedder") {
    // reference embedding_index.py similarity('query text'): the index's
    // embed fn runs on the query string, then the normal vector search.
    // CLIP text tower over the tiny deterministic checkpoint: a row whose
    // text EQUALS the query embeds identically -> cosine 1, rank 1.
    val modelDir = graft.ml.LocalModels.ensureTinyClipModel(seed = 42L)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-wh-st").toString)
    val t = GraftTable.create(spark, cat, "docs_st", Seq(
      ColumnDef("id", "bigint"), ColumnDef("txt", "string")))
    val docs = Seq((1L, "the red fox"), (2L, "a blue whale"),
      (3L, "green tea leaves"), (4L, "red foxes run"))
      .toDF("id", "txt")
    // embeddings materialize through the same CLIP tower as the query
    val emb = graft.ml.LocalModels.clipText(docs, "txt", "txt_idx_emb", modelDir)
    val t2 = GraftTable.create(spark, cat, "docs_emb", Seq(
      ColumnDef("id", "bigint"), ColumnDef("txt", "string"),
      ColumnDef("txt_idx_emb", "array<float>")))
    t2.insert(emb)
    val idx = new EmbeddingIndex(t2, "txt_idx_emb", "cosine",
      Some(EmbeddingIndex.clipTextEmbedder(modelDir)))
    val got = idx.searchText("a blue whale", 2)
      .select("id").as[Long].collect().toSeq
    assert(got.head == 2L, s"identical text must rank first, got $got")
    // vector-only index refuses string queries with a clear message
    val bare = new EmbeddingIndex(t2, "txt_idx_emb", "cosine")
    val e = intercept[IllegalArgumentException](bare.searchText("x", 1))
    assert(e.getMessage.contains("query embedder"))
  }
}
