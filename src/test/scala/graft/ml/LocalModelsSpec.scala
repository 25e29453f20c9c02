package graft.ml

import graft.TestSpark
import graft.catalog.{Catalog, ColumnDef, EmbeddingIndex, GraftTable}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark surface of local-model inference: broadcast-weights batched
  * mapPartitions, partition-count invariance, null handling, and the
  * reference's flagship workflow — an embedding index whose stored
  * computed column is a local model (`add_embedding_index(embedding=
  * sentence_transformer…)`, `functions/huggingface.py:60-76`).
  */
class LocalModelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val embedDir = LocalModels.ensureTinyModel(seed = 42L)
  private lazy val headDir = LocalModels.ensureTinyModel(seed = 7L, numLabels = 3)
  private lazy val crossDir = LocalModels.ensureTinyModel(seed = 11L, numLabels = 1)

  test("sentenceTransformer: unit-norm embeddings, nulls pass through") {
    val df = Seq((1L, "hello world"), (2L, null.asInstanceOf[String]),
      (3L, "spark local models"), (4L, "")).toDF("id", "text")
    val out = LocalModels.sentenceTransformer(df, "text", "emb", embedDir)
      .select("id", "emb").collect().map(r =>
        r.getLong(0) -> Option(r.getSeq[Float](1))).toMap
    assert(out(2L).isEmpty && out(4L).isEmpty)
    assert(out(1L).get.length == 16)
    val norm = math.sqrt(out(1L).get.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("embeddings are invariant to partitioning and batch size") {
    val texts = (1 to 37).map(i => i.toLong -> s"document number $i with body ${"x" * (i % 11)}")
    val df = texts.toDF("id", "text")
    def run(parts: Int, batch: Int): Map[Long, Seq[Float]] =
      LocalModels.sentenceTransformer(df.repartition(parts), "text", "emb", embedDir,
        batchSize = batch)
        .select("id", "emb").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val a = run(1, 32)
    val b = run(7, 5)
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(v == b(k), s"id $k differs across partitioning") }
  }

  test("crossEncoderScore: sigmoid single-logit head, deterministic") {
    val df = Seq(("what is spark", "spark is a distributed engine"),
      ("what is spark", "bananas are yellow")).toDF("q", "d")
    val scores = LocalModels.crossEncoderScore(df, "q", "d", "score", crossDir)
      .select("score").as[Float].collect()
    assert(scores.length == 2)
    scores.foreach(s => assert(s > 0f && s < 1f)) // sigmoid range
    val again = LocalModels.crossEncoderScore(df, "q", "d", "score", crossDir)
      .select("score").as[Float].collect()
    assert(scores.toSeq == again.toSeq)
  }

  test("textClassification: softmax over id2label, scores sum to 1") {
    val df = Seq((1L, "some text to classify")).toDF("id", "text")
    val rows = LocalModels.textClassification(df, "text", "cls", headDir, topK = 3)
      .select("cls").collect()
    val entries = rows(0).getSeq[Row](0)
    assert(entries.length == 3)
    assert(entries.map(_.getString(0)).toSet == Set("LABEL_0", "LABEL_1", "LABEL_2"))
    val total = entries.map(_.getFloat(1).toDouble).sum
    assert(math.abs(total - 1.0) < 1e-5)
    // ordered by score descending
    assert(entries.map(_.getFloat(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("similar texts score closer than dissimilar ones (bulk vs udf parity)") {
    LocalModels.registerEmbedUdf(spark, "tiny_embed_parity", embedDir)
    val df = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val bulk = LocalModels.sentenceTransformer(df, "text", "emb", embedDir)
      .select("emb").as[Seq[Float]].collect()(0)
    val viaUdf = df.selectExpr("tiny_embed_parity(text) as emb")
      .as[Seq[Float]].collect()(0)
    assert(bulk == viaUdf) // batched path and SQL-udf path agree bitwise
  }

  test("embedding index over a local-model computed column, DML-maintained") {
    LocalModels.registerEmbedUdf(spark, "tiny_embed", embedDir)
    val cat = new Catalog(java.nio.file.Files.createTempDirectory("graft-ml-wh").toString)
    val t = GraftTable.create(spark, cat, "docs_ml", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert(Seq(
      (1L, "apache spark distributed computing"),
      (2L, "cooking pasta with tomato sauce"),
      (3L, "spark cluster resource scheduling")).toDF("id", "body"))
    val idx = EmbeddingIndex.create(t, "body", "tiny_embed(body)")
    assert(t.read().columns.contains("body_idx_emb"))
    // query with the embedding of a probe text: top-1 is the exact row
    val probe = LocalModels.load(embedDir)
    val q = probe.encoder.meanPoolNormalized(probe.encoder.forward(
      Seq(probe.tokenizer.encode("apache spark distributed computing", 128))))(0)
      .map(_.toDouble).toSeq
    val top = idx.search(q, 1).select("id").as[Long].collect()
    assert(top.toSeq == Seq(1L))
    // inserts flow through the computed column (index maintenance)
    t.insert(Seq((4L, "apache spark distributed computing")).toDF("id", "body"))
    val top2 = idx.search(q, 2).select("id").as[Long].collect().toSet
    assert(top2 == Set(1L, 4L)) // the duplicate text ties with the original
  }

  test("clip dataframe surface: joint space, partition/batch invariant") {
    val clipDir = LocalModels.ensureTinyClipModel(seed = 42L)
    val rows = (1 to 13).map { i =>
      (i.toLong, s"caption number $i",
        graft.functions.Images.solidPng(8 + i % 5, 8, i * 999331 % 0xffffff))
    }
    val df = rows.toDF("id", "caption", "png")
    def run(parts: Int, batch: Int): Map[Long, (Seq[Float], Seq[Float])] = {
      val t = LocalModels.clipText(df.repartition(parts), "caption", "temb", clipDir,
        batchSize = batch)
      LocalModels.clipImage(t, "png", "iemb", clipDir, batchSize = batch)
        .select("id", "temb", "iemb").collect()
        .map(r => r.getLong(0) -> (r.getSeq[Float](1), r.getSeq[Float](2))).toMap
    }
    val a = run(1, 32)
    val b = run(5, 3)
    assert(a == b)
    a.values.foreach { case (t, i) =>
      for (v <- Seq(t, i)) {
        assert(v.length == 8)
        assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
      }
    }
  }

  test("speechToText dataframe surface: deterministic, partition invariant") {
    val whisperDir = LocalModels.ensureTinyWhisperModel(seed = 42L)
    val rows = (1 to 6).map(i =>
      (i.toLong, graft.functions.Audio.sineWav(0.3, 200.0 + 80 * i))) :+
      (99L, null.asInstanceOf[Array[Byte]])
    val df = rows.toDF("id", "wav")
    def run(parts: Int): Map[Long, String] =
      LocalModels.speechToText(df.repartition(parts), "wav", "txt", whisperDir,
        maxNewTokens = 5)
        .select("id", "txt").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1)
    val b = run(4)
    assert(a == b)
    assert(a(99L) == null)
    assert(a.filterNot(_._1 == 99L).values.forall(_ != null))
  }

  test("different seeds give different models; same seed reproduces bitwise") {
    val d1 = java.nio.file.Files.createTempDirectory("m1").toString
    val d2 = java.nio.file.Files.createTempDirectory("m2").toString
    LocalModels.writeTinyModel(d1, seed = 1L)
    LocalModels.writeTinyModel(d2, seed = 1L)
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d1, "model.safetensors"))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d2, "model.safetensors"))
    assert(java.util.Arrays.equals(b1, b2))
    val d3 = java.nio.file.Files.createTempDirectory("m3").toString
    LocalModels.writeTinyModel(d3, seed = 2L)
    val b3 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d3, "model.safetensors"))
    assert(!java.util.Arrays.equals(b1, b3))
  }
}
