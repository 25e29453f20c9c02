package graft.ml

import graft.TestSpark
import graft.catalog.{Catalog, ColumnDef, GraftTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-feature interaction audit for the local-model family — the
  * compositions a training-data pipeline actually runs, each pairing
  * `graft.ml` with another subsystem:
  *
  *  1. WebDataset tar shards × CLIP: export image+caption samples, import
  *     the shards back, embed both modalities from the tar-sourced bytes.
  *  2. Model-UDF computed column × table DML: embeddings materialize on
  *     insert, survive schema evolution, and recompute on demand.
  *  3. Local embeddings × semantic dedup: near-duplicate texts land
  *     closer in model space than unrelated ones, end-to-end through the
  *     model rather than precomputed vectors.
  *  4. Audio silence-splitting × Whisper: segment, then transcribe each
  *     segment independently — iterator output feeding model input.
  */
class MlInteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("webdataset shards round-trip into CLIP joint embeddings") {
    val clipDir = LocalModels.ensureTinyClipModel(seed = 42L)
    val outDir = java.nio.file.Files.createTempDirectory("wds-clip").toString
    val rows = (1 to 9).map { i =>
      (f"sample$i%03d", s"caption text $i",
        graft.functions.Images.solidPng(10, 10, i * 1234567 % 0xffffff))
    }
    val n = graft.io.WebDataset.exportWebDataset(
      rows.toDF("key", "txt", "png"), outDir, "key", numShards = 2)
    assert(n > 0)
    val wide = graft.io.WebDataset.importWebDatasetWide(spark, outDir)
      .withColumn("caption", col("txt").cast("string"))
    val embedded = LocalModels.clipImage(
      LocalModels.clipText(wide, "caption", "temb", clipDir),
      "png", "iemb", clipDir)
      .select("key", "temb", "iemb").collect()
    assert(embedded.length == 9)
    embedded.foreach { r =>
      assert(r.getSeq[Float](1).length == 8 && r.getSeq[Float](2).length == 8)
    }
    // tar-sourced bytes give the same embeddings as the originals
    val direct = LocalModels.clipText(
      rows.toDF("key", "caption", "png"), "caption", "temb", clipDir)
      .select("key", "temb").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    embedded.foreach(r => assert(r.getSeq[Float](1) == direct(r.getString(0))))
  }

  test("model-udf computed column: DML materialization + recompute") {
    LocalModels.registerEmbedUdf(spark, "tiny_embed_ia", LocalModels.ensureTinyModel(42L))
    val cat = new Catalog(java.nio.file.Files.createTempDirectory("graft-mlia").toString)
    val t = GraftTable.create(spark, cat, "docs_ia", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert(Seq((1L, "first document"), (2L, "second document")).toDF("id", "body"))
    t.addColumn(ColumnDef("emb", "array<float>", Some("tiny_embed_ia(body)")))
    // backfill materialized the embedding for existing rows
    val e1 = t.read().where("id = 1").select("emb").collect()(0).getSeq[Float](0)
    assert(e1.length == 16)
    // inserts after the add flow through the computed column
    t.insert(Seq((3L, "third document")).toDF("id", "body"))
    assert(t.read().where("id = 3").select("emb").collect()(0).getSeq[Float](0).length == 16)
    // updating the source text recomputes the embedding (cascade)
    val before = t.read().where("id = 2").select("emb").collect()(0).getSeq[Float](0)
    t.batchUpdate(Seq((2L, "entirely different text")).toDF("id", "body"), Seq("id"))
    val after = t.read().where("id = 2").select("emb").collect()(0).getSeq[Float](0)
    assert(before != after)
    // and matches a fresh forward pass of the new text
    val fresh = spark.sql("SELECT tiny_embed_ia('entirely different text') e")
      .collect()(0).getSeq[Float](0)
    assert(after == fresh)
  }

  test("near-duplicate texts are nearer in model space than unrelated ones") {
    val dir = LocalModels.ensureTinyModel(42L)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog!"),
      (3L, "completely unrelated text about database engines")).toDF("id", "t")
    val emb = LocalModels.sentenceTransformer(df, "t", "e", dir)
      .select("id", "e").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(emb(1L), emb(2L)) > cos(emb(1L), emb(3L)))
    assert(cos(emb(1L), emb(2L)) > 0.9) // one punct char apart
  }

  test("decode-family computed columns: caption + detection through DML, views, time travel, revert") {
    // the r6-verdict audit item: caption/detection columns (greedy decode,
    // conv backbone) through the full catalog lifecycle, not just embed
    LocalModels.registerCaptionUdf(spark, "tiny_caption_ia",
      LocalModels.ensureTinyCaptionModel(42L), maxNewTokens = 4)
    LocalModels.registerDetectUdf(spark, "tiny_detect_ia",
      LocalModels.ensureTinyDetrModel(42L), threshold = 0.1f)
    val cat = new Catalog(java.nio.file.Files.createTempDirectory("graft-mlia2").toString)
    val t = GraftTable.create(spark, cat, "media_ia", Seq(
      ColumnDef("id", "bigint"), ColumnDef("png", "binary")))
    def png(i: Int): Array[Byte] =
      graft.functions.Images.texturedPng(24 + i, 20, i * 31L)
    t.insert(Seq((1L, png(1)), (2L, png(2))).toDF("id", "png"))
    // decode columns backfill on add
    t.addColumn(ColumnDef("caption", "string", Some("tiny_caption_ia(png)")))
    t.addColumn(ColumnDef("labels", "array<string>", Some("tiny_detect_ia(png)")))
    val caps1 = t.read().select("id", "caption").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(caps1.size == 2 && caps1.values.forall(c => c != null && c.nonEmpty))
    // the stored caption equals a fresh forward pass
    val fresh1 = spark.sql("SELECT tiny_caption_ia(png) c FROM VALUES (X'" +
      png(1).map("%02x".format(_)).mkString + "') AS t(png)").collect()(0).getString(0)
    assert(caps1(1L) == fresh1)
    val v1 = t.currentVersion
    // inserts flow through both decode columns
    t.insert(Seq((3L, png(3))).toDF("id", "png"))
    assert(t.read().where("id = 3").select("caption").collect()(0).getString(0) != null)
    // a materialized view SELECTING the decode columns maintains incrementally
    val mv = graft.catalog.Views.createMaterializedView(spark, cat, "cap_view", t,
      Some("id > 1"), Seq("id" -> "id", "caption" -> "caption", "n_det" -> "size(labels)"))
    assert(mv.read().count() == 2) // ids 2, 3
    t.insert(Seq((4L, png(4))).toDF("id", "png"))
    graft.catalog.Views.syncMaterializedView(mv, t, Some("id > 1"),
      Seq("id" -> "id", "caption" -> "caption", "n_det" -> "size(labels)"))
    assert(mv.read().count() == 3)
    val mvCaps = mv.read().select("id", "caption").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baseCaps = t.read().select("id", "caption").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mvCaps == baseCaps.filter(_._1 > 1))
    // time travel: the v1 snapshot still serves the ORIGINAL two captions
    val tt = t.read(Some(v1)).select("id", "caption").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tt == caps1)
    // updating the image recomputes both decode columns (cascade)
    val labelsBefore = t.read().where("id = 2").select("labels").collect()(0).getSeq[String](0)
    t.batchUpdate(Seq((2L, png(99))).toDF("id", "png"), Seq("id"))
    val cap2 = t.read().where("id = 2").select("caption").collect()(0).getString(0)
    val fresh99 = spark.sql("SELECT tiny_caption_ia(png) c FROM VALUES (X'" +
      png(99).map("%02x".format(_)).mkString + "') AS t(png)").collect()(0).getString(0)
    assert(cap2 == fresh99)
    val labelsAfter = t.read().where("id = 2").select("labels").collect()(0).getSeq[String](0)
    assert(labelsBefore != null && labelsAfter != null)
    // revert: rows 3/4 disappear, captions restore to the v1 state
    t.revert(v1)
    val reverted = t.read().select("id", "caption").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reverted == caps1)
  }

  test("r8 towers as computed columns: translation + CTC ASR through DML, recompute, time travel") {
    LocalModels.registerTranslationUdf(spark, "tiny_translate_ia",
      LocalModels.ensureTinyMarianModel(42L), targetLang = Some(">>fra<<"))
    LocalModels.registerAsrUdf(spark, "tiny_asr_ia",
      LocalModels.ensureTinyWav2Vec2Model(42L))
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-mlia3").toString)
    val t = GraftTable.create(spark, cat, "r8media", Seq(
      ColumnDef("id", "bigint"), ColumnDef("txt", "string"),
      ColumnDef("wav", "binary")))
    def wav(i: Int): Array[Byte] =
      graft.functions.Audio.sineWav(0.02, 200.0 + 35.0 * i)
    t.insert(Seq((1L, "hello there", wav(1)), (2L, "good morning", wav(2)))
      .toDF("id", "txt", "wav"))
    t.addColumn(ColumnDef("fr", "string", Some("tiny_translate_ia(txt)")))
    t.addColumn(ColumnDef("asr", "string", Some("tiny_asr_ia(wav)")))
    val v1 = t.currentVersion
    val r1 = t.read().select("id", "fr", "asr").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(r1.values.forall { case (fr, asr) => fr != null && asr != null })
    // the stored value equals a fresh forward
    val fresh = spark.sql("SELECT tiny_translate_ia('hello there')")
      .head().getString(0)
    assert(r1(1L)._1 == fresh)
    // insert flows through both towers; update recomputes the cascade
    t.insert(Seq((3L, "third row", wav(3))).toDF("id", "txt", "wav"))
    assert(t.read().where("id = 3").select("fr").head().getString(0) != null)
    t.batchUpdate(Seq((2L, "changed text", wav(9))).toDF("id", "txt", "wav"),
      Seq("id"))
    val upd = t.read().where("id = 2").select("fr").head().getString(0)
    assert(upd == spark.sql("SELECT tiny_translate_ia('changed text')")
      .head().getString(0))
    // time travel serves the pre-update decode; revert restores it
    assert(t.read(Some(v1)).where("id = 2").select("fr").head().getString(0)
      == r1(2L)._1)
    t.revert(v1)
    val reverted = t.read().select("id", "fr", "asr").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(reverted == r1)
  }

  test("vision towers feed the exporters: YOLOX detections to COCO json, SAM masks to labeled media") {
    // the training-data handoff composition: model columns flow into the
    // dataset export formats (reference: detr_to_coco + export_coco,
    // fiftyone-style labeled export)
    val yoloxDir = LocalModels.ensureTinyYoloxModel(42L)
    val samDir = LocalModels.ensureTinySamModel(42L)
    val rows = (1 to 4).map(i =>
      (i.toLong, s"img_$i.png", graft.functions.Images.texturedPng(36, 28, i * 17L)))
    val df = rows.toDF("image_id", "file_name", "png")
    // YOLOX → COCO export: the detection struct's bboxes/labels columns
    // are exactly what exportCocoJson consumes
    val det = LocalModels.yoloxDetection(df, "png", "det", yoloxDir, threshold = 0.4f)
      .select(col("image_id"), col("file_name"),
        col("det.bboxes").cast("array<array<double>>").as("bboxes"),
        col("det.labels").as("labels"))
    val cocoPath = java.nio.file.Files.createTempDirectory("vis-coco").toString + "/coco.json"
    graft.io.Coco.exportCocoJson(det, cocoPath)
    val coco = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(cocoPath)))
    assert(coco.get("images").size() == 4)
    val nDet = det.selectExpr("sum(size(labels))").collect()(0).getLong(0)
    assert(coco.get("annotations").size() == nDet)
    // every annotation's bbox is inside its (36, 28) image frame
    (0 until coco.get("annotations").size()).foreach { i =>
      val bb = coco.get("annotations").get(i).get("bbox")
      assert(bb.get(2).asDouble() >= 0 && bb.get(3).asDouble() >= 0)
    }
    // SAM masks → labeled-media export: per-instance mask areas ride as a
    // label column next to content-addressed media
    val seg = LocalModels.samSegmentation(df, "png", "seg", samDir,
      points = Seq((0.5, 0.5, 1)))
      .withColumn("mask_areas", expr("transform(seg.masks, m -> " +
        "aggregate(m, 0L, (a, row) -> a + size(filter(row, p -> p))))"))
      .withColumn("seg_scores", col("seg.scores"))
    val outDir = java.nio.file.Files.createTempDirectory("vis-fo").toString
    graft.io.Connectors.exportLabeledMedia(seg.select("png", "mask_areas", "seg_scores"),
      "png", Seq("mask_areas", "seg_scores"), outDir)
    val manifest = spark.read.json(s"$outDir/samples")
    assert(manifest.count() == 4)
    assert(manifest.selectExpr("size(mask_areas)").collect().forall(_.getInt(0) == 3))
  }

  test("silence-split segments transcribe independently and deterministically") {
    val whisperDir = LocalModels.ensureTinyWhisperModel(seed = 42L)
    // 0.2 s tone, 0.3 s silence, 0.2 s tone at a different pitch
    val rate = 16000
    def tone(freq: Double, secs: Double): Array[Short] =
      Array.tabulate((rate * secs).toInt)(i =>
        (math.sin(2 * math.Pi * freq * i / rate) * 0.5 * 32767).toShort)
    val pcm = tone(440, 0.2) ++ new Array[Short]((rate * 0.3).toInt) ++ tone(880, 0.2)
    val wav = graft.functions.Audio.encodeWav(pcm, rate.toFloat)
    // the reference composition: audio_splitter iterator → per-segment model
    val segs = Seq((1L, wav)).toDF("id", "wav")
      .select(col("id"), explode(graft.functions.Audio.audioSplitter(
        col("wav"), lit(0.05), lit(0.1))).as("seg"))
      .select(col("id"), col("seg._1").as("seg_idx"), col("seg._4").as("segwav"))
    assert(segs.count() == 2, "expected the silence gap to yield 2 segments")
    val out1 = LocalModels.speechToText(segs, "segwav", "txt", whisperDir, maxNewTokens = 5)
      .select("seg_idx", "txt").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val out2 = LocalModels.speechToText(segs.repartition(2), "segwav", "txt", whisperDir,
      maxNewTokens = 5)
      .select("seg_idx", "txt").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out1 == out2)
    assert(out1.size == 2 && out1.values.forall(_ != null))
  }
}
