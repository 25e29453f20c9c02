package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{expr, struct}
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Local-model inference over Spark — the JVM answer to the reference's
  * `functions/huggingface.py` family (sentence_transformer:32, cross_encoder:85,
  * text_classification:1175), which runs torch models in-process. Here the
  * checkpoint (safetensors + vocab.txt + config.json, the standard HF
  * layout) is loaded ONCE on the driver, broadcast to executors, and the
  * hand-rolled `Encoder` forward pass runs inside `mapPartitions` in
  * tokenized padded batches — map-only, no shuffle, no egress, no native
  * deps.
  *
  * 100 TB shape: weights are O(100 MB) broadcast once per executor while
  * the corpus streams through partitions; throughput scales linearly with
  * cores. The per-batch cost is the usual O(L²·H + L·H²) per layer; for
  * big checkpoints swap `Tensors.linear` for a BLAS-backed kernel — the
  * orchestration (broadcast + batched mapPartitions) is the part that has
  * to be right at scale, and it is the same for a 4-layer test model and a
  * 24-layer production one.
  */
object LocalModels {

  /** A loaded checkpoint directory: HF layout (config.json,
    * model.safetensors, vocab.txt). Serializable so it can ride a Spark
    * broadcast; the Encoder/tokenizer are rebuilt lazily per executor.
    */
  final class ModelBundle(val cfg: EncoderConfig, val weights: Map[String, Tensor],
      val vocabTokens: IndexedSeq[String]) extends Serializable {
    @transient lazy val encoder: Encoder = new Encoder(cfg, weights)
    @transient lazy val tokenizer: WordPiece =
      WordPiece.fromTokens(vocabTokens, cfg.doLowerCase)
  }

  def load(modelDir: String): ModelBundle = {
    val cfg = EncoderConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    val weights = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val vocab = scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(Paths.get(modelDir, "vocab.txt"), StandardCharsets.UTF_8))
      .asScala.toIndexedSeq
    new ModelBundle(cfg, weights, vocab)
  }

  /** Append `outCol: array<float>` — the unit-norm mean-pooled sentence
    * embedding of `textCol` (reference sentence_transformer,
    * `huggingface.py:32` with `normalize_embeddings` semantics). Null or
    * empty text → null embedding.
    */
  def sentenceTransformer(df: DataFrame, textCol: String, outCol: String,
      modelDir: String, maxLen: Int = 128, batchSize: Int = 32): DataFrame =
    mapBatches(df, Seq(textCol), outCol, ArrayType(FloatType), modelDir) {
      (bundle, rows) =>
        val texts = rows.map(_.head)
        val present = texts.zipWithIndex.filter { case (t, _) => t != null && t.nonEmpty }
        val out = Array.fill[Any](texts.length)(null)
        if (present.nonEmpty) {
          val ids = present.map { case (t, _) => bundle.tokenizer.encode(t, maxLen) }
          val embs = bundle.encoder.meanPoolNormalized(bundle.encoder.forward(ids))
          present.zip(embs).foreach { case ((_, i), e) => out(i) = e.toSeq }
        }
        out.toSeq
    }(batchSize)

  /** Append `outCol: float` — cross-encoder relevance of a sentence pair
    * (reference `huggingface.py:85`). Mirrors sentence-transformers
    * CrossEncoder.predict: single-logit heads go through sigmoid,
    * multi-label heads return the max softmax probability.
    */
  def crossEncoderScore(df: DataFrame, colA: String, colB: String, outCol: String,
      modelDir: String, maxLen: Int = 128, batchSize: Int = 32): DataFrame =
    mapBatches(df, Seq(colA, colB), outCol, FloatType, modelDir) { (bundle, rows) =>
      val enc = rows.map { case Seq(a, b) =>
        bundle.tokenizer.encodePair(if (a == null) "" else a, if (b == null) "" else b, maxLen)
      }
      val encoded = bundle.encoder.forward(enc.map(_._1), Some(enc.map(_._2)))
      val logits = bundle.encoder.classify(bundle.encoder.pooledOutput(encoded))
      logits.toSeq.map { l =>
        if (l.length == 1) (1.0 / (1.0 + math.exp(-l(0).toDouble))).toFloat
        else {
          Tensors.softmaxRows(l, 1, l.length)
          l.max
        }
      }
    }(batchSize)

  /** Append `outCol: array<struct<label string, score float>>` — top-k
    * softmax classes (reference text_classification, `huggingface.py:1175`,
    * which returns label/score pairs ordered by score).
    */
  def textClassification(df: DataFrame, textCol: String, outCol: String,
      modelDir: String, topK: Int = 5, maxLen: Int = 128, batchSize: Int = 32): DataFrame = {
    val elemType = StructType(Seq(
      StructField("label", StringType), StructField("score", FloatType)))
    mapBatches(df, Seq(textCol), outCol, ArrayType(elemType), modelDir) {
      (bundle, rows) =>
        val ids = rows.map(r => bundle.tokenizer.encode(Option(r.head).getOrElse(""), maxLen))
        val logits = bundle.encoder.classify(
          bundle.encoder.pooledOutput(bundle.encoder.forward(ids)))
        logits.toSeq.map { l =>
          Tensors.softmaxRows(l, 1, l.length)
          l.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(topK).map { case (s, i) =>
            Row(bundle.cfg.id2label.getOrElse(i, s"LABEL_$i"), s)
          }.toSeq
        }
    }(batchSize)
  }

  /** Append `outCol: array<struct<token string, label string, score
    * float>>` — per-token classification / NER (reference
    * `huggingface.py:1342`): every wordpiece of the input gets its argmax
    * label and softmax score ([CLS]/[SEP] skipped).
    */
  def tokenClassification(df: DataFrame, textCol: String, outCol: String,
      modelDir: String, maxLen: Int = 128, batchSize: Int = 32): DataFrame = {
    val elemType = StructType(Seq(StructField("token", StringType),
      StructField("label", StringType), StructField("score", FloatType)))
    mapBatches(df, Seq(textCol), outCol, ArrayType(elemType), modelDir) {
      (bundle, rows) =>
        val texts = rows.map(r => Option(r.head).getOrElse(""))
        val pieces = texts.map(t => bundle.tokenizer.tokenize(t).take(maxLen - 2))
        val ids = pieces.map(p =>
          (bundle.tokenizer.clsId +: p.map(bundle.tokenizer.vocab) :+ bundle.tokenizer.sepId).toArray)
        val enc = bundle.encoder.forward(ids)
        rows.indices.map { b =>
          val logits = bundle.encoder.classifyTokens(enc, b)
          pieces(b).zipWithIndex.map { case (tok, i) =>
            val l = logits(i + 1) // skip [CLS]
            Tensors.softmaxRows(l, 1, l.length)
            val best = l.indices.maxBy(l(_))
            Row(tok, bundle.cfg.id2label.getOrElse(best, s"LABEL_$best"), l(best))
          }
        }
    }(batchSize)
  }

  /** Append `outCol: struct<answer string, score float, start long, end
    * long>` — extractive QA (reference `huggingface.py:1492`): best
    * start/end span over the CONTEXT segment, answer text recovered from
    * wordpiece char offsets into the original context.
    */
  def questionAnswering(df: DataFrame, questionCol: String, contextCol: String,
      outCol: String, modelDir: String, maxLen: Int = 256, maxAnswerTokens: Int = 30,
      batchSize: Int = 16): DataFrame = {
    val outType = StructType(Seq(StructField("answer", StringType),
      StructField("score", FloatType), StructField("start", LongType),
      StructField("end", LongType)))
    mapBatches(df, Seq(questionCol, contextCol), outCol, outType, modelDir) {
      (bundle, rows) =>
        rows.map { case Seq(q0, c0) =>
          val question = Option(q0).getOrElse("")
          val context = Option(c0).getOrElse("")
          val tk = bundle.tokenizer
          val qIds = tk.tokenize(question).map(tk.vocab)
          val cSpans = tk.tokenizeWithOffsets(context)
          val budget = maxLen - 3 - qIds.length
          val cKept = cSpans.take(math.max(0, budget))
          if (cKept.isEmpty) Row(null, null, null, null)
          else {
            val ids = (tk.clsId +: qIds :+ tk.sepId) ++
              cKept.map(s => tk.vocab(s._1)) :+ tk.sepId
            val types = Array.fill(qIds.length + 2)(0) ++ Array.fill(cKept.length + 1)(1)
            val enc = bundle.encoder.forward(Seq(ids.toArray), Some(Seq(types)))
            val span = bundle.encoder.qaSpanLogits(enc, 0)
            val cOff = qIds.length + 2 // first context-token position
            val cEndEx = cOff + cKept.length
            // softmax over context positions, best valid (s ≤ e) pair
            val starts = span.slice(cOff, cEndEx).map(_._1)
            val ends = span.slice(cOff, cEndEx).map(_._2)
            Tensors.softmaxRows(starts, 1, starts.length)
            Tensors.softmaxRows(ends, 1, ends.length)
            var best = (0, 0); var bestP = -1.0
            var s = 0
            while (s < starts.length) {
              var e = s
              while (e < math.min(starts.length, s + maxAnswerTokens)) {
                val p = starts(s).toDouble * ends(e)
                if (p > bestP) { bestP = p; best = (s, e) }
                e += 1
              }
              s += 1
            }
            val (bs, be) = best
            val charStart = cKept(bs)._2
            val charEnd = cKept(be)._3
            Row(context.substring(charStart, charEnd), bestP.toFloat,
              charStart.toLong, charEnd.toLong)
          }
        }
    }(batchSize)
  }

  /** Shared plumbing: broadcast the bundle, stream partitions through in
    * `batchSize` groups, append one computed column.
    */
  private def mapBatches(df: DataFrame, inCols: Seq[String], outCol: String,
      outType: DataType, modelDir: String)(
      fn: (ModelBundle, Seq[Seq[String]]) => Seq[Any])(batchSize: Int): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(load(modelDir))
    val idxs = inCols.map(df.schema.fieldIndex)
    val schema = StructType(df.schema.fields :+ StructField(outCol, outType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.grouped(batchSize).flatMap { batch =>
        val inputs = batch.map(r => idxs.map(i => if (r.isNullAt(i)) null else r.getString(i)))
        val outs = fn(bundle, inputs)
        batch.zip(outs).map { case (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }(enc)
  }

  /** Register `name(text) -> array<float>` as a SQL UDF so local-model
    * embeddings can be a stored computed column / embedding-index expr
    * (reference: `add_embedding_index(embedding=sentence_transformer.using(
    * model_id=…))`, `huggingface.py:60-76`). The bundle rides the closure;
    * per-row forward (no cross-row batching) — use `sentenceTransformer`
    * for bulk backfills.
    */
  def registerEmbedUdf(spark: SparkSession, name: String, modelDir: String,
      maxLen: Int = 128): Unit = {
    val bundle = load(modelDir)
    spark.udf.register(name, (text: String) =>
      if (text == null || text.isEmpty) null
      else {
        val ids = Seq(bundle.tokenizer.encode(text, maxLen))
        bundle.encoder.meanPoolNormalized(bundle.encoder.forward(ids))(0).toSeq
      })
  }

  /** Decode-family scalar UDFs, so captions/detections can be STORED
    * computed columns in the catalog (the reference's
    * `add_computed_column(caption=image_captioning(tbl.image))` /
    * `detections=detr_for_object_detection(...)` patterns). Per-row
    * forward; use the DataFrame surfaces for bulk backfills.
    */
  /** Translation as a registrable UDF (computed-column / component-view
    * surface for the q137 pipeline): Marian beam-search decode with the
    * forced-BOS target language.
    */
  def registerTranslationUdf(spark: SparkSession, name: String,
      modelDir: String, targetLang: Option[String] = None,
      maxSourceTokens: Int = 48, maxNewTokens: Int = 6,
      numBeams: Int = 4): Unit = {
    val bundle = loadMarian(modelDir)
    val forcedBos = targetLang.map(code =>
      bundle.langCodeToId.getOrElse(code, throw new IllegalArgumentException(
        s"Target language code '$code' is not supported by the model.")))
    spark.udf.register(name, (text: String) =>
      if (text == null) null
      else {
        val src = bundle.encodeSource(text, maxSourceTokens)
        bundle.tokenizer.decode(
          bundle.model.generateBeam(src, maxNewTokens, numBeams, forcedBos),
          Set(bundle.cfg.eosTokenId, bundle.cfg.decoderStartTokenId) ++
            bundle.langCodeToId.values)
      })
  }

  /** Wav2Vec2 CTC ASR as a registrable UDF (computed-column surface for
    * the q140 pipeline).
    */
  def registerAsrUdf(spark: SparkSession, name: String,
      modelDir: String): Unit = {
    val bundle = loadWav2Vec2(modelDir)
    spark.udf.register(name, (wav: Array[Byte]) =>
      if (wav == null) null
      else {
        val (_, samples) = graft.functions.Audio.decodePcm(wav)
        Ctc.toText(Ctc.decode(
          bundle.model.frameIds(samples.map(_ / 32768.0f)),
          blank = bundle.cfg.padTokenId), bundle.idToToken)
      })
  }

  def registerCaptionUdf(spark: SparkSession, name: String, modelDir: String,
      maxNewTokens: Int = 8): Unit = {
    val bundle = loadCaptioner(modelDir)
    spark.udf.register(name, (png: Array[Byte]) =>
      if (png == null) null
      else bundle.tokenizer.decode(bundle.model.caption(
        bundle.model.preprocess(graft.functions.Images.decode(png)), maxNewTokens)))
  }

  /** Detection labels as a UDF: label_text array of above-threshold
    * detections (the full struct surface is `objectDetection`).
    */
  def registerDetectUdf(spark: SparkSession, name: String, modelDir: String,
      threshold: Float = 0.3f, shortestEdge: Int = 24, maxSize: Int = 48): Unit = {
    val bundle = loadDetr(modelDir)
    spark.udf.register(name, (png: Array[Byte]) =>
      if (png == null) null
      else {
        val img = graft.functions.Images.decode(png)
        val (pix, h, wd) = bundle.model.preprocess(img, shortestEdge, maxSize)
        val (logits, boxes) = bundle.model.detect(pix, h, wd)
        bundle.model.postProcess(logits, boxes, threshold,
          img.getWidth, img.getHeight).map(_.labelText)
      })
  }

  // ---------------------------------------------------------------------
  // CLIP joint image/text embedding (reference huggingface.py:127-205)
  // ---------------------------------------------------------------------

  /** A loaded CLIP checkpoint dir: config.json + model.safetensors +
    * vocab.json + merges.txt (the HF CLIP layout).
    */
  final class ClipBundle(val cfg: ClipConfig, val weights: Map[String, Tensor],
      val vocab: Map[String, Int], val merges: Seq[(String, String)])
      extends Serializable {
    @transient lazy val model: ClipModel = new ClipModel(cfg, weights)
    @transient lazy val tokenizer: Bpe = new Bpe(vocab, merges, clipMode = true)
    def sotId: Int = vocab("<|startoftext|>")
    def eosId: Int = cfg.text.eosTokenId

    def encodeText(text: String): Array[Int] = {
      val body = tokenizer.encode(text).take(cfg.text.maxPositions - 2)
      (sotId +: body :+ eosId).toArray
    }
  }

  def loadClip(modelDir: String): ClipBundle = {
    val cfg = ClipConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    val weights = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val node = new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(modelDir, "vocab.json")))
    val vocab = scala.jdk.CollectionConverters.IteratorHasAsScala(node.properties().iterator())
      .asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
    new ClipBundle(cfg, weights, vocab, readMerges(modelDir))
  }

  private def readMerges(modelDir: String): Seq[(String, String)] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(Paths.get(modelDir, "merges.txt"), StandardCharsets.UTF_8))
      .asScala.iterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val sp = l.split(" ", 2); (sp(0), sp(1)) }.toSeq

  /** Append `outCol: array<float>` — the CLIP text-tower embedding
    * (unit-norm, `projection_dim` wide; same space as `clipImage`).
    */
  def clipText(df: DataFrame, textCol: String, outCol: String,
      modelDir: String, batchSize: Int = 32): DataFrame =
    mapClipBatches(df, textCol, outCol, modelDir, binary = false) { (bundle, vals) =>
      bundle.model.textEmbed(vals.map(v => bundle.encodeText(v.asInstanceOf[String])))
    }(batchSize)

  /** Append `outCol: array<float>` — the CLIP vision-tower embedding of an
    * encoded image (any codec `functions.Images.decode` reads).
    */
  def clipImage(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, batchSize: Int = 8): DataFrame =
    mapClipBatches(df, imageCol, outCol, modelDir, binary = true) { (bundle, vals) =>
      bundle.model.imageEmbed(vals.map(v =>
        bundle.model.preprocess(
          graft.functions.Images.decode(v.asInstanceOf[Array[Byte]]))))
    }(batchSize)

  private def mapClipBatches(df: DataFrame, inCol: String, outCol: String,
      modelDir: String, binary: Boolean)(
      fn: (ClipBundle, Seq[Any]) => Array[Array[Float]])(batchSize: Int): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadClip(modelDir))
    val idx = df.schema.fieldIndex(inCol)
    val schema = StructType(df.schema.fields :+ StructField(outCol, ArrayType(FloatType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.grouped(batchSize).flatMap { batch =>
        val present = batch.zipWithIndex.filter { case (r, _) => !r.isNullAt(idx) }
        val out = Array.fill[Any](batch.length)(null)
        if (present.nonEmpty) {
          val vals = present.map { case (r, _) => r.get(idx) }
          fn(bundle, vals).zip(present).foreach { case (e, (_, i)) => out(i) = e.toSeq }
        }
        batch.zip(out).map { case (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }(enc)
  }

  /** Deterministic tiny CLIP checkpoint (HF layout, seeded weights). */
  def writeTinyClipModel(dir: String, seed: Long = 42L, hidden: Int = 16,
      layers: Int = 2, heads: Int = 2, intermediate: Int = 32,
      imageSize: Int = 16, patchSize: Int = 8, projectionDim: Int = 8,
      textMaxPos: Int = 32): Unit = {
    val (vocabToks, merges) = Bpe.tinyClipVocab
    val eosId = 1 // <|endoftext|> position in tinyClipVocab
    val rnd = new java.util.Random(seed)
    def gauss(n: Int, scale: Double): Array[Float] =
      Array.fill(n)((rnd.nextGaussian() * scale).toFloat)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, gauss(shape.product, scale))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))
    val grid = imageSize / patchSize
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    ts += "text_model.embeddings.token_embedding.weight" -> t(vocabToks.length, hidden)(0.1)
    ts += "text_model.embeddings.position_embedding.weight" -> t(textMaxPos, hidden)(0.02)
    ts += "vision_model.embeddings.class_embedding" -> t(hidden)(0.1)
    ts += "vision_model.embeddings.patch_embedding.weight" ->
      Tensor(Array(hidden, 3, patchSize, patchSize),
        gauss(hidden * 3 * patchSize * patchSize, 0.05))
    ts += "vision_model.embeddings.position_embedding.weight" ->
      t(1 + grid * grid, hidden)(0.02)
    ts += "vision_model.pre_layrnorm.weight" -> ones(hidden)
    ts += "vision_model.pre_layrnorm.bias" -> zeros(hidden)
    for (tower <- Seq("text_model", "vision_model"); i <- 0 until layers) {
      val p = s"$tower.encoder.layers.$i."
      Seq("q_proj", "k_proj", "v_proj", "out_proj").foreach { pr =>
        ts += s"${p}self_attn.$pr.weight" -> t(hidden, hidden)(0.08)
        ts += s"${p}self_attn.$pr.bias" -> t(hidden)(0.02)
      }
      ts += s"${p}layer_norm1.weight" -> ones(hidden)
      ts += s"${p}layer_norm1.bias" -> zeros(hidden)
      ts += s"${p}mlp.fc1.weight" -> t(intermediate, hidden)(0.08)
      ts += s"${p}mlp.fc1.bias" -> t(intermediate)(0.02)
      ts += s"${p}mlp.fc2.weight" -> t(hidden, intermediate)(0.08)
      ts += s"${p}mlp.fc2.bias" -> t(hidden)(0.02)
      ts += s"${p}layer_norm2.weight" -> ones(hidden)
      ts += s"${p}layer_norm2.bias" -> zeros(hidden)
    }
    ts += "text_model.final_layer_norm.weight" -> ones(hidden)
    ts += "text_model.final_layer_norm.bias" -> zeros(hidden)
    ts += "vision_model.post_layernorm.weight" -> ones(hidden)
    ts += "vision_model.post_layernorm.bias" -> zeros(hidden)
    ts += "text_projection.weight" -> t(projectionDim, hidden)(0.1)
    ts += "visual_projection.weight" -> t(projectionDim, hidden)(0.1)

    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val cfgJson =
      s"""{"model_type":"clip","projection_dim":$projectionDim,
         |"text_config":{"hidden_size":$hidden,"num_hidden_layers":$layers,
         |"num_attention_heads":$heads,"intermediate_size":$intermediate,
         |"max_position_embeddings":$textMaxPos,"vocab_size":${vocabToks.length},
         |"eos_token_id":$eosId,"hidden_act":"quick_gelu","layer_norm_eps":1e-5},
         |"vision_config":{"hidden_size":$hidden,"num_hidden_layers":$layers,
         |"num_attention_heads":$heads,"intermediate_size":$intermediate,
         |"image_size":$imageSize,"patch_size":$patchSize,
         |"hidden_act":"quick_gelu","layer_norm_eps":1e-5}}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
    Bpe.writeFiles(Paths.get(dir, "vocab.json").toString,
      Paths.get(dir, "merges.txt").toString, vocabToks, merges)
  }

  /** Idempotent shared tiny CLIP checkpoint under the JVM temp dir. */
  def ensureTinyClipModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_clip_s$seed")
    val marker = dir.resolve("merges.txt")
    if (!Files.exists(marker)) writeTinyClipModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // ViT image classification (reference huggingface.py:899)
  // ---------------------------------------------------------------------

  final class VitBundle(val cfg: VitConfig, val weights: Map[String, Tensor])
      extends Serializable {
    @transient lazy val model: VitModel = new VitModel(cfg, weights)
  }

  def loadVit(modelDir: String): VitBundle = {
    val cfg = VitConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    new VitBundle(cfg,
      SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString))
  }

  /** Append `outCol: array<struct<label string, score float>>` — top-k
    * softmax image classes (reference vit_for_image_classification,
    * `huggingface.py:899`) of an encoded-image binary column.
    */
  def imageClassification(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, topK: Int = 5): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadVit(modelDir))
    val idx = df.schema.fieldIndex(imageCol)
    val elemType = StructType(Seq(
      StructField("label", StringType), StructField("score", FloatType)))
    val schema = StructType(df.schema.fields :+ StructField(outCol, ArrayType(elemType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val logits = bundle.model.classifyLogits(bundle.model.preprocess(
              graft.functions.Images.decode(r.getAs[Array[Byte]](idx))))
            Tensors.softmaxRows(logits, 1, logits.length)
            logits.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(topK)
              .map { case (s, i) =>
                Row(bundle.cfg.id2label.getOrElse(i, s"LABEL_$i"), s)
              }.toSeq
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Deterministic tiny ViT checkpoint in the HF layout. */
  def writeTinyVitModel(dir: String, seed: Long = 42L, hidden: Int = 16,
      layers: Int = 2, heads: Int = 2, intermediate: Int = 32,
      imageSize: Int = 16, patchSize: Int = 8, numLabels: Int = 4,
      labels: Seq[String] = Seq.empty): Unit = {
    val rnd = new java.util.Random(seed)
    def gauss(n: Int, scale: Double): Array[Float] =
      Array.fill(n)((rnd.nextGaussian() * scale).toFloat)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, gauss(shape.product, scale))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))
    val grid = imageSize / patchSize
    val l = 1 + grid * grid
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    ts += "vit.embeddings.cls_token" -> Tensor(Array(1, 1, hidden), gauss(hidden, 0.1))
    ts += "vit.embeddings.position_embeddings" ->
      Tensor(Array(1, l, hidden), gauss(l * hidden, 0.02))
    ts += "vit.embeddings.patch_embeddings.projection.weight" ->
      Tensor(Array(hidden, 3, patchSize, patchSize),
        gauss(hidden * 3 * patchSize * patchSize, 0.05))
    ts += "vit.embeddings.patch_embeddings.projection.bias" -> t(hidden)(0.02)
    (0 until layers).foreach { i =>
      val p = s"vit.encoder.layer.$i."
      Seq("query", "key", "value").foreach { qkv =>
        ts += s"${p}attention.attention.$qkv.weight" -> t(hidden, hidden)(0.08)
        ts += s"${p}attention.attention.$qkv.bias" -> t(hidden)(0.02)
      }
      ts += s"${p}attention.output.dense.weight" -> t(hidden, hidden)(0.08)
      ts += s"${p}attention.output.dense.bias" -> t(hidden)(0.02)
      ts += s"${p}layernorm_before.weight" -> ones(hidden)
      ts += s"${p}layernorm_before.bias" -> zeros(hidden)
      ts += s"${p}intermediate.dense.weight" -> t(intermediate, hidden)(0.08)
      ts += s"${p}intermediate.dense.bias" -> t(intermediate)(0.02)
      ts += s"${p}output.dense.weight" -> t(hidden, intermediate)(0.08)
      ts += s"${p}output.dense.bias" -> t(hidden)(0.02)
      ts += s"${p}layernorm_after.weight" -> ones(hidden)
      ts += s"${p}layernorm_after.bias" -> zeros(hidden)
    }
    ts += "vit.layernorm.weight" -> ones(hidden)
    ts += "vit.layernorm.bias" -> zeros(hidden)
    ts += "classifier.weight" -> t(numLabels, hidden)(0.08)
    ts += "classifier.bias" -> t(numLabels)(0.02)
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val id2label = (0 until numLabels).map(i =>
      s""""$i":"${labels.lift(i).getOrElse(s"LABEL_$i")}"""").mkString(",")
    val cfgJson =
      s"""{"model_type":"vit","hidden_size":$hidden,"num_hidden_layers":$layers,
         |"num_attention_heads":$heads,"intermediate_size":$intermediate,
         |"image_size":$imageSize,"patch_size":$patchSize,
         |"id2label":{$id2label}}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
  }

  def ensureTinyVitModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_vit_s$seed")
    val marker = dir.resolve("config.json")
    if (!Files.exists(marker)) writeTinyVitModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // DETR object detection (reference huggingface.py:220)
  // ---------------------------------------------------------------------

  final class DetrBundle(val cfg: DetrConfig, val weights: Map[String, Tensor])
      extends Serializable {
    @transient lazy val model: DetrModel = new DetrModel(cfg, weights)
  }

  def loadDetr(modelDir: String): DetrBundle = {
    val cfg = DetrConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    new DetrBundle(cfg,
      SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString))
  }

  /** Append `outCol: struct<scores array<float>, labels array<int>,
    * label_text array<string>, boxes array<array<float>>>` — DETR object
    * detections of an encoded-image binary column, mirroring the
    * reference's response dict (`huggingface.py:239-255`; boxes are
    * [x1, y1, x2, y2] in ORIGINAL image pixels, like its
    * `target_sizes=[(h, w)]` call). Null image → null.
    */
  def objectDetection(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, threshold: Float = 0.5f, shortestEdge: Int = 800,
      maxSize: Int = 1333): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadDetr(modelDir))
    val idx = df.schema.fieldIndex(imageCol)
    val outType = StructType(Seq(
      StructField("scores", ArrayType(FloatType)),
      StructField("labels", ArrayType(IntegerType)),
      StructField("label_text", ArrayType(StringType)),
      StructField("boxes", ArrayType(ArrayType(FloatType)))))
    val schema = StructType(df.schema.fields :+ StructField(outCol, outType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val img = graft.functions.Images.decode(r.getAs[Array[Byte]](idx))
            val (pix, h, wd) = bundle.model.preprocess(img, shortestEdge, maxSize)
            val (logits, boxes) = bundle.model.detect(pix, h, wd)
            val dets = bundle.model.postProcess(logits, boxes, threshold,
              img.getWidth, img.getHeight)
            Row(dets.map(_.score), dets.map(_.label), dets.map(_.labelText),
              dets.map(_.box.toSeq))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** COCO-format conversion of an `objectDetection` output struct — the
    * reference's `detr_to_coco` (`huggingface.py:379`): [x1, y1, x2, y2]
    * boxes become [x, y, w, h] annotations plus the image size. Pure
    * column expression (codegen'd, no UDF).
    */
  def detrToCoco(detCol: String, width: Column, height: Column): Column =
    struct(
      struct(width.as("width"), height.as("height")).as("image"),
      expr(s"transform(arrays_zip($detCol.boxes, $detCol.labels), " +
        "z -> struct(array(z.boxes[0], z.boxes[1], z.boxes[2] - z.boxes[0], " +
        "z.boxes[3] - z.boxes[1]) AS bbox, z.labels AS category))")
        .as("annotations"))

  /** Deterministic tiny DETR checkpoint (bottleneck ResNet backbone) in
    * the `use_timm_backbone=false` HF layout.
    */
  def writeTinyDetrModel(dir: String, seed: Long = 42L, dModel: Int = 16,
      layers: Int = 2, heads: Int = 2, ffn: Int = 32, numQueries: Int = 8,
      numLabels: Int = 3, embeddingSize: Int = 4,
      hiddenSizes: Seq[Int] = Seq(8, 16), depths: Seq[Int] = Seq(1, 2)): Unit = {
    val rnd = new java.util.Random(seed)
    def gauss(n: Int, scale: Double): Array[Float] =
      Array.fill(n)((rnd.nextGaussian() * scale).toFloat)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, gauss(shape.product, scale))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    val BB = "model.backbone.conv_encoder.model."
    def bn(stem: String, c: Int): Unit = {
      ts += s"$stem.weight" -> Tensor(Array(c), Array.fill(c)(1f + rnd.nextGaussian().toFloat * 0.05f))
      ts += s"$stem.bias" -> t(c)(0.05)
      ts += s"$stem.running_mean" -> t(c)(0.1)
      ts += s"$stem.running_var" -> Tensor(Array(c),
        Array.fill(c)(1f + math.abs(rnd.nextGaussian()).toFloat * 0.2f))
    }
    ts += BB + "embedder.embedder.convolution.weight" -> t(embeddingSize, 3, 7, 7)(0.08)
    bn(BB + "embedder.embedder.normalization", embeddingSize)
    var cin = embeddingSize
    hiddenSizes.indices.foreach { s =>
      val out = hiddenSizes(s); val reduces = out / 4
      (0 until depths(s)).foreach { l =>
        val p = BB + s"encoder.stages.$s.layers.$l."
        if (l == 0 && (cin != out || s > 0)) {
          ts += s"${p}shortcut.convolution.weight" -> t(out, cin, 1, 1)(0.15)
          bn(s"${p}shortcut.normalization", out)
        }
        ts += s"${p}layer.0.convolution.weight" -> t(reduces, cin, 1, 1)(0.15)
        bn(s"${p}layer.0.normalization", reduces)
        ts += s"${p}layer.1.convolution.weight" -> t(reduces, reduces, 3, 3)(0.1)
        bn(s"${p}layer.1.normalization", reduces)
        ts += s"${p}layer.2.convolution.weight" -> t(out, reduces, 1, 1)(0.15)
        bn(s"${p}layer.2.normalization", out)
        cin = out
      }
    }
    ts += "model.input_projection.weight" -> t(dModel, hiddenSizes.last, 1, 1)(0.1)
    ts += "model.input_projection.bias" -> t(dModel)(0.02)
    ts += "model.query_position_embeddings.weight" -> t(numQueries, dModel)(0.3)
    def attn(p: String): Unit = {
      Seq("q_proj", "k_proj", "v_proj", "out_proj").foreach { proj =>
        ts += s"$p$proj.weight" -> t(dModel, dModel)(0.1)
        ts += s"$p$proj.bias" -> t(dModel)(0.02)
      }
    }
    (0 until layers).foreach { i =>
      val p = s"model.encoder.layers.$i."
      attn(p + "self_attn.")
      ts += s"${p}self_attn_layer_norm.weight" -> ones(dModel)
      ts += s"${p}self_attn_layer_norm.bias" -> zeros(dModel)
      ts += s"${p}fc1.weight" -> t(ffn, dModel)(0.08)
      ts += s"${p}fc1.bias" -> t(ffn)(0.02)
      ts += s"${p}fc2.weight" -> t(dModel, ffn)(0.08)
      ts += s"${p}fc2.bias" -> t(dModel)(0.02)
      ts += s"${p}final_layer_norm.weight" -> ones(dModel)
      ts += s"${p}final_layer_norm.bias" -> zeros(dModel)
    }
    (0 until layers).foreach { i =>
      val p = s"model.decoder.layers.$i."
      attn(p + "self_attn.")
      ts += s"${p}self_attn_layer_norm.weight" -> ones(dModel)
      ts += s"${p}self_attn_layer_norm.bias" -> zeros(dModel)
      attn(p + "encoder_attn.")
      ts += s"${p}encoder_attn_layer_norm.weight" -> ones(dModel)
      ts += s"${p}encoder_attn_layer_norm.bias" -> zeros(dModel)
      ts += s"${p}fc1.weight" -> t(ffn, dModel)(0.08)
      ts += s"${p}fc1.bias" -> t(ffn)(0.02)
      ts += s"${p}fc2.weight" -> t(dModel, ffn)(0.08)
      ts += s"${p}fc2.bias" -> t(dModel)(0.02)
      ts += s"${p}final_layer_norm.weight" -> ones(dModel)
      ts += s"${p}final_layer_norm.bias" -> zeros(dModel)
    }
    ts += "model.decoder.layernorm.weight" -> ones(dModel)
    ts += "model.decoder.layernorm.bias" -> zeros(dModel)
    ts += "class_labels_classifier.weight" -> t(numLabels + 1, dModel)(0.3)
    ts += "class_labels_classifier.bias" -> t(numLabels + 1)(0.1)
    (0 until 3).foreach { i =>
      val outD = if (i == 2) 4 else dModel
      ts += s"bbox_predictor.layers.$i.weight" -> t(outD, dModel)(0.15)
      ts += s"bbox_predictor.layers.$i.bias" -> t(outD)(0.05)
    }
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val id2label = (0 until numLabels).map(i => s""""$i":"OBJ_$i"""").mkString(",")
    val cfgJson =
      s"""{"model_type":"detr","d_model":$dModel,"encoder_layers":$layers,
         |"decoder_layers":$layers,"encoder_attention_heads":$heads,
         |"decoder_attention_heads":$heads,"encoder_ffn_dim":$ffn,
         |"decoder_ffn_dim":$ffn,"num_queries":$numQueries,
         |"use_timm_backbone":false,
         |"backbone_config":{"model_type":"resnet","layer_type":"bottleneck",
         |"embedding_size":$embeddingSize,
         |"hidden_sizes":[${hiddenSizes.mkString(",")}],
         |"depths":[${depths.mkString(",")}]},
         |"id2label":{$id2label}}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
  }

  def ensureTinyDetrModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_detr_s$seed")
    val marker = dir.resolve("config.json")
    if (!Files.exists(marker)) writeTinyDetrModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // DETR panoptic segmentation (reference huggingface.py:313)
  // ---------------------------------------------------------------------

  /** Load a DetrForSegmentation checkpoint: the HF layout nests the
    * detection tower under a `detr.` prefix (`detr.model.backbone...`,
    * `detr.class_labels_classifier...`) with `bbox_attention.*` and
    * `mask_head.*` at top level; strip the prefix so the detection
    * weights line up with DetrModel's names.
    */
  def loadDetrSeg(modelDir: String): DetrBundle = {
    val cfg = DetrConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    val raw = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val weights = raw.map { case (k, v) =>
      (if (k.startsWith("detr.")) k.substring(5) else k) -> v
    }
    require(weights.contains("mask_head.lay1.weight"),
      s"$modelDir is not a segmentation checkpoint (no mask_head tensors)")
    new DetrBundle(cfg, weights)
  }

  /** Append `outCol: struct<segmentation array<array<int>>, segments_info
    * array<struct<id, label_id, label_text, score, was_fused>>>` — DETR
    * panoptic segmentation of an encoded-image binary column, mirroring
    * the reference's `detr_for_segmentation` response
    * (huggingface.py:313-395: the (H, W) segment-id array at ORIGINAL
    * image size plus per-segment metadata). Null image → null.
    */
  def panopticSegmentation(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, threshold: Float = 0.5f, maskThreshold: Float = 0.5f,
      overlapThreshold: Float = 0.8f, labelIdsToFuse: Set[Int] = Set.empty,
      shortestEdge: Int = 800, maxSize: Int = 1333): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadDetrSeg(modelDir))
    val idx = df.schema.fieldIndex(imageCol)
    val segInfoType = StructType(Seq(
      StructField("id", IntegerType), StructField("label_id", IntegerType),
      StructField("label_text", StringType), StructField("score", FloatType),
      StructField("was_fused", BooleanType)))
    val outType = StructType(Seq(
      StructField("segmentation", ArrayType(ArrayType(IntegerType))),
      StructField("segments_info", ArrayType(segInfoType))))
    val schema = StructType(df.schema.fields :+ StructField(outCol, outType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val img = graft.functions.Images.decode(r.getAs[Array[Byte]](idx))
            val (pix, h, wd) = bundle.model.preprocess(img, shortestEdge, maxSize)
            val (logits, _, masks, mh, mw) = bundle.model.segment(pix, h, wd)
            val res = bundle.model.postProcessPanoptic(logits, masks, mh, mw,
              img.getHeight, img.getWidth, threshold, maskThreshold,
              overlapThreshold, labelIdsToFuse)
            Row(res.segmentation.map(_.toSeq).toSeq,
              res.segments.map(s =>
                Row(s.id, s.labelId, s.labelText, s.score, s.wasFused)))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Deterministic tiny DetrForSegmentation checkpoint: the detection
    * tower (4 backbone stages, as the mask head's hard-coded FPN indices
    * 2/1/0 require intermediates) re-namespaced under `detr.`, plus
    * bbox_attention and mask_head tensors. d_model + heads must be
    * divisible by 8 (GroupNorm(8, dim) in the first mask-head layer).
    */
  def writeTinyDetrSegModel(dir: String, seed: Long = 42L): Unit = {
    val dModel = 16; val heads = 8
    val tmp = Files.createTempDirectory("detr-seg-det").toString
    writeTinyDetrModel(tmp, seed, dModel = dModel, layers = 2, heads = heads,
      ffn = 32, numQueries = 6, numLabels = 3, embeddingSize = 4,
      hiddenSizes = Seq(8, 12, 16, 16), depths = Seq(1, 1, 1, 1))
    val rnd = new java.util.Random(seed + 7)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, Array.fill(shape.product)((rnd.nextGaussian() * scale).toFloat))
    // Three targeted overrides so the random checkpoint actually SEGMENTS
    // (otherwise the post-process keep/paint/fuse path never runs in the
    // q121 gate): (a) crank query position embeddings so queries diverge
    // through cross-attention instead of collapsing to the memory mean;
    // (b) suppress the no-object class bias (a uniformly random class
    // head lets no-object win every softmax); (c) larger classifier
    // weights for per-query class variety.
    val det = SafeTensors.read(Paths.get(tmp, "model.safetensors").toString)
      .map { case (k, v) => s"detr.$k" -> v } ++ Map(
      "detr.model.query_position_embeddings.weight" -> t(6, dModel)(1.2)) ++
      // (d) peaked per-query cross-attention: with 0.1-scale Q/K the
      // softmax over memory is near-uniform, every query reads the memory
      // MEAN, and all queries collapse to one output — no per-query masks
      (0 until 2).flatMap { i =>
        Seq(
          s"detr.model.decoder.layers.$i.encoder_attn.q_proj.weight" -> t(dModel, dModel)(0.6),
          s"detr.model.decoder.layers.$i.encoder_attn.k_proj.weight" -> t(dModel, dModel)(0.6))
      } ++ Map(
      "detr.class_labels_classifier.weight" -> t(3 + 1, dModel)(0.9),
      "detr.class_labels_classifier.bias" -> {
        val b = Array.fill(3 + 1)((rnd.nextGaussian() * 0.3).toFloat)
        b(3) = -2.5f // no-object
        Tensor(Array(3 + 1), b)
      })
    def gn(name: String, c: Int): Seq[(String, Tensor)] = Seq(
      s"mask_head.$name.weight" -> Tensor(Array(c),
        Array.fill(c)(1f + rnd.nextGaussian().toFloat * 0.05f)),
      s"mask_head.$name.bias" -> t(c)(0.02))
    val dim = dModel + heads // 24
    val inter = Seq(dim, dModel / 2, dModel / 4, dModel / 8, dModel / 16) // 24,8,4,2,1
    val fpnC = Seq(16, 12, 8) // hidden_sizes[2], [1], [0]
    val seg = Seq.newBuilder[(String, Tensor)]
    seg += "bbox_attention.q_linear.weight" -> t(dModel, dModel)(0.12)
    seg += "bbox_attention.q_linear.bias" -> t(dModel)(0.02)
    seg += "bbox_attention.k_linear.weight" -> t(dModel, dModel)(0.12)
    seg += "bbox_attention.k_linear.bias" -> t(dModel)(0.02)
    seg += "mask_head.lay1.weight" -> t(dim, dim, 3, 3)(0.08)
    seg += "mask_head.lay1.bias" -> t(dim)(0.02)
    seg ++= gn("gn1", dim)
    seg += "mask_head.lay2.weight" -> t(inter(1), dim, 3, 3)(0.08)
    seg += "mask_head.lay2.bias" -> t(inter(1))(0.02)
    seg ++= gn("gn2", inter(1))
    (0 until 3).foreach { i =>
      seg += s"mask_head.adapter${i + 1}.weight" -> t(inter(i + 1), fpnC(i), 1, 1)(0.15)
      seg += s"mask_head.adapter${i + 1}.bias" -> t(inter(i + 1))(0.02)
      seg += s"mask_head.lay${i + 3}.weight" -> t(inter(i + 2), inter(i + 1), 3, 3)(0.12)
      seg += s"mask_head.lay${i + 3}.bias" -> t(inter(i + 2))(0.02)
      seg ++= gn(s"gn${i + 3}", inter(i + 2))
    }
    // sharp output logits: sigmoid(mask)·score must be able to clear the
    // post-process maskThreshold, or original_area is always 0
    seg += "mask_head.out_lay.weight" -> t(1, inter(4), 3, 3)(2.0)
    seg += "mask_head.out_lay.bias" -> t(1)(0.5)
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString,
      (det.toSeq ++ seg.result()).sortBy(_._1), Map("format" -> "pt"))
    Files.copy(Paths.get(tmp, "config.json"), Paths.get(dir, "config.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def ensureTinyDetrSegModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_detrseg_v3_s$seed")
    val marker = dir.resolve("config.json")
    if (!Files.exists(marker)) writeTinyDetrSegModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // SAM promptable segmentation (reference huggingface.py:419, 557)
  // ---------------------------------------------------------------------

  final class SamBundle(val cfg: SamConfig, val weights: Map[String, Tensor])
      extends Serializable {
    @transient lazy val model: SamModel = new SamModel(cfg, weights)
  }

  def loadSam(modelDir: String): SamBundle = {
    val cfg = SamConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    new SamBundle(cfg,
      SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString))
  }

  /** Append `outCol: struct<scores array<float>, boxes array<array<float>>,
    * masks array<array<array<boolean>>>>` — SAM promptable segmentation,
    * mirroring the reference's `SamForSegmentationResponse`
    * (huggingface.py:404-417: score, [x1,y1,x2,y2] box and binary mask
    * per instance). Prompts are per-call constants (the reference's UDF
    * kwargs): `points` as (x, y, label), `boxes` as [x1,y1,x2,y2], both
    * in fractional [0,1] image coordinates scaled per row to that row's
    * pixel size. Null image → null.
    */
  def samSegmentation(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, points: Seq[(Double, Double, Int)] = Seq.empty,
      boxes: Seq[Seq[Double]] = Seq.empty, multimask: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadSam(modelDir))
    val idx = df.schema.fieldIndex(imageCol)
    val outType = StructType(Seq(
      StructField("scores", ArrayType(FloatType)),
      StructField("boxes", ArrayType(ArrayType(FloatType))),
      StructField("masks", ArrayType(ArrayType(ArrayType(BooleanType))))))
    val schema = StructType(df.schema.fields :+ StructField(outCol, outType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val img = graft.functions.Images.decode(r.getAs[Array[Byte]](idx))
            val pts = points.map { case (x, y, l) =>
              (x * img.getWidth, y * img.getHeight, l) }
            val bxs = boxes.map(b => Array(b(0) * img.getWidth, b(1) * img.getHeight,
              b(2) * img.getWidth, b(3) * img.getHeight))
            val inst = bundle.model.segment(img, pts, bxs, multimask)
            Row(inst.map(_.score), inst.map(_.box.toSeq),
              inst.map(_.mask.map(_.toSeq).toSeq))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Append `outCol` with the automatic-mask-generation result (the
    * reference's `sam_automatic_mask_generation`): point-grid prompts,
    * IoU + stability filtering, greedy mask NMS.
    */
  def samAutomaticMasks(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, gridSize: Int = 8, predIouThresh: Float = 0.7f,
      stabilityThresh: Float = 0.9f, nmsIouThresh: Float = 0.7f): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadSam(modelDir))
    val idx = df.schema.fieldIndex(imageCol)
    val outType = StructType(Seq(
      StructField("scores", ArrayType(FloatType)),
      StructField("boxes", ArrayType(ArrayType(FloatType))),
      StructField("masks", ArrayType(ArrayType(ArrayType(BooleanType))))))
    val schema = StructType(df.schema.fields :+ StructField(outCol, outType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val img = graft.functions.Images.decode(r.getAs[Array[Byte]](idx))
            val inst = bundle.model.automaticMasks(img, gridSize,
              predIouThresh, stabilityThresh, 1.0f, nmsIouThresh)
            Row(inst.map(_.score), inst.map(_.box.toSeq),
              inst.map(_.mask.map(_.toSeq).toSeq))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Append `outCol: array<struct<frame_idx, object_ids, scores, boxes,
    * masks>>` — per-frame TRACKED segmentation of an AVI video column,
    * the reference's `sam3_for_video_segmentation` iterator shape
    * (huggingface.py:680-860): one entry per frame, a stable object id
    * per mask preserved across motion and ≤ maxAge-frame occlusion.
    * Posexplode into a component view for the reference's one-row-per-
    * frame surface. Detection is the automatic-mask-generation loop per
    * frame (the concept-prompt path needs gated SAM 3 text grounding —
    * the documented cut); association is `MaskTrack`'s greedy mask-IoU
    * step, oracle-gated by q138. Weights broadcast once; each video row
    * is independent, so the pass is map-only at any corpus size.
    */
  def samVideoSegmentation(df: DataFrame, videoCol: String, outCol: String,
      modelDir: String, gridSize: Int = 4, predIouThresh: Float = 0.0f,
      stabilityThresh: Float = 0.0f, nmsIouThresh: Float = 0.7f,
      trackIouThresh: Float = 0.4f, maxAge: Int = 2,
      maxFrames: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadSam(modelDir))
    val idx = df.schema.fieldIndex(videoCol)
    val frameType = StructType(Seq(
      StructField("frame_idx", IntegerType),
      StructField("object_ids", ArrayType(IntegerType)),
      StructField("scores", ArrayType(FloatType)),
      StructField("boxes", ArrayType(ArrayType(FloatType))),
      StructField("masks", ArrayType(ArrayType(ArrayType(BooleanType))))))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(frameType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else trackVideoFrames(bundle, r.getAs[Array[Byte]](idx), gridSize,
            predIouThresh, stabilityThresh, nmsIouThresh, trackIouThresh,
            maxAge, maxFrames).map(f =>
              Row(f.frame_idx, f.object_ids, f.scores, f.boxes, f.masks))
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** One tracked frame of `samVideoSegmentation` (the reference's
    * Sam3VideoSegmentationFrame minus the re-extracted `frame` column —
    * frames re-extract from the source video by `frame_idx`, mirroring
    * the unstored-column design).
    */
  final case class TrackedFrame(frame_idx: Int, object_ids: Seq[Int],
      scores: Seq[Float], boxes: Seq[Seq[Float]],
      masks: Seq[Seq[Seq[Boolean]]])

  private def trackVideoFrames(bundle: SamBundle, video: Array[Byte],
      gridSize: Int, predIouThresh: Float, stabilityThresh: Float,
      nmsIouThresh: Float, trackIouThresh: Float, maxAge: Int,
      maxFrames: Int): Seq[TrackedFrame] = {
    val payloads = graft.functions.Video.readFramesAny(video)
    val frames = if (maxFrames > 0) payloads.take(maxFrames) else payloads
    var tracks = Seq.empty[MaskTrack.Track]
    var nextId = 0
    frames.zipWithIndex.map { case (jpeg, fi) =>
      val img = graft.functions.Images.decode(jpeg)
      val inst = bundle.model.automaticMasks(img, gridSize,
        predIouThresh, stabilityThresh, 1.0f, nmsIouThresh)
      val step = MaskTrack.step(tracks, inst.map(_.mask.flatten),
        trackIouThresh, maxAge, nextId)
      tracks = step.tracks
      nextId = step.nextId
      TrackedFrame(fi, step.ids, inst.map(_.score), inst.map(_.box.toSeq),
        inst.map(_.mask.map(_.toSeq).toSeq))
    }
  }

  /** The same tracked-segmentation pass as a registrable UDF, so it can
    * drive a COMPONENT VIEW (`create_view(iterator=
    * sam3_for_video_segmentation(...))`, the reference's flagship use).
    * The bundle is serialized with the closure — fine for view refresh
    * batches; the broadcast path is `samVideoSegmentation`.
    */
  def samVideoTrackUdf(modelDir: String, gridSize: Int = 4,
      predIouThresh: Float = 0.0f, stabilityThresh: Float = 0.0f,
      nmsIouThresh: Float = 0.7f, trackIouThresh: Float = 0.4f,
      maxAge: Int = 2, maxFrames: Int = 0)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bundle = loadSam(modelDir)
    org.apache.spark.sql.functions.udf { (video: Array[Byte]) =>
      if (video == null) null
      else trackVideoFrames(bundle, video, gridSize, predIouThresh,
        stabilityThresh, nmsIouThresh, trackIouThresh, maxAge, maxFrames)
    }
  }

  /** Deterministic tiny SAM checkpoint in the HF SamModel layout:
    * 2-layer ViTDet (window layer 0, global layer 1, decomposed rel-pos),
    * random-Fourier prompt encoder, 2-layer two-way mask decoder.
    */
  def writeTinySamModel(dir: String, seed: Long = 42L): Unit = {
    val hid = 8; val heads = 2; val dh = hid / heads // vision
    val g = 4; val patch = 4; val s = 16 // grid, patch, image size
    val c = 8 // prompt/decoder hidden = neck output channels
    val rnd = new java.util.Random(seed)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, Array.fill(shape.product)((rnd.nextGaussian() * scale).toFloat))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    ts += "shared_image_embedding.positional_embedding" -> t(2, c / 2)(1.0)
    ts += "vision_encoder.patch_embed.projection.weight" -> t(hid, 3, patch, patch)(0.15)
    ts += "vision_encoder.patch_embed.projection.bias" -> t(hid)(0.02)
    ts += "vision_encoder.pos_embed" -> t(1, g, g, hid)(0.3)
    (0 until 2).foreach { i =>
      val p = s"vision_encoder.layers.$i."
      val span = if (i == 1) 2 * g - 1 else 2 * 2 - 1 // global vs window 2
      ts += s"${p}layer_norm1.weight" -> ones(hid)
      ts += s"${p}layer_norm1.bias" -> zeros(hid)
      ts += s"${p}attn.qkv.weight" -> t(3 * hid, hid)(0.25)
      ts += s"${p}attn.qkv.bias" -> t(3 * hid)(0.02)
      ts += s"${p}attn.proj.weight" -> t(hid, hid)(0.2)
      ts += s"${p}attn.proj.bias" -> t(hid)(0.02)
      ts += s"${p}attn.rel_pos_h" -> t(span, dh)(0.2)
      ts += s"${p}attn.rel_pos_w" -> t(span, dh)(0.2)
      ts += s"${p}layer_norm2.weight" -> ones(hid)
      ts += s"${p}layer_norm2.bias" -> zeros(hid)
      ts += s"${p}mlp.lin1.weight" -> t(2 * hid, hid)(0.2)
      ts += s"${p}mlp.lin1.bias" -> t(2 * hid)(0.02)
      ts += s"${p}mlp.lin2.weight" -> t(hid, 2 * hid)(0.2)
      ts += s"${p}mlp.lin2.bias" -> t(hid)(0.02)
    }
    ts += "vision_encoder.neck.conv1.weight" -> t(c, hid, 1, 1)(0.3)
    ts += "vision_encoder.neck.layer_norm1.weight" -> ones(c)
    ts += "vision_encoder.neck.layer_norm1.bias" -> zeros(c)
    ts += "vision_encoder.neck.conv2.weight" -> t(c, c, 3, 3)(0.2)
    ts += "vision_encoder.neck.layer_norm2.weight" -> ones(c)
    ts += "vision_encoder.neck.layer_norm2.bias" -> zeros(c)
    (0 until 4).foreach { i =>
      ts += s"prompt_encoder.point_embed.$i.weight" -> t(1, c)(0.5)
    }
    ts += "prompt_encoder.not_a_point_embed.weight" -> t(1, c)(0.5)
    ts += "prompt_encoder.no_mask_embed.weight" -> t(1, c)(0.3)
    ts += "mask_decoder.iou_token.weight" -> t(1, c)(0.5)
    ts += "mask_decoder.mask_tokens.weight" -> t(4, c)(0.5)
    def attnW(stem: String, inner: Int): Unit = {
      ts += s"$stem.q_proj.weight" -> t(inner, c)(0.3)
      ts += s"$stem.q_proj.bias" -> t(inner)(0.02)
      ts += s"$stem.k_proj.weight" -> t(inner, c)(0.3)
      ts += s"$stem.k_proj.bias" -> t(inner)(0.02)
      ts += s"$stem.v_proj.weight" -> t(inner, c)(0.3)
      ts += s"$stem.v_proj.bias" -> t(inner)(0.02)
      ts += s"$stem.out_proj.weight" -> t(c, inner)(0.3)
      ts += s"$stem.out_proj.bias" -> t(c)(0.02)
    }
    (0 until 2).foreach { i =>
      val p = s"mask_decoder.transformer.layers.$i"
      attnW(s"$p.self_attn", c)
      attnW(s"$p.cross_attn_token_to_image", c / 2)
      attnW(s"$p.cross_attn_image_to_token", c / 2)
      (1 to 4).foreach { ln =>
        ts += s"$p.layer_norm$ln.weight" -> ones(c)
        ts += s"$p.layer_norm$ln.bias" -> zeros(c)
      }
      ts += s"$p.mlp.lin1.weight" -> t(2 * c, c)(0.2)
      ts += s"$p.mlp.lin1.bias" -> t(2 * c)(0.02)
      ts += s"$p.mlp.lin2.weight" -> t(c, 2 * c)(0.2)
      ts += s"$p.mlp.lin2.bias" -> t(c)(0.02)
    }
    attnW("mask_decoder.transformer.final_attn_token_to_image", c / 2)
    ts += "mask_decoder.transformer.layer_norm_final_attn.weight" -> ones(c)
    ts += "mask_decoder.transformer.layer_norm_final_attn.bias" -> zeros(c)
    ts += "mask_decoder.upscale_conv1.weight" -> t(c, c / 4, 2, 2)(0.4)
    ts += "mask_decoder.upscale_conv1.bias" -> t(c / 4)(0.05)
    ts += "mask_decoder.upscale_layer_norm.weight" -> ones(c / 4)
    ts += "mask_decoder.upscale_layer_norm.bias" -> zeros(c / 4)
    ts += "mask_decoder.upscale_conv2.weight" -> t(c / 4, c / 8, 2, 2)(0.6)
    ts += "mask_decoder.upscale_conv2.bias" -> t(c / 8)(0.05)
    (0 until 4).foreach { i =>
      val p = s"mask_decoder.output_hypernetworks_mlps.$i"
      ts += s"$p.proj_in.weight" -> t(c, c)(0.3)
      ts += s"$p.proj_in.bias" -> t(c)(0.02)
      ts += s"$p.layers.0.weight" -> t(c, c)(0.3)
      ts += s"$p.layers.0.bias" -> t(c)(0.02)
      ts += s"$p.proj_out.weight" -> t(c / 8, c)(0.8)
      ts += s"$p.proj_out.bias" -> t(c / 8)(0.3)
    }
    ts += "mask_decoder.iou_prediction_head.proj_in.weight" -> t(c, c)(0.3)
    ts += "mask_decoder.iou_prediction_head.proj_in.bias" -> t(c)(0.02)
    ts += "mask_decoder.iou_prediction_head.layers.0.weight" -> t(c, c)(0.3)
    ts += "mask_decoder.iou_prediction_head.layers.0.bias" -> t(c)(0.02)
    ts += "mask_decoder.iou_prediction_head.proj_out.weight" -> t(4, c)(0.5)
    ts += "mask_decoder.iou_prediction_head.proj_out.bias" -> t(4)(0.3)
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val cfgJson =
      s"""{"model_type":"sam",
         |"vision_config":{"hidden_size":$hid,"num_hidden_layers":2,
         |"num_attention_heads":$heads,"patch_size":$patch,"image_size":$s,
         |"window_size":2,"global_attn_indexes":[1],"output_channels":$c,
         |"mlp_ratio":2.0},
         |"prompt_encoder_config":{"hidden_size":$c,"image_embedding_size":$g,
         |"input_image_size":$s},
         |"mask_decoder_config":{"num_attention_heads":2,"mlp_dim":${2 * c},
         |"attention_downsample_rate":2,"num_multimask_outputs":3}}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
  }

  def ensureTinySamModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_sam_s$seed")
    val marker = dir.resolve("config.json")
    if (!Files.exists(marker)) writeTinySamModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // YOLOX object detection (reference yolox.py:25)
  // ---------------------------------------------------------------------

  final class YoloxBundle(val cfg: YoloxConfig, val weights: Map[String, Tensor])
      extends Serializable {
    @transient lazy val model: YoloxModel = new YoloxModel(cfg, weights)
  }

  def loadYolox(modelDir: String): YoloxBundle = {
    val cfg = YoloxConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    new YoloxBundle(cfg,
      SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString))
  }

  /** Append `outCol: struct<bboxes array<array<float>>, scores
    * array<float>, labels array<int>>` — YOLOX detections mirroring the
    * reference's `YoloxResponse` (yolox.py:18-21); boxes [x1,y1,x2,y2]
    * in ORIGINAL image pixels (the processor divides by the resize
    * ratio). Null image → null.
    */
  def yoloxDetection(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, threshold: Float = 0.5f, inputSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadYolox(modelDir))
    val idx = df.schema.fieldIndex(imageCol)
    val outType = StructType(Seq(
      StructField("bboxes", ArrayType(ArrayType(FloatType))),
      StructField("scores", ArrayType(FloatType)),
      StructField("labels", ArrayType(IntegerType))))
    val schema = StructType(df.schema.fields :+ StructField(outCol, outType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val img = graft.functions.Images.decode(r.getAs[Array[Byte]](idx))
            val (pix, ratio) = bundle.model.preprocess(img, inputSize)
            val dets = bundle.model.detect(pix, inputSize, inputSize, threshold)
            Row(dets.map(_.box.map(_ / ratio).toSeq),
              dets.map(_.score), dets.map(_.label))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Greedy per-class NMS over (box[x1,y1,x2,y2], score, label) — the
    * merge step of tiled inference, exposed for direct unit pinning.
    */
  private[graft] def nmsPerClass(dets: Seq[(Array[Float], Float, Int)],
      iouThr: Float): Seq[(Array[Float], Float, Int)] = {
    def iou(a: Array[Float], b: Array[Float]): Float = {
      val ix = math.max(0f, math.min(a(2), b(2)) - math.max(a(0), b(0)))
      val iy = math.max(0f, math.min(a(3), b(3)) - math.max(a(1), b(1)))
      val inter = ix * iy
      val ua = (a(2) - a(0)) * (a(3) - a(1)) + (b(2) - b(0)) * (b(3) - b(1)) - inter
      if (ua <= 0f) 0f else inter / ua
    }
    dets.groupBy(_._3).toSeq.flatMap { case (_, group) =>
      val sorted = group.sortBy(d => (-d._2, d._1(0), d._1(1)))
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Array[Float], Float, Int)]
      sorted.foreach { d =>
        if (!kept.exists(k => iou(k._1, d._1) > iouThr)) kept += d
      }
      kept
    }.sortBy(d => (-d._2, d._3, d._1(0), d._1(1)))
  }

  /** SAHI-style TILED detection (beyond the reference's whole-image
    * yolox.py path): the source image fans out over the tile grid
    * (`Images.tileImages` — exact-size black padding keeps every network
    * input square), each tile runs a fixed-size YOLOX forward at
    * ratio 1, boxes shift by their tile origin, and the union merges
    * with global per-class NMS. Large images cost O(tiles) fixed-size
    * forwards instead of downscaling small objects away; per-row work
    * stays on the executor holding the row.
    */
  def yoloxTiledDetection(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, tileSize: Int, overlap: Int,
      threshold: Float = 0.5f, nmsIou: Float = 0.45f): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadYolox(modelDir))
    val idx = df.schema.fieldIndex(imageCol)
    val outType = StructType(Seq(
      StructField("bboxes", ArrayType(ArrayType(FloatType))),
      StructField("scores", ArrayType(FloatType)),
      StructField("labels", ArrayType(IntegerType))))
    val schema = StructType(df.schema.fields :+ StructField(outCol, outType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val img = graft.functions.Images.decode(r.getAs[Array[Byte]](idx))
            val all = graft.functions.Images
              .tileImages(img, tileSize, tileSize, overlap, overlap)
              .flatMap { case (_, _, x1, y1, tile) =>
                // tile == input size → preprocess ratio is exactly 1
                val (pix, ratio) = bundle.model.preprocess(tile, tileSize)
                bundle.model.detect(pix, tileSize, tileSize, threshold).map {
                  d =>
                    val b = d.box.map(_ / ratio)
                    (Array(b(0) + x1, b(1) + y1, b(2) + x1, b(3) + y1),
                      d.score, d.label)
                }
              }
            val merged = nmsPerClass(all, nmsIou)
            Row(merged.map(_._1.toSeq), merged.map(_._2), merged.map(_._3))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** `yolo_to_coco` (yolox.py:67): [x1,y1,x2,y2] → rounded
    * [x, y, w, h] + category, as a pure column expression.
    */
  def yoloToCoco(detCol: String): Column =
    expr(s"transform(arrays_zip($detCol.bboxes, $detCol.labels), " +
      "z -> struct(array(cast(round(z.bboxes[0]) as int), cast(round(z.bboxes[1]) as int), " +
      "cast(round(z.bboxes[2] - z.bboxes[0]) as int), cast(round(z.bboxes[3] - z.bboxes[1]) as int)) AS bbox, " +
      "z.labels AS category))")

  /** Deterministic tiny YOLOX checkpoint in the official module layout
    * (stem width 4, depth 1 → channels 8/16/32/64, head hidden 16).
    */
  def writeTinyYoloxModel(dir: String, seed: Long = 42L): Unit = {
    val rnd = new java.util.Random(seed)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, Array.fill(shape.product)((rnd.nextGaussian() * scale).toFloat))
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    def bconv(stem: String, cin: Int, cout: Int, k: Int): Unit = {
      ts += s"$stem.conv.weight" -> t(cout, cin, k, k)(0.6 / math.sqrt(cin * k * k))
      ts += s"$stem.bn.weight" -> Tensor(Array(cout),
        Array.fill(cout)(1f + rnd.nextGaussian().toFloat * 0.05f))
      ts += s"$stem.bn.bias" -> t(cout)(0.05)
      ts += s"$stem.bn.running_mean" -> t(cout)(0.05)
      ts += s"$stem.bn.running_var" -> Tensor(Array(cout),
        Array.fill(cout)(1f + math.abs(rnd.nextGaussian()).toFloat * 0.2f))
    }
    def csp(stem: String, cin: Int, cout: Int, n: Int): Unit = {
      val hid = cout / 2
      bconv(s"$stem.conv1", cin, hid, 1)
      bconv(s"$stem.conv2", cin, hid, 1)
      (0 until n).foreach { i =>
        bconv(s"$stem.m.$i.conv1", hid, hid, 1)
        bconv(s"$stem.m.$i.conv2", hid, hid, 3)
      }
      bconv(s"$stem.conv3", 2 * hid, cout, 1)
    }
    val w0 = 4; val c2 = 8; val c3 = 16; val c4 = 32; val c5 = 64
    val B = "backbone.backbone"
    bconv(s"$B.stem.conv", 12, w0, 3)
    bconv(s"$B.dark2.0", w0, c2, 3); csp(s"$B.dark2.1", c2, c2, 1)
    bconv(s"$B.dark3.0", c2, c3, 3); csp(s"$B.dark3.1", c3, c3, 3)
    bconv(s"$B.dark4.0", c3, c4, 3); csp(s"$B.dark4.1", c4, c4, 3)
    bconv(s"$B.dark5.0", c4, c5, 3)
    bconv(s"$B.dark5.1.conv1", c5, c5 / 2, 1)
    bconv(s"$B.dark5.1.conv2", 2 * c5, c5, 1)
    csp(s"$B.dark5.2", c5, c5, 1)
    val P = "backbone"
    bconv(s"$P.lateral_conv0", c5, c4, 1); csp(s"$P.C3_p4", 2 * c4, c4, 1)
    bconv(s"$P.reduce_conv1", c4, c3, 1); csp(s"$P.C3_p3", 2 * c3, c3, 1)
    bconv(s"$P.bu_conv2", c3, c3, 3); csp(s"$P.C3_n3", 2 * c3, c4, 1)
    bconv(s"$P.bu_conv1", c4, c4, 3); csp(s"$P.C3_n4", 2 * c4, c5, 1)
    val hid = c3; val nc = 3
    Seq(c3, c4, c5).zipWithIndex.foreach { case (cin, l) =>
      bconv(s"head.stems.$l", cin, hid, 1)
      (0 until 2).foreach { i =>
        bconv(s"head.cls_convs.$l.$i", hid, hid, 3)
        bconv(s"head.reg_convs.$l.$i", hid, hid, 3)
      }
      ts += s"head.cls_preds.$l.weight" -> t(nc, hid, 1, 1)(0.3)
      ts += s"head.cls_preds.$l.bias" -> t(nc)(0.3)
      ts += s"head.reg_preds.$l.weight" -> t(4, hid, 1, 1)(0.2)
      ts += s"head.reg_preds.$l.bias" -> t(4)(0.2)
      ts += s"head.obj_preds.$l.weight" -> t(1, hid, 1, 1)(0.3)
      ts += s"head.obj_preds.$l.bias" -> t(1)(0.5)
    }
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    Files.write(Paths.get(dir, "config.json"),
      s"""{"model_type":"yolox","num_classes":$nc,"stem_width":$w0,"depth":1}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  def ensureTinyYoloxModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_yolox_s$seed")
    val marker = dir.resolve("config.json")
    if (!Files.exists(marker)) writeTinyYoloxModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // Image captioning: VisionEncoderDecoder (reference huggingface.py:1234)
  // ---------------------------------------------------------------------

  final class CaptionBundle(val vitCfg: VitConfig, val gptCfg: Gpt2Config,
      val weights: Map[String, Tensor], val vocab: Map[String, Int],
      val merges: Seq[(String, String)]) extends Serializable {
    @transient lazy val model: CaptionModel = new CaptionModel(vitCfg, gptCfg, weights)
    @transient lazy val tokenizer: Bpe =
      new Bpe(vocab, merges, clipMode = false, unkToken = "<|endoftext|>")
  }

  /** Load a combined VisionEncoderDecoder checkpoint: `encoder.*` names
    * remap to the ViT tower's `vit.*`, `decoder.transformer.*` to bare
    * GPT-2 names; `decoder.lm_head` is tied and dropped.
    */
  def loadCaptioner(modelDir: String): CaptionBundle = {
    val node = new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(modelDir, "config.json")))
    val m = new ObjectMapper()
    val vitCfg = VitConfig.fromJson(m.writeValueAsString(node.get("encoder")))
    val gptCfg = Gpt2Config.fromJson(m.writeValueAsString(node.get("decoder")))
    val raw = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val weights = raw.flatMap { case (k, v) =>
      if (k.startsWith("encoder.")) Some(s"vit.${k.substring(8)}" -> v)
      else if (k.startsWith("decoder.transformer.")) Some(k.substring(20) -> v)
      else if (k.startsWith("decoder.lm_head")) None // tied to wte
      else Some(k -> v)
    }
    val vnode = new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(modelDir, "vocab.json")))
    val vocab = scala.jdk.CollectionConverters.IteratorHasAsScala(vnode.properties().iterator())
      .asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
    new CaptionBundle(vitCfg, gptCfg, weights, vocab, readMerges(modelDir))
  }

  /** Append `outCol: string` — greedy image caption (reference
    * image_captioning, `huggingface.py:1234`). Null image → null.
    */
  def imageCaptioning(df: DataFrame, imageCol: String, outCol: String,
      modelDir: String, maxNewTokens: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadCaptioner(modelDir))
    val idx = df.schema.fieldIndex(imageCol)
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val pix = bundle.model.preprocess(
              graft.functions.Images.decode(r.getAs[Array[Byte]](idx)))
            bundle.tokenizer.decode(bundle.model.caption(pix, maxNewTokens))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Deterministic tiny ViT-GPT2 captioner in the combined HF layout. */
  def writeTinyCaptionModel(dir: String, seed: Long = 42L, hidden: Int = 16,
      layers: Int = 2, heads: Int = 2, imageSize: Int = 16, patchSize: Int = 8,
      nPositions: Int = 32): Unit = {
    // encoder: reuse the ViT writer, then remap names into the combined
    // layout (exercises the load-time remapping path end-to-end)
    val tmpV = Files.createTempDirectory("cap-vit").toString
    writeTinyVitModel(tmpV, seed, hidden, layers, heads, hidden * 2, imageSize,
      patchSize, numLabels = 2)
    val vitW = SafeTensors.read(Paths.get(tmpV, "model.safetensors").toString)
      .filter { case (k, _) => !k.startsWith("classifier") }
      .map { case (k, v) => s"encoder.${k.stripPrefix("vit.")}" -> v }
    val tmpG = Files.createTempDirectory("cap-gpt").toString
    writeTinyGpt2Model(tmpG, seed + 1, hidden, layers, heads, nPositions)
    val gptW = SafeTensors.read(Paths.get(tmpG, "model.safetensors").toString)
      .map { case (k, v) => s"decoder.transformer.$k" -> v }
    // cross-attention additions per decoder layer
    val rnd = new java.util.Random(seed + 2)
    def gauss(n: Int, scale: Double): Array[Float] =
      Array.fill(n)((rnd.nextGaussian() * scale).toFloat)
    val crossW = (0 until layers).flatMap { i =>
      val p = s"decoder.transformer.h.$i."
      Seq(
        s"${p}crossattention.q_attn.weight" -> Tensor(Array(hidden, hidden), gauss(hidden * hidden, 0.08)),
        s"${p}crossattention.q_attn.bias" -> Tensor(Array(hidden), gauss(hidden, 0.02)),
        s"${p}crossattention.c_attn.weight" -> Tensor(Array(hidden, 2 * hidden), gauss(2 * hidden * hidden, 0.08)),
        s"${p}crossattention.c_attn.bias" -> Tensor(Array(2 * hidden), gauss(2 * hidden, 0.02)),
        s"${p}crossattention.c_proj.weight" -> Tensor(Array(hidden, hidden), gauss(hidden * hidden, 0.08)),
        s"${p}crossattention.c_proj.bias" -> Tensor(Array(hidden), gauss(hidden, 0.02)),
        s"${p}ln_cross_attn.weight" -> Tensor(Array(hidden), Array.fill(hidden)(1f)),
        s"${p}ln_cross_attn.bias" -> Tensor(Array(hidden), new Array[Float](hidden)),
      )
    }
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString,
      (vitW ++ gptW ++ crossW).toSeq.sortBy(_._1), Map("format" -> "pt"))
    val vitJson = new String(Files.readAllBytes(Paths.get(tmpV, "config.json")), StandardCharsets.UTF_8)
    val gptJson = new String(Files.readAllBytes(Paths.get(tmpG, "config.json")), StandardCharsets.UTF_8)
    Files.write(Paths.get(dir, "config.json"),
      s"""{"model_type":"vision-encoder-decoder","encoder":$vitJson,"decoder":$gptJson}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.copy(Paths.get(tmpG, "vocab.json"), Paths.get(dir, "vocab.json"))
    Files.copy(Paths.get(tmpG, "merges.txt"), Paths.get(dir, "merges.txt"))
  }

  def ensureTinyCaptionModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_caption_s$seed")
    val marker = dir.resolve("merges.txt")
    if (!Files.exists(marker)) writeTinyCaptionModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // GPT-2 text generation (reference huggingface.py:1113)
  // ---------------------------------------------------------------------

  final class Gpt2Bundle(val cfg: Gpt2Config, val weights: Map[String, Tensor],
      val vocab: Map[String, Int], val merges: Seq[(String, String)])
      extends Serializable {
    @transient lazy val model: Gpt2Model = new Gpt2Model(cfg, weights)
    @transient lazy val tokenizer: Bpe =
      new Bpe(vocab, merges, clipMode = false, unkToken = "<|endoftext|>")
  }

  def loadGpt2(modelDir: String): Gpt2Bundle = {
    val cfg = Gpt2Config.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    val weights = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val node = new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(modelDir, "vocab.json")))
    val vocab = scala.jdk.CollectionConverters.IteratorHasAsScala(node.properties().iterator())
      .asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
    new Gpt2Bundle(cfg, weights, vocab, readMerges(modelDir))
  }

  /** Append `outCol: string` — greedy continuation of a prompt column
    * (reference text_generation, `huggingface.py:1113`; the pipeline's
    * `return_full_text=False` shape: only the generated suffix). Long
    * prompts keep their TAIL (the conditioning window). Null → null.
    */
  def textGeneration(df: DataFrame, promptCol: String, outCol: String,
      modelDir: String, maxNewTokens: Int = 20): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadGpt2(modelDir))
    val idx = df.schema.fieldIndex(promptCol)
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val prompt = bundle.tokenizer.encode(r.getString(idx))
            val kept = prompt.takeRight(math.max(1, bundle.cfg.nPositions - maxNewTokens))
            val ids =
              if (kept.nonEmpty) kept else Seq(bundle.cfg.eosTokenId) // empty prompt
            bundle.tokenizer.decode(bundle.model.generate(ids, maxNewTokens))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Deterministic tiny GPT-2 checkpoint: byte-level vocab (256 + EOS). */
  def writeTinyGpt2Model(dir: String, seed: Long = 42L, nEmbd: Int = 16,
      layers: Int = 2, heads: Int = 2, nPositions: Int = 64): Unit = {
    val byteToks = Bpe.byteToUnicode.map(_.toString).toSeq
    val vocabToks = byteToks :+ "<|endoftext|>"
    val eosId = 256
    val rnd = new java.util.Random(seed)
    def gauss(n: Int, scale: Double): Array[Float] =
      Array.fill(n)((rnd.nextGaussian() * scale).toFloat)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, gauss(shape.product, scale))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    ts += "wte.weight" -> t(vocabToks.length, nEmbd)(0.1)
    ts += "wpe.weight" -> t(nPositions, nEmbd)(0.02)
    (0 until layers).foreach { i =>
      val p = s"h.$i."
      ts += s"${p}ln_1.weight" -> ones(nEmbd)
      ts += s"${p}ln_1.bias" -> zeros(nEmbd)
      ts += s"${p}attn.c_attn.weight" -> t(nEmbd, 3 * nEmbd)(0.08) // Conv1D [in,out]
      ts += s"${p}attn.c_attn.bias" -> t(3 * nEmbd)(0.02)
      ts += s"${p}attn.c_proj.weight" -> t(nEmbd, nEmbd)(0.08)
      ts += s"${p}attn.c_proj.bias" -> t(nEmbd)(0.02)
      ts += s"${p}ln_2.weight" -> ones(nEmbd)
      ts += s"${p}ln_2.bias" -> zeros(nEmbd)
      ts += s"${p}mlp.c_fc.weight" -> t(nEmbd, 4 * nEmbd)(0.08)
      ts += s"${p}mlp.c_fc.bias" -> t(4 * nEmbd)(0.02)
      ts += s"${p}mlp.c_proj.weight" -> t(4 * nEmbd, nEmbd)(0.08)
      ts += s"${p}mlp.c_proj.bias" -> t(nEmbd)(0.02)
    }
    ts += "ln_f.weight" -> ones(nEmbd)
    ts += "ln_f.bias" -> zeros(nEmbd)
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val cfgJson =
      s"""{"model_type":"gpt2","n_embd":$nEmbd,"n_layer":$layers,"n_head":$heads,
         |"n_positions":$nPositions,"vocab_size":${vocabToks.length},
         |"eos_token_id":$eosId}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
    Bpe.writeFiles(Paths.get(dir, "vocab.json").toString,
      Paths.get(dir, "merges.txt").toString, vocabToks, Seq.empty)
  }

  def ensureTinyGpt2Model(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_gpt2_s$seed")
    val marker = dir.resolve("merges.txt")
    if (!Files.exists(marker)) writeTinyGpt2Model(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // BART summarization (reference huggingface.py:1287)
  // ---------------------------------------------------------------------

  final class BartBundle(val cfg: BartConfig, val weights: Map[String, Tensor],
      val vocab: Map[String, Int], val merges: Seq[(String, String)])
      extends Serializable {
    @transient lazy val model: BartModel = new BartModel(cfg, weights)
    @transient lazy val tokenizer: Bpe =
      new Bpe(vocab, merges, clipMode = false, unkToken = "</s>")
    def encodeSource(text: String, maxLen: Int): Seq[Int] =
      cfg.bosTokenId +: tokenizer.encode(text).take(maxLen - 2) :+ cfg.eosTokenId
  }

  def loadBart(modelDir: String): BartBundle = {
    val cfg = BartConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    val weights = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val node = new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(modelDir, "vocab.json")))
    val vocab = scala.jdk.CollectionConverters.IteratorHasAsScala(node.properties().iterator())
      .asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
    new BartBundle(cfg, weights, vocab, readMerges(modelDir))
  }

  /** Append `outCol: string` — greedy abstractive summary (reference
    * summarization, `huggingface.py:1287`). Null → null.
    */
  def summarization(df: DataFrame, textCol: String, outCol: String,
      modelDir: String, maxSourceTokens: Int = 256, maxNewTokens: Int = 24): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadBart(modelDir))
    val idx = df.schema.fieldIndex(textCol)
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val src = bundle.encodeSource(r.getString(idx), maxSourceTokens)
            val ids = bundle.model.summarize(src, maxNewTokens)
            bundle.tokenizer.decode(ids,
              Set(bundle.cfg.bosTokenId, bundle.cfg.eosTokenId, bundle.cfg.decoderStartTokenId))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Deterministic tiny BART checkpoint (byte-level vocab + specials). */
  def writeTinyBartModel(dir: String, seed: Long = 42L, dModel: Int = 16,
      layers: Int = 2, heads: Int = 2, ffn: Int = 32, maxPos: Int = 64): Unit = {
    val byteToks = Bpe.byteToUnicode.map(_.toString).toSeq
    val vocabToks = byteToks ++ Seq("<s>", "</s>", "<pad>")
    val bosId = 256; val eosId = 257
    val rnd = new java.util.Random(seed)
    def gauss(n: Int, scale: Double): Array[Float] =
      Array.fill(n)((rnd.nextGaussian() * scale).toFloat)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, gauss(shape.product, scale))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    ts += "model.shared.weight" -> t(vocabToks.length, dModel)(0.1)
    ts += "final_logits_bias" -> t(vocabToks.length)(0.02)
    for (side <- Seq("encoder", "decoder")) {
      ts += s"model.$side.embed_positions.weight" -> t(maxPos, dModel)(0.02)
      ts += s"model.$side.layernorm_embedding.weight" -> ones(dModel)
      ts += s"model.$side.layernorm_embedding.bias" -> zeros(dModel)
      for (i <- 0 until layers) {
        val p = s"model.$side.layers.$i."
        val attns = if (side == "decoder") Seq("self_attn", "encoder_attn") else Seq("self_attn")
        attns.foreach { a =>
          Seq("q_proj", "k_proj", "v_proj", "out_proj").foreach { pr =>
            ts += s"$p$a.$pr.weight" -> t(dModel, dModel)(0.08)
            ts += s"$p$a.$pr.bias" -> t(dModel)(0.02)
          }
          ts += s"$p${a}_layer_norm.weight" -> ones(dModel)
          ts += s"$p${a}_layer_norm.bias" -> zeros(dModel)
        }
        ts += s"${p}fc1.weight" -> t(ffn, dModel)(0.08)
        ts += s"${p}fc1.bias" -> t(ffn)(0.02)
        ts += s"${p}fc2.weight" -> t(dModel, ffn)(0.08)
        ts += s"${p}fc2.bias" -> t(dModel)(0.02)
        ts += s"${p}final_layer_norm.weight" -> ones(dModel)
        ts += s"${p}final_layer_norm.bias" -> zeros(dModel)
      }
    }
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val cfgJson =
      s"""{"model_type":"bart","d_model":$dModel,"encoder_layers":$layers,
         |"encoder_attention_heads":$heads,"decoder_layers":$layers,
         |"decoder_attention_heads":$heads,"encoder_ffn_dim":$ffn,
         |"decoder_ffn_dim":$ffn,"max_position_embeddings":$maxPos,
         |"vocab_size":${vocabToks.length},"bos_token_id":$bosId,
         |"eos_token_id":$eosId,"decoder_start_token_id":$eosId}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
    Bpe.writeFiles(Paths.get(dir, "vocab.json").toString,
      Paths.get(dir, "merges.txt").toString, vocabToks, Seq.empty)
  }

  def ensureTinyBartModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_bart_s$seed")
    val marker = dir.resolve("merges.txt")
    if (!Files.exists(marker)) writeTinyBartModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // Marian translation (reference huggingface.py:1566 `translation` —
  // MarianMT/opus-mt seq2seq via AutoModelForSeq2SeqLM). Same post-LN
  // machinery as BART with the Marian variant knobs: sinusoidal positions
  // (offset 0), √d_model embedding scale, no layernorm_embedding, swish
  // FFN, decoder_start = pad. Target language: a forced-BOS token from
  // the tokenizer's lang_code_to_id map when present (the mBART-style
  // path the reference validates against), else Marian's own `>>code<<`
  // source-prefix convention — a plain vocab token in the text.
  // Decode matches the reference's generate kwargs: num_beams=4 beam
  // search with early stopping (BartModel.generateBeam, HF semantics);
  // numBeams=1 falls back to greedy.

  final class MarianBundle(val cfg: BartConfig, val weights: Map[String, Tensor],
      val vocab: Map[String, Int], val merges: Seq[(String, String)],
      val langCodeToId: Map[String, Int],
      val spTokenizerJson: Option[String] = None,
      val spModelProto: Option[Array[Byte]] = None)
      extends Serializable {
    @transient lazy val model: BartModel = new BartModel(cfg, weights)
    /** SentencePiece when the checkpoint ships a tokenizer.json (the real
      * opus-mt layout — closes the byte-level stand-in divergence), else
      * the protobuf `.model`/`source.spm` layout; the GPT-2-byte BPE as
      * the last resort.
      */
    @transient lazy val tokenizer: TextTokenizer = spTokenizerJson
      .map(SentencePiece.fromJsonString)
      .orElse(spModelProto.map(SentencePiece.fromModelBytes))
      .getOrElse(new Bpe(vocab, merges, clipMode = false, unkToken = "</s>"))
    /** Marian source encoding: tokens + `</s>` (no BOS). */
    def encodeSource(text: String, maxLen: Int): Seq[Int] =
      tokenizer.encode(text).take(maxLen - 1) :+ cfg.eosTokenId
  }

  def loadMarian(modelDir: String): MarianBundle = {
    val cfg = BartConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    val weights = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val mapper = new ObjectMapper()
    val node = mapper.readTree(Files.readAllBytes(Paths.get(modelDir, "vocab.json")))
    val vocab = scala.jdk.CollectionConverters.IteratorHasAsScala(node.properties().iterator())
      .asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
    val tokCfgPath = Paths.get(modelDir, "tokenizer_config.json")
    val langs =
      if (!Files.exists(tokCfgPath)) Map.empty[String, Int]
      else {
        val tc = mapper.readTree(Files.readAllBytes(tokCfgPath))
        if (!tc.has("lang_code_to_id")) Map.empty[String, Int]
        else scala.jdk.CollectionConverters.IteratorHasAsScala(
          tc.get("lang_code_to_id").properties().iterator())
          .asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
      }
    val spPath = Paths.get(modelDir, "tokenizer.json")
    val spJson =
      if (Files.exists(spPath))
        Some(new String(Files.readAllBytes(spPath), StandardCharsets.UTF_8))
      else None
    // protobuf sentencepiece models, in the names real checkpoint dirs use
    // (Marian source.spm, XLM-R sentencepiece.bpe.model, T5 spiece.model)
    val spmBytes =
      if (spJson.isDefined) None
      else Seq("source.spm", "sentencepiece.bpe.model", "spiece.model",
        "tokenizer.model")
        .map(Paths.get(modelDir, _)).find(Files.exists(_))
        .map(Files.readAllBytes)
    new MarianBundle(cfg, weights, vocab, readMerges(modelDir), langs, spJson,
      spmBytes)
  }

  /** Append `outCol: string` — greedy translation. `targetLang` resolves
    * through the checkpoint's lang_code_to_id into a forced-BOS token;
    * an unknown code errors with the supported list, mirroring the
    * reference's RequestError (huggingface.py:1612-1623). Null → null.
    */
  def translation(df: DataFrame, textCol: String, outCol: String,
      modelDir: String, targetLang: Option[String] = None,
      maxSourceTokens: Int = 256, maxNewTokens: Int = 24,
      numBeams: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val loaded = loadMarian(modelDir)
    val forcedBos = targetLang.map { code =>
      loaded.langCodeToId.getOrElse(code, throw new IllegalArgumentException(
        s"Target language code '$code' is not supported by the model. " +
          s"Supported languages are: ${loaded.langCodeToId.keys.toSeq.sorted.mkString(", ")}"))
    }
    val bc = spark.sparkContext.broadcast(loaded)
    val idx = df.schema.fieldIndex(textCol)
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val src = bundle.encodeSource(r.getString(idx), maxSourceTokens)
            val ids = bundle.model.generateBeam(src, maxNewTokens, numBeams,
              forcedBos)
            bundle.tokenizer.decode(ids,
              Set(bundle.cfg.eosTokenId, bundle.cfg.decoderStartTokenId) ++
                bundle.langCodeToId.values)
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Deterministic tiny Marian checkpoint: a real SentencePiece unigram
    * tokenizer.json (256 byte-fallback pieces + specials + scored
    * multi-char pieces, so Viterbi segmentation and byte fallback are both
    * live), two `>>code<<` language tokens, marian-type config (swish,
    * scale_embedding, static positions, decoder_start = pad),
    * lang_code_to_id in tokenizer_config.json. The encoder side carries
    * an explicit (gaussian) embed_positions tensor while the decoder
    * side omits it — exercising both the checkpoint-buffer and computed-
    * sinusoidal position paths. vocab.json/merges.txt are still written
    * for the no-tokenizer.json BPE fallback path.
    */
  def writeTinyMarianModel(dir: String, seed: Long = 42L, dModel: Int = 16,
      layers: Int = 2, heads: Int = 2, ffn: Int = 32, maxPos: Int = 64): Unit = {
    // real SentencePiece unigram vocab: 256 byte-fallback pieces, the
    // specials, and a handful of scored multi-char pieces so the Viterbi
    // segmentation is exercised (opus-mt checkpoints ship exactly this
    // layout via tokenizer.json)
    val spExtra = Seq("▁the" -> -1.0, "▁and" -> -1.5, "ing" -> -2.0,
      "er" -> -2.5, "▁" -> -4.0, "he" -> -3.0)
    val vocabToks = (0 until 256).map(b => f"<0x$b%02X>") ++
      Seq("</s>", "<pad>", ">>fra<<", ">>deu<<") ++ spExtra.map(_._1)
    val eosId = 256; val padId = 257
    val rnd = new java.util.Random(seed)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, Array.fill(shape.product)((rnd.nextGaussian() * scale).toFloat))
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    ts += "model.shared.weight" -> t(vocabToks.length, dModel)(0.1)
    ts += "final_logits_bias" -> t(vocabToks.length)(0.02)
    ts += "model.encoder.embed_positions.weight" -> t(maxPos, dModel)(0.02)
    for (side <- Seq("encoder", "decoder")) {
      for (i <- 0 until layers) {
        val p = s"model.$side.layers.$i."
        val attns = if (side == "decoder") Seq("self_attn", "encoder_attn") else Seq("self_attn")
        attns.foreach { a =>
          Seq("q_proj", "k_proj", "v_proj", "out_proj").foreach { pr =>
            ts += s"$p$a.$pr.weight" -> t(dModel, dModel)(0.08)
            ts += s"$p$a.$pr.bias" -> t(dModel)(0.02)
          }
          ts += s"$p${a}_layer_norm.weight" -> Tensor(Array(dModel), Array.fill(dModel)(1f))
          ts += s"$p${a}_layer_norm.bias" -> Tensor(Array(dModel), new Array[Float](dModel))
        }
        ts += s"${p}fc1.weight" -> t(ffn, dModel)(0.08)
        ts += s"${p}fc1.bias" -> t(ffn)(0.02)
        ts += s"${p}fc2.weight" -> t(dModel, ffn)(0.08)
        ts += s"${p}fc2.bias" -> t(dModel)(0.02)
        ts += s"${p}final_layer_norm.weight" -> Tensor(Array(dModel), Array.fill(dModel)(1f))
        ts += s"${p}final_layer_norm.bias" -> Tensor(Array(dModel), new Array[Float](dModel))
      }
    }
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val cfgJson =
      s"""{"model_type":"marian","d_model":$dModel,"encoder_layers":$layers,
         |"encoder_attention_heads":$heads,"decoder_layers":$layers,
         |"decoder_attention_heads":$heads,"encoder_ffn_dim":$ffn,
         |"decoder_ffn_dim":$ffn,"max_position_embeddings":$maxPos,
         |"vocab_size":${vocabToks.length},"bos_token_id":$padId,
         |"eos_token_id":$eosId,"decoder_start_token_id":$padId,
         |"scale_embedding":true,"static_position_embeddings":true,
         |"activation_function":"swish"}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(dir, "tokenizer_config.json"),
      s"""{"lang_code_to_id":{">>fra<<":258,">>deu<<":259}}"""
        .getBytes(StandardCharsets.UTF_8))
    Bpe.writeFiles(Paths.get(dir, "vocab.json").toString,
      Paths.get(dir, "merges.txt").toString, vocabToks, Seq.empty)
    SentencePiece.writeUnigramJson(
      Paths.get(dir, "tokenizer.json").toString,
      pieces = (0 until 256).map(b => f"<0x$b%02X>" -> -10.0) ++
        Seq("</s>" -> 0.0, "<pad>" -> 0.0, ">>fra<<" -> 0.0, ">>deu<<" -> 0.0) ++
        spExtra,
      unkId = 0,
      addedSpecials = Seq(256 -> "</s>", 257 -> "<pad>",
        258 -> ">>fra<<", 259 -> ">>deu<<"),
      // real opus-mt checkpoints normalize before metaspace; NFKC here
      // puts the normalizer stage on q137's gate path (ASCII corpus text
      // is unaffected, so the oracle closed forms stand)
      normalizerTypes = Seq("NFKC"))
  }

  def ensureTinyMarianModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_marian_s$seed")
    // marker = a tokenizer.json CARRYING a normalizer block, so cached
    // dirs from before the SentencePiece/normalizer upgrades regenerate
    val marker = dir.resolve("tokenizer.json")
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8)
        .contains("\"normalizer\"")
    if (!fresh) writeTinyMarianModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // Whisper speech-to-text (reference huggingface.py:979)
  // ---------------------------------------------------------------------

  final class WhisperBundle(val cfg: WhisperConfig, val weights: Map[String, Tensor],
      val vocab: Map[String, Int], val merges: Seq[(String, String)])
      extends Serializable {
    @transient lazy val model: WhisperModel = new WhisperModel(cfg, weights)
    @transient lazy val tokenizer: Bpe =
      new Bpe(vocab, merges, clipMode = false, unkToken = "<|endoftext|>")
    /** `<|...|>` control tokens, skipped when decoding to text. */
    @transient lazy val specialIds: Set[Int] =
      vocab.collect { case (t, id) if t.startsWith("<|") && t.endsWith("|>") => id }.toSet
    def melConfig: Mel.MelConfig = Mel.MelConfig(nMels = cfg.numMelBins)
  }

  // ---------------------------------------------------------------------
  // Generic ASR (reference huggingface.py:1932 automatic_speech_recognition
  // — dispatches on the checkpoint family like the reference dispatches on
  // model_id: whisper → seq2seq decode, wav2vec2/CTC → per-frame argmax +
  // CTC collapse). The wav2vec2 tower is graft.ml.Wav2Vec2; the CTC decode
  // kernel is oracle-gated by q139.

  final class Wav2Vec2Bundle(val cfg: Wav2Vec2Config,
      val weights: Map[String, Tensor], val idToToken: Map[Int, String])
      extends Serializable {
    @transient lazy val model: Wav2Vec2Model = new Wav2Vec2Model(cfg, weights)
  }

  def loadWav2Vec2(modelDir: String): Wav2Vec2Bundle = {
    val cfg = Wav2Vec2Config.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    val weights = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val node = new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(modelDir, "vocab.json")))
    val idToToken = scala.jdk.CollectionConverters.IteratorHasAsScala(node.properties().iterator())
      .asScala.map(e => e.getValue.asInt() -> e.getKey).toMap
    new Wav2Vec2Bundle(cfg, weights, idToToken)
  }

  /** Append `outCol: string` — generic ASR over a WAV binary column.
    * Reads the checkpoint's `model_type` and routes: whisper → the
    * existing seq2seq decode; wav2vec2 → CTC greedy. Null → null.
    */
  def automaticSpeechRecognition(df: DataFrame, audioCol: String,
      outCol: String, modelDir: String, maxNewTokens: Int = 24): DataFrame = {
    val mt = new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(modelDir, "config.json")))
      .path("model_type").asText("")
    if (mt == "whisper")
      return speechToText(df, audioCol, outCol, modelDir, maxNewTokens)
    require(mt == "wav2vec2", s"unsupported ASR checkpoint model_type '$mt'")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadWav2Vec2(modelDir))
    val idx = df.schema.fieldIndex(audioCol)
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val (_, samples) = graft.functions.Audio.decodePcm(r.getAs[Array[Byte]](idx))
            val wave = samples.map(_ / 32768.0f)
            val ids = Ctc.decode(bundle.model.frameIds(wave),
              blank = bundle.cfg.padTokenId)
            Ctc.toText(ids, bundle.idToToken)
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Deterministic tiny Wav2Vec2 CTC checkpoint (base layout:
    * feat_extract_norm="group", do_stable_layer_norm=false, weight-normed
    * even-kernel positional conv exercising the SamePad trim).
    */
  def writeTinyWav2Vec2Model(dir: String, seed: Long = 42L): Unit = {
    val convDims = Seq(8, 8); val convKernels = Seq(4, 3); val convStrides = Seq(2, 2)
    val hidden = 16; val layers = 2; val heads = 2; val inter = 32
    val posK = 4; val posGroups = 4
    val vocabToks = Seq("<pad>", "|") ++ ('a' to 'z').map(_.toString)
    val rnd = new java.util.Random(seed)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, Array.fill(shape.product)((rnd.nextGaussian() * scale).toFloat))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    convDims.indices.foreach { li =>
      val cin = if (li == 0) 1 else convDims(li - 1)
      ts += s"wav2vec2.feature_extractor.conv_layers.$li.conv.weight" ->
        t(convDims(li), cin, convKernels(li))(0.3)
    }
    ts += "wav2vec2.feature_extractor.conv_layers.0.layer_norm.weight" -> ones(convDims(0))
    ts += "wav2vec2.feature_extractor.conv_layers.0.layer_norm.bias" -> zeros(convDims(0))
    ts += "wav2vec2.feature_projection.layer_norm.weight" -> ones(convDims.last)
    ts += "wav2vec2.feature_projection.layer_norm.bias" -> zeros(convDims.last)
    ts += "wav2vec2.feature_projection.projection.weight" -> t(hidden, convDims.last)(0.2)
    ts += "wav2vec2.feature_projection.projection.bias" -> t(hidden)(0.02)
    ts += "wav2vec2.encoder.pos_conv_embed.conv.weight_g" -> t(posK)(0.5)
    ts += "wav2vec2.encoder.pos_conv_embed.conv.weight_v" ->
      t(hidden, hidden / posGroups, posK)(0.2)
    ts += "wav2vec2.encoder.pos_conv_embed.conv.bias" -> t(hidden)(0.02)
    ts += "wav2vec2.encoder.layer_norm.weight" -> ones(hidden)
    ts += "wav2vec2.encoder.layer_norm.bias" -> zeros(hidden)
    (0 until layers).foreach { li =>
      val p = s"wav2vec2.encoder.layers.$li"
      Seq("q_proj", "k_proj", "v_proj", "out_proj").foreach { pr =>
        ts += s"$p.attention.$pr.weight" -> t(hidden, hidden)(0.15)
        ts += s"$p.attention.$pr.bias" -> t(hidden)(0.02)
      }
      ts += s"$p.layer_norm.weight" -> ones(hidden)
      ts += s"$p.layer_norm.bias" -> zeros(hidden)
      ts += s"$p.feed_forward.intermediate_dense.weight" -> t(inter, hidden)(0.15)
      ts += s"$p.feed_forward.intermediate_dense.bias" -> t(inter)(0.02)
      ts += s"$p.feed_forward.output_dense.weight" -> t(hidden, inter)(0.15)
      ts += s"$p.feed_forward.output_dense.bias" -> t(hidden)(0.02)
      ts += s"$p.final_layer_norm.weight" -> ones(hidden)
      ts += s"$p.final_layer_norm.bias" -> zeros(hidden)
    }
    ts += "lm_head.weight" -> t(vocabToks.length, hidden)(0.2)
    ts += "lm_head.bias" -> t(vocabToks.length)(0.02)
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val cfgJson =
      s"""{"model_type":"wav2vec2","conv_dim":[8,8],"conv_kernel":[4,3],
         |"conv_stride":[2,2],"hidden_size":$hidden,
         |"num_hidden_layers":$layers,"num_attention_heads":$heads,
         |"intermediate_size":$inter,"num_conv_pos_embeddings":$posK,
         |"num_conv_pos_embedding_groups":$posGroups,
         |"vocab_size":${vocabToks.length},"pad_token_id":0}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
    val vocabJson = vocabToks.zipWithIndex
      .map { case (tok, i) => "\"" + tok.replace("\\", "\\\\") + "\": " + i }
      .mkString("{", ", ", "}")
    Files.write(Paths.get(dir, "vocab.json"), vocabJson.getBytes(StandardCharsets.UTF_8))
  }

  def ensureTinyWav2Vec2Model(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_w2v2_s$seed")
    val marker = dir.resolve("vocab.json")
    if (!Files.exists(marker)) writeTinyWav2Vec2Model(dir.toString, seed)
    dir.toString
  }

  def loadWhisper(modelDir: String): WhisperBundle = {
    val cfg = WhisperConfig.fromJson(new String(
      Files.readAllBytes(Paths.get(modelDir, "config.json")), StandardCharsets.UTF_8))
    val weights = SafeTensors.read(Paths.get(modelDir, "model.safetensors").toString)
    val node = new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(modelDir, "vocab.json")))
    val vocab = scala.jdk.CollectionConverters.IteratorHasAsScala(node.properties().iterator())
      .asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
    new WhisperBundle(cfg, weights, vocab, readMerges(modelDir))
  }

  /** Append `outCol: string` — greedy transcription of a WAV/AIFF/AU
    * binary column. Audio is resampled to the model rate and padded or
    * trimmed to the encoder's receptive field (2·max_source_positions
    * frames), the Whisper convention. Null audio → null text.
    */
  def speechToText(df: DataFrame, audioCol: String, outCol: String,
      modelDir: String, maxNewTokens: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadWhisper(modelDir))
    val idx = df.schema.fieldIndex(audioCol)
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      val melCfg = bundle.melConfig
      val targetSamples = bundle.cfg.maxSourcePositions * 2 * melCfg.hop
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val (fmt, pcm) = graft.functions.Audio.decodePcm(r.getAs[Array[Byte]](idx))
            val f = pcm.map(s => (s / 32768.0f))
            val at16k = Mel.resample(f, fmt.getSampleRate.toInt, melCfg.sampleRate)
            val fixed = java.util.Arrays.copyOf(at16k, targetSamples) // pad/trim
            val mel = Mel.logMelSpectrogram(fixed, melCfg)
            val ids = bundle.model.transcribe(mel, maxNewTokens)
            bundle.tokenizer.decode(ids, bundle.specialIds)
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Append `outCol: struct<text, avg_logprob, compression_ratio,
    * needs_fallback, is_silence>` — the whisper.py `transcribe` response
    * metadata (reference `functions/whisper.py:21`; openai-whisper's
    * DecodingResult fields + decode_with_fallback's decisions at the
    * first temperature rung, 0.0 = greedy). The higher rungs SAMPLE and
    * are inherently nondeterministic — here the decision is surfaced
    * (`needs_fallback`) rather than re-decoded, the documented
    * divergence. Null audio → null.
    */
  def speechToTextQuality(df: DataFrame, audioCol: String, outCol: String,
      modelDir: String, maxNewTokens: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadWhisper(modelDir))
    val idx = df.schema.fieldIndex(audioCol)
    val outType = StructType(Seq(
      StructField("text", StringType),
      StructField("avg_logprob", DoubleType),
      StructField("compression_ratio", DoubleType),
      StructField("needs_fallback", BooleanType),
      StructField("is_silence", BooleanType)))
    val schema = StructType(df.schema.fields :+ StructField(outCol, outType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      val melCfg = bundle.melConfig
      val targetSamples = bundle.cfg.maxSourcePositions * 2 * melCfg.hop
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val (fmt, pcm) = graft.functions.Audio.decodePcm(r.getAs[Array[Byte]](idx))
            val f = pcm.map(s => (s / 32768.0f))
            val at16k = Mel.resample(f, fmt.getSampleRate.toInt, melCfg.sampleRate)
            val fixed = java.util.Arrays.copyOf(at16k, targetSamples)
            val mel = Mel.logMelSpectrogram(fixed, melCfg)
            val sc = bundle.model.transcribeScored(mel, maxNewTokens)
            val text = bundle.tokenizer.decode(sc.tokens, bundle.specialIds)
            val cr = WhisperQuality.compressionRatio(text)
            Row(text, sc.avgLogprob, cr,
              WhisperQuality.needsFallback(sc.avgLogprob, cr, sc.noSpeechProb),
              WhisperQuality.shouldSkipSilence(sc.avgLogprob, sc.noSpeechProb))
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Append `outCol: array<struct<word string, start double, end double>>`
    * — transcription with WORD-LEVEL timestamps (the reference's
    * `whisperx.transcribe` surface, `functions/whisperx.py:24`): greedy
    * decode with cross-attention capture, DTW token↔frame alignment
    * (WhisperAlign — the whisper-native `word_timestamps=True` algorithm;
    * whisperx's external wav2vec2 forced aligner is a third-party model
    * outside this checkpoint family), tokens grouped into words at
    * whitespace boundaries of their decoded pieces. One encoder frame =
    * 2 mel hops = 2·hop/sampleRate seconds (0.02 s at Whisper defaults).
    */
  def speechToTextWords(df: DataFrame, audioCol: String, outCol: String,
      modelDir: String, maxNewTokens: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadWhisper(modelDir))
    val idx = df.schema.fieldIndex(audioCol)
    val wordType = StructType(Seq(
      StructField("word", StringType), StructField("start", DoubleType),
      StructField("end", DoubleType)))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(wordType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      val melCfg = bundle.melConfig
      val targetSamples = bundle.cfg.maxSourcePositions * 2 * melCfg.hop
      val secPerFrame = 2.0 * melCfg.hop / melCfg.sampleRate
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val (fmt, pcm) = graft.functions.Audio.decodePcm(r.getAs[Array[Byte]](idx))
            val f = pcm.map(s => (s / 32768.0f))
            val at16k = Mel.resample(f, fmt.getSampleRate.toInt, melCfg.sampleRate)
            val fixed = java.util.Arrays.copyOf(at16k, targetSamples)
            val mel = Mel.logMelSpectrogram(fixed, melCfg)
            val (ids, attn) = bundle.model.transcribeAligned(mel, maxNewTokens)
            val spans = WhisperAlign.dtw(attn)
            // group tokens into words: a new word starts where the decoded
            // piece begins with whitespace (byte-level spaces decode via
            // the Ġ-class byte map, so decode per token and inspect)
            val words = Seq.newBuilder[Row]
            var curText = new StringBuilder
            var curStart = -1
            var curEnd = -1
            def flush(): Unit = {
              val t = curText.toString.trim
              if (t.nonEmpty && curStart >= 0)
                words += Row(t, curStart * secPerFrame, curEnd * secPerFrame)
              curText = new StringBuilder; curStart = -1; curEnd = -1
            }
            var i = 1 // skip the start token (span 0 belongs to it)
            while (i < ids.length) {
              val piece = bundle.tokenizer.decode(Seq(ids(i)), bundle.specialIds)
              if (piece.nonEmpty && piece.charAt(0).isWhitespace) flush()
              val sp = spans(i)
              if (curStart < 0) curStart = sp.startFrame
              curEnd = sp.endFrame
              curText ++= piece
              i += 1
            }
            flush()
            words.result()
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Append `outCol: array<struct<seg_idx int, start double, end double,
    * speaker int, text string>>` — diarized transcription, the reference's
    * `whisperx.transcribe(diarize=True)` surface
    * (`functions/whisperx.py:24`): silence-split segments, per-segment
    * SPEAKER EMBEDDING, clustering into `numSpeakers`, per-segment
    * Whisper transcription. The reference delegates speaker embeddings to
    * the external pyannote pipeline (a gated third-party model); here the
    * embedding is the log-mel statistics vector (per-bin mean ∥ std, L2
    * normalized — the classic lightweight speaker feature) and the
    * clusterer is deterministic local k-means (farthest-point init,
    * speakers relabeled by first appearance). Spectrally distinct
    * speakers separate cleanly; same-pitch speakers need a learned
    * embedding — documented approximation, pinned by DiarizeSpec.
    */
  def speechToTextDiarized(df: DataFrame, audioCol: String, outCol: String,
      modelDir: String, numSpeakers: Int = 2, silenceRms: Double = 0.05,
      minSilenceSec: Double = 0.1, maxNewTokens: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(loadWhisper(modelDir))
    val idx = df.schema.fieldIndex(audioCol)
    val segType = StructType(Seq(
      StructField("seg_idx", IntegerType), StructField("start", DoubleType),
      StructField("end", DoubleType), StructField("speaker", IntegerType),
      StructField("text", StringType)))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(segType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val bundle = bc.value
      val melCfg = bundle.melConfig
      rows.map { r =>
        val out: Any =
          if (r.isNullAt(idx)) null
          else {
            val bytes = r.getAs[Array[Byte]](idx)
            val (fmt, samples) = graft.functions.Audio.decodePcm(bytes)
            val rate = fmt.getSampleRate
            // silence-split (the audioSplitter algorithm, inlined to keep
            // sample arrays instead of re-encoded WAVs)
            val win = math.max((rate * 0.02).toInt, 1)
            val winRms = samples.grouped(win).map { wnd =>
              math.sqrt(wnd.map(s => (s.toDouble / Short.MaxValue) *
                (s.toDouble / Short.MaxValue)).sum / wnd.length)
            }.toArray
            val minSilentWins = math.max((minSilenceSec / 0.02).toInt, 1)
            val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
            var segStart = -1
            var silentRun = 0
            winRms.indices.foreach { i =>
              if (winRms(i) < silenceRms) {
                silentRun += 1
                if (segStart >= 0 && silentRun >= minSilentWins) {
                  segs += ((segStart, i - silentRun + 1)); segStart = -1
                }
              } else {
                if (segStart < 0) segStart = i
                silentRun = 0
              }
            }
            if (segStart >= 0) segs += ((segStart, winRms.length))
            val pieces = segs.map { case (s, e) =>
              val pcm = samples.slice(s * win, math.min(e * win, samples.length))
              (s * win / rate.toDouble,
                math.min(e * win, samples.length) / rate.toDouble, pcm)
            }
            // per-segment embedding: log-mel per-bin mean ∥ std, L2-normed
            val embs = pieces.map { case (_, _, pcm) =>
              val f = pcm.map(s => s / 32768.0f)
              val at16k = Mel.resample(f, rate.toInt, melCfg.sampleRate)
              val mel = Mel.logMelSpectrogram(at16k, melCfg) // [frames][mels]
              val nm = melCfg.nMels
              val v = new Array[Double](2 * nm)
              if (mel.nonEmpty) {
                var b = 0
                while (b < nm) {
                  var sum = 0.0
                  mel.foreach(fr => sum += fr(b))
                  val mean = sum / mel.length
                  var vs = 0.0
                  mel.foreach(fr => vs += (fr(b) - mean) * (fr(b) - mean))
                  v(b) = mean; v(nm + b) = math.sqrt(vs / mel.length)
                  b += 1
                }
              }
              val n = math.sqrt(v.map(x => x * x).sum)
              if (n > 0) v.map(_ / n) else v
            }.toIndexedSeq
            // deterministic local k-means: farthest-point init from seg 0
            val k = math.min(numSpeakers, embs.length).max(1)
            var centroids = IndexedSeq(embs.headOption.getOrElse(Array(0.0)))
            while (centroids.length < k) {
              val far = embs.maxBy(e =>
                centroids.map(c => c.zip(e).map { case (a, b) => (a - b) * (a - b) }.sum).min)
              centroids :+= far
            }
            def assign(): IndexedSeq[Int] = embs.map(e =>
              centroids.indices.minBy(ci =>
                centroids(ci).zip(e).map { case (a, b) => (a - b) * (a - b) }.sum))
            var labels = assign()
            var iter = 0
            var moved = true
            while (moved && iter < 10) {
              centroids = (0 until k).map { ci =>
                val members = embs.indices.filter(labels(_) == ci)
                if (members.isEmpty) centroids(ci)
                else {
                  val dim = embs(members.head).length
                  val c = new Array[Double](dim)
                  members.foreach(m => (0 until dim).foreach(d => c(d) += embs(m)(d)))
                  c.map(_ / members.length)
                }
              }
              val next = assign()
              moved = next != labels
              labels = next
              iter += 1
            }
            // relabel by first appearance so speaker ids are stable
            val relabel = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
            labels.foreach(l => if (!relabel.contains(l)) relabel(l) = relabel.size)
            // transcribe each segment
            val targetSamples = bundle.cfg.maxSourcePositions * 2 * melCfg.hop
            val result = pieces.zipWithIndex.map { case ((start, end, pcm), i) =>
              val f = pcm.map(s => s / 32768.0f)
              val at16k = Mel.resample(f, rate.toInt, melCfg.sampleRate)
              val fixed = java.util.Arrays.copyOf(at16k, targetSamples)
              val mel = Mel.logMelSpectrogram(fixed, melCfg)
              val ids = bundle.model.transcribe(mel, maxNewTokens)
              Row(i, start, end, relabel(labels(i)),
                bundle.tokenizer.decode(ids, bundle.specialIds))
            }.toSeq
            result
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Deterministic tiny Whisper checkpoint (HF layout, seeded weights):
    * byte-level token space (256 byte symbols + 2 control tokens), 16 mel
    * bins, 32 encoder/decoder positions — ~0.65 s of 16 kHz audio.
    */
  def writeTinyWhisperModel(dir: String, seed: Long = 42L, dModel: Int = 16,
      layers: Int = 2, heads: Int = 2, ffn: Int = 32, nMels: Int = 16,
      maxSource: Int = 32, maxTarget: Int = 32): Unit = {
    val byteToks = Bpe.byteToUnicode.map(_.toString).toSeq
    val vocabToks = byteToks ++ Seq("<|startoftranscript|>", "<|endoftext|>")
    val sotId = 256; val eosId = 257
    val rnd = new java.util.Random(seed)
    def gauss(n: Int, scale: Double): Array[Float] =
      Array.fill(n)((rnd.nextGaussian() * scale).toFloat)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, gauss(shape.product, scale))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))
    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    ts += "model.encoder.conv1.weight" -> t(dModel, nMels, 3)(0.08)
    ts += "model.encoder.conv1.bias" -> t(dModel)(0.02)
    ts += "model.encoder.conv2.weight" -> t(dModel, dModel, 3)(0.08)
    ts += "model.encoder.conv2.bias" -> t(dModel)(0.02)
    ts += "model.encoder.embed_positions.weight" -> t(maxSource, dModel)(0.02)
    ts += "model.decoder.embed_tokens.weight" -> t(vocabToks.length, dModel)(0.1)
    ts += "model.decoder.embed_positions.weight" -> t(maxTarget, dModel)(0.02)
    for (side <- Seq("encoder", "decoder"); i <- 0 until layers) {
      val p = s"model.$side.layers.$i."
      val attns = if (side == "decoder") Seq("self_attn", "encoder_attn") else Seq("self_attn")
      attns.foreach { a =>
        ts += s"$p$a.q_proj.weight" -> t(dModel, dModel)(0.08)
        ts += s"$p$a.q_proj.bias" -> t(dModel)(0.02)
        ts += s"$p$a.k_proj.weight" -> t(dModel, dModel)(0.08) // no bias, like HF
        ts += s"$p$a.v_proj.weight" -> t(dModel, dModel)(0.08)
        ts += s"$p$a.v_proj.bias" -> t(dModel)(0.02)
        ts += s"$p$a.out_proj.weight" -> t(dModel, dModel)(0.08)
        ts += s"$p$a.out_proj.bias" -> t(dModel)(0.02)
        ts += s"$p${a}_layer_norm.weight" -> ones(dModel)
        ts += s"$p${a}_layer_norm.bias" -> zeros(dModel)
      }
      ts += s"${p}fc1.weight" -> t(ffn, dModel)(0.08)
      ts += s"${p}fc1.bias" -> t(ffn)(0.02)
      ts += s"${p}fc2.weight" -> t(dModel, ffn)(0.08)
      ts += s"${p}fc2.bias" -> t(dModel)(0.02)
      ts += s"${p}final_layer_norm.weight" -> ones(dModel)
      ts += s"${p}final_layer_norm.bias" -> zeros(dModel)
    }
    ts += "model.encoder.layer_norm.weight" -> ones(dModel)
    ts += "model.encoder.layer_norm.bias" -> zeros(dModel)
    ts += "model.decoder.layer_norm.weight" -> ones(dModel)
    ts += "model.decoder.layer_norm.bias" -> zeros(dModel)
    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val cfgJson =
      s"""{"model_type":"whisper","d_model":$dModel,"encoder_layers":$layers,
         |"encoder_attention_heads":$heads,"decoder_layers":$layers,
         |"decoder_attention_heads":$heads,"encoder_ffn_dim":$ffn,
         |"decoder_ffn_dim":$ffn,"num_mel_bins":$nMels,
         |"max_source_positions":$maxSource,"max_target_positions":$maxTarget,
         |"vocab_size":${vocabToks.length},"decoder_start_token_id":$sotId,
         |"eos_token_id":$eosId}""".stripMargin
    Files.write(Paths.get(dir, "config.json"), cfgJson.getBytes(StandardCharsets.UTF_8))
    Bpe.writeFiles(Paths.get(dir, "vocab.json").toString,
      Paths.get(dir, "merges.txt").toString, vocabToks, Seq.empty)
  }

  /** Idempotent shared tiny Whisper checkpoint under the JVM temp dir. */
  def ensureTinyWhisperModel(seed: Long = 42L): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tiny_whisper_s$seed")
    val marker = dir.resolve("merges.txt")
    if (!Files.exists(marker)) writeTinyWhisperModel(dir.toString, seed)
    dir.toString
  }

  // ---------------------------------------------------------------------
  // Deterministic tiny checkpoint (tests + registry query): real HF layout,
  // real forward pass, seeded pseudo-random weights — the container has no
  // model zoo and no egress, so this stands in for a downloaded checkpoint
  // exactly the way TESTDATA stands in for a real corpus.
  // ---------------------------------------------------------------------

  /** ASCII-complete vocab: specials, then a-z/0-9 as word starts and `##`
    * continuations (any alnum word char-splits), then isolated punctuation.
    */
  def tinyVocab: IndexedSeq[String] = {
    val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val punct = ".,!?;:'\"-()[]{}/@#$%&*+=<>_~`|\\^".map(_.toString)
    (Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]") ++ chars ++
      chars.map("##" + _) ++ punct).toIndexedSeq
  }

  /** Write a seeded random checkpoint in the standard HF directory layout.
    * `numLabels > 0` adds pooler + classifier heads (cross-encoder /
    * classification); id2label is LABEL_i unless given.
    */
  def writeTinyModel(dir: String, seed: Long = 42L, hidden: Int = 16,
      layers: Int = 2, heads: Int = 2, intermediate: Int = 32,
      maxPos: Int = 128, numLabels: Int = 0,
      labels: Seq[String] = Seq.empty, qaHead: Boolean = false): Unit = {
    val vocab = tinyVocab
    val rnd = new java.util.Random(seed)
    def gauss(n: Int, scale: Double): Array[Float] =
      Array.fill(n)((rnd.nextGaussian() * scale).toFloat)
    def t(shape: Int*)(scale: Double): Tensor =
      Tensor(shape.toArray, gauss(shape.product, scale))
    def ones(n: Int): Tensor = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int): Tensor = Tensor(Array(n), new Array[Float](n))

    val ts = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    ts += "embeddings.word_embeddings.weight" -> t(vocab.length, hidden)(0.1)
    ts += "embeddings.position_embeddings.weight" -> t(maxPos, hidden)(0.02)
    ts += "embeddings.token_type_embeddings.weight" -> t(2, hidden)(0.02)
    ts += "embeddings.LayerNorm.weight" -> ones(hidden)
    ts += "embeddings.LayerNorm.bias" -> zeros(hidden)
    (0 until layers).foreach { i =>
      val p = s"encoder.layer.$i."
      Seq("query", "key", "value").foreach { qkv =>
        ts += s"${p}attention.self.$qkv.weight" -> t(hidden, hidden)(0.08)
        ts += s"${p}attention.self.$qkv.bias" -> t(hidden)(0.02)
      }
      ts += s"${p}attention.output.dense.weight" -> t(hidden, hidden)(0.08)
      ts += s"${p}attention.output.dense.bias" -> t(hidden)(0.02)
      ts += s"${p}attention.output.LayerNorm.weight" -> ones(hidden)
      ts += s"${p}attention.output.LayerNorm.bias" -> zeros(hidden)
      ts += s"${p}intermediate.dense.weight" -> t(intermediate, hidden)(0.08)
      ts += s"${p}intermediate.dense.bias" -> t(intermediate)(0.02)
      ts += s"${p}output.dense.weight" -> t(hidden, intermediate)(0.08)
      ts += s"${p}output.dense.bias" -> t(hidden)(0.02)
      ts += s"${p}output.LayerNorm.weight" -> ones(hidden)
      ts += s"${p}output.LayerNorm.bias" -> zeros(hidden)
    }
    if (numLabels > 0) {
      ts += "pooler.dense.weight" -> t(hidden, hidden)(0.08)
      ts += "pooler.dense.bias" -> t(hidden)(0.02)
      ts += "classifier.weight" -> t(numLabels, hidden)(0.08)
      ts += "classifier.bias" -> t(numLabels)(0.02)
    }
    if (qaHead) {
      ts += "qa_outputs.weight" -> t(2, hidden)(0.08)
      ts += "qa_outputs.bias" -> t(2)(0.02)
    }

    Files.createDirectories(Paths.get(dir))
    SafeTensors.write(Paths.get(dir, "model.safetensors").toString, ts.toSeq,
      Map("format" -> "pt"))
    val id2label =
      if (numLabels == 0) Map.empty[Int, String]
      else (0 until numLabels).map(i =>
        i -> labels.lift(i).getOrElse(s"LABEL_$i")).toMap
    val cfg = EncoderConfig(hidden, layers, heads, intermediate, vocab.length,
      maxPos, typeVocabSize = 2, id2label = id2label)
    Files.write(Paths.get(dir, "config.json"),
      EncoderConfig.toJson(cfg).getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(dir, "vocab.txt"),
      vocab.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Idempotent shared tiny checkpoint for registry queries/specs: write
    * once under the JVM temp dir, keyed by seed+shape so concurrent
    * sessions agree on content.
    */
  def ensureTinyModel(seed: Long = 42L, numLabels: Int = 0,
      qaHead: Boolean = false): String = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_tiny_model_s${seed}_l${numLabels}${if (qaHead) "_qa" else ""}")
    val marker = dir.resolve("vocab.txt")
    if (!Files.exists(marker))
      writeTinyModel(dir.toString, seed, numLabels = numLabels, qaHead = qaHead)
    dir.toString
  }
}
