package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Minimal BERT-family encoder config — the subset of HF `config.json`
  * the forward pass needs. Parsed from the standard field names so real
  * checkpoints' configs load unchanged.
  */
final case class EncoderConfig(
    hiddenSize: Int,
    numLayers: Int,
    numHeads: Int,
    intermediateSize: Int,
    vocabSize: Int,
    maxPositionEmbeddings: Int,
    typeVocabSize: Int = 2,
    layerNormEps: Double = 1e-12,
    doLowerCase: Boolean = true,
    id2label: Map[Int, String] = Map.empty,
) extends Serializable {
  require(hiddenSize % numHeads == 0, s"hidden $hiddenSize % heads $numHeads != 0")
  def headDim: Int = hiddenSize / numHeads
}

object EncoderConfig {
  def fromJson(json: String): EncoderConfig = {
    val n = new ObjectMapper().readTree(json)
    def i(name: String, dflt: Int = -1): Int =
      if (n.has(name)) n.get(name).asInt() else { require(dflt >= 0, s"config missing $name"); dflt }
    EncoderConfig(
      hiddenSize = i("hidden_size"),
      numLayers = i("num_hidden_layers"),
      numHeads = i("num_attention_heads"),
      intermediateSize = i("intermediate_size"),
      vocabSize = i("vocab_size"),
      maxPositionEmbeddings = i("max_position_embeddings"),
      typeVocabSize = i("type_vocab_size", 2),
      layerNormEps = if (n.has("layer_norm_eps")) n.get("layer_norm_eps").asDouble() else 1e-12,
      doLowerCase = !n.has("do_lower_case") || n.get("do_lower_case").asBoolean(true),
      id2label =
        if (!n.has("id2label")) Map.empty
        else n.get("id2label").properties().asScala
          .map(e => e.getKey.toInt -> e.getValue.asText()).toMap,
    )
  }

  def toJson(cfg: EncoderConfig): String = {
    val m = new ObjectMapper()
    val n = m.createObjectNode()
    n.put("hidden_size", cfg.hiddenSize)
    n.put("num_hidden_layers", cfg.numLayers)
    n.put("num_attention_heads", cfg.numHeads)
    n.put("intermediate_size", cfg.intermediateSize)
    n.put("vocab_size", cfg.vocabSize)
    n.put("max_position_embeddings", cfg.maxPositionEmbeddings)
    n.put("type_vocab_size", cfg.typeVocabSize)
    n.put("layer_norm_eps", cfg.layerNormEps)
    n.put("do_lower_case", cfg.doLowerCase)
    if (cfg.id2label.nonEmpty) {
      val l = n.putObject("id2label")
      cfg.id2label.toSeq.sortBy(_._1).foreach { case (k, v) => l.put(k.toString, v) }
    }
    m.writeValueAsString(n)
  }
}

/** A padded, encoded batch: `hidden` is [batch * seqLen * hiddenSize]
  * row-major, `mask(b * seqLen + t)` is 1 for real tokens, 0 for padding.
  */
final case class Encoded(batch: Int, seqLen: Int, hiddenSize: Int,
    hidden: Array[Float], mask: Array[Int])

/** Post-LayerNorm BERT encoder forward pass (Devlin et al. 2018; the
  * architecture behind the reference's sentence_transformer / cross_encoder
  * / text-classification local models, `functions/huggingface.py:31-123,
  * 1174-1232`). Weights follow HF BERT naming (an optional `bert.` prefix
  * is stripped), so real safetensors checkpoints load directly.
  *
  * Batch-grouping invariance: padded keys are masked with -1e9 before
  * softmax, which underflows to exactly 0.0 after max-subtraction, so a
  * text's embedding is bit-identical whether encoded alone or inside a
  * padded batch — EncoderSpec pins this, and it is what makes
  * `mapPartitions` batching safe to re-shuffle at any partition count.
  */
final class Encoder(val cfg: EncoderConfig, rawWeights: Map[String, Tensor])
    extends Serializable {

  // accept both bare ("embeddings.…") and prefixed ("bert.embeddings.…") names
  private val weights: Map[String, Tensor] = rawWeights.map { case (k, v) =>
    (if (k.startsWith("bert.")) k.substring(5) else k) -> v
  }
  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"checkpoint missing tensor $name"))
  def hasWeight(name: String): Boolean = weights.contains(name)

  private val wordEmb = w("embeddings.word_embeddings.weight")
  private val posEmb = w("embeddings.position_embeddings.weight")
  private val typeEmb = w("embeddings.token_type_embeddings.weight")
  require(wordEmb.cols == cfg.hiddenSize && wordEmb.rows == cfg.vocabSize,
    s"word embedding ${wordEmb.rows}x${wordEmb.cols} != vocab ${cfg.vocabSize} x hidden ${cfg.hiddenSize}")

  /** Encode a batch of id sequences (padded internally to the batch max). */
  def forward(idsBatch: Seq[Array[Int]],
      typeBatch: Option[Seq[Array[Int]]] = None): Encoded = {
    val b = idsBatch.length
    require(b > 0, "empty batch")
    val l = idsBatch.map(_.length).max
    require(l <= cfg.maxPositionEmbeddings,
      s"sequence length $l > max_position_embeddings ${cfg.maxPositionEmbeddings}")
    val h = cfg.hiddenSize
    val m = b * l
    val x = new Array[Float](m * h)
    val mask = new Array[Int](m)

    // embeddings: word + position + token-type, then LayerNorm
    var bi = 0
    while (bi < b) {
      val ids = idsBatch(bi)
      val types = typeBatch.map(_(bi)).orNull
      var t = 0
      while (t < ids.length) {
        val off = (bi * l + t) * h
        val wOff = ids(t) * h
        val pOff = t * h
        val tyOff = (if (types == null) 0 else types(t)) * h
        var k = 0
        while (k < h) {
          x(off + k) = wordEmb.data(wOff + k) + posEmb.data(pOff + k) + typeEmb.data(tyOff + k)
          k += 1
        }
        mask(bi * l + t) = 1
        t += 1
      }
      bi += 1
    }
    Tensors.layerNorm(x, m, h, w("embeddings.LayerNorm.weight"),
      w("embeddings.LayerNorm.bias"), cfg.layerNormEps)

    var layer = 0
    while (layer < cfg.numLayers) {
      val p = s"encoder.layer.$layer."
      attentionBlock(x, b, l, p, mask)
      feedForwardBlock(x, m, p)
      layer += 1
    }
    Encoded(b, l, h, x, mask)
  }

  private def attentionBlock(x: Array[Float], b: Int, l: Int, p: String,
      mask: Array[Int]): Unit = {
    val h = cfg.hiddenSize
    val m = b * l
    val heads = cfg.numHeads
    val dh = cfg.headDim
    val scale = 1.0 / math.sqrt(dh.toDouble)
    val q = Tensors.linear(x, m, h, w(p + "attention.self.query.weight"), w(p + "attention.self.query.bias"))
    val k = Tensors.linear(x, m, h, w(p + "attention.self.key.weight"), w(p + "attention.self.key.bias"))
    val v = Tensors.linear(x, m, h, w(p + "attention.self.value.weight"), w(p + "attention.self.value.bias"))
    val ctx = new Array[Float](m * h)
    val scores = new Array[Float](l * l) // reused per (batch, head)
    var bi = 0
    while (bi < b) {
      val rowOff = bi * l
      var hd = 0
      while (hd < heads) {
        val hOff = hd * dh
        // scores[i,j] = q_i · k_j / sqrt(dh), padded keys → -1e9
        var i = 0
        while (i < l) {
          val qOff = (rowOff + i) * h + hOff
          var j = 0
          while (j < l) {
            if (mask(rowOff + j) == 0) scores(i * l + j) = -1e9f
            else {
              val kOff = (rowOff + j) * h + hOff
              var acc = 0.0
              var d = 0
              while (d < dh) { acc += q(qOff + d).toDouble * k(kOff + d); d += 1 }
              scores(i * l + j) = (acc * scale).toFloat
            }
            j += 1
          }
          i += 1
        }
        Tensors.softmaxRows(scores, l, l)
        // ctx_i = Σ_j p[i,j] · v_j
        i = 0
        while (i < l) {
          val cOff = (rowOff + i) * h + hOff
          var d = 0
          while (d < dh) {
            var acc = 0.0
            var j = 0
            while (j < l) { acc += scores(i * l + j).toDouble * v((rowOff + j) * h + hOff + d); j += 1 }
            ctx(cOff + d) = acc.toFloat
            d += 1
          }
          i += 1
        }
        hd += 1
      }
      bi += 1
    }
    val attnOut = Tensors.linear(ctx, m, h,
      w(p + "attention.output.dense.weight"), w(p + "attention.output.dense.bias"))
    Tensors.addInPlace(x, attnOut)
    Tensors.layerNorm(x, m, h, w(p + "attention.output.LayerNorm.weight"),
      w(p + "attention.output.LayerNorm.bias"), cfg.layerNormEps)
  }

  private def feedForwardBlock(x: Array[Float], m: Int, p: String): Unit = {
    val h = cfg.hiddenSize
    val inter = Tensors.linear(x, m, h,
      w(p + "intermediate.dense.weight"), w(p + "intermediate.dense.bias"))
    Tensors.gelu(inter)
    val out = Tensors.linear(inter, m, cfg.intermediateSize,
      w(p + "output.dense.weight"), w(p + "output.dense.bias"))
    Tensors.addInPlace(x, out)
    Tensors.layerNorm(x, m, h, w(p + "output.LayerNorm.weight"),
      w(p + "output.LayerNorm.bias"), cfg.layerNormEps)
  }

  /** Attention-mask mean pooling + L2 normalize — the sentence-transformers
    * default pooling stack, giving unit-norm sentence embeddings.
    */
  def meanPoolNormalized(e: Encoded): Array[Array[Float]] = {
    val out = Array.ofDim[Array[Float]](e.batch)
    var bi = 0
    while (bi < e.batch) {
      val v = new Array[Float](e.hiddenSize)
      var count = 0
      var t = 0
      while (t < e.seqLen) {
        if (e.mask(bi * e.seqLen + t) == 1) {
          val off = (bi * e.seqLen + t) * e.hiddenSize
          var k = 0
          while (k < e.hiddenSize) { v(k) += e.hidden(off + k); k += 1 }
          count += 1
        }
        t += 1
      }
      var k = 0
      while (k < e.hiddenSize) { v(k) = v(k) / count; k += 1 }
      Tensors.l2NormalizeInPlace(v)
      out(bi) = v
      bi += 1
    }
    out
  }

  /** Raw [CLS] (position-0) hidden states. */
  def clsPool(e: Encoded): Array[Array[Float]] = {
    (0 until e.batch).map { bi =>
      val off = bi * e.seqLen * e.hiddenSize
      java.util.Arrays.copyOfRange(e.hidden, off, off + e.hiddenSize)
    }.toArray
  }

  /** BERT pooler (dense + tanh on [CLS]) if the checkpoint carries one,
    * else raw [CLS].
    */
  def pooledOutput(e: Encoded): Array[Array[Float]] = {
    val cls = clsPool(e)
    if (!hasWeight("pooler.dense.weight")) cls
    else cls.map { v =>
      val y = Tensors.linear(v, 1, cfg.hiddenSize,
        w("pooler.dense.weight"), w("pooler.dense.bias"))
      Tensors.tanhInPlace(y)
      y
    }
  }

  /** Classifier head logits (`classifier.weight` [labels, hidden]). */
  def classify(pooled: Array[Array[Float]]): Array[Array[Float]] = {
    val cw = w("classifier.weight"); val cb = w("classifier.bias")
    pooled.map(v => Tensors.linear(v, 1, cfg.hiddenSize, cw, cb))
  }

  /** Per-position classifier logits for sequence item `b` (token
    * classification / NER: the classifier applied to every hidden state,
    * reference `huggingface.py:1342`). Returns [seqLen][labels].
    */
  def classifyTokens(e: Encoded, b: Int): Array[Array[Float]] = {
    val cw = w("classifier.weight"); val cb = w("classifier.bias")
    val h = e.hiddenSize
    Array.tabulate(e.seqLen) { t =>
      val off = (b * e.seqLen + t) * h
      Tensors.linear(java.util.Arrays.copyOfRange(e.hidden, off, off + h), 1, h, cw, cb)
    }
  }

  /** Extractive-QA span head (`qa_outputs.weight` [2, hidden]): per
    * position (startLogit, endLogit) for sequence item `b`.
    */
  def qaSpanLogits(e: Encoded, b: Int): Array[(Float, Float)] = {
    val qw = w("qa_outputs.weight"); val qb = w("qa_outputs.bias")
    require(qw.rows == 2, s"qa_outputs has ${qw.rows} rows, expected 2")
    val h = e.hiddenSize
    Array.tabulate(e.seqLen) { t =>
      val off = (b * e.seqLen + t) * h
      val l = Tensors.linear(java.util.Arrays.copyOfRange(e.hidden, off, off + h), 1, h, qw, qb)
      (l(0), l(1))
    }
  }
}
