package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper

/** BART-architecture seq2seq (Lewis et al. 2019) — the reference's
  * `summarization` (`/root/reference/pixeltable/functions/
  * huggingface.py:1287`, HF summarization pipeline in-process). HF BART
  * weight naming: `model.shared` tied embeddings, learned positions
  * OFFSET BY 2 (the RoBERTa quirk), `layernorm_embedding`, POST-LayerNorm
  * blocks (x = LN(x + sublayer(x)) — unlike Whisper/CLIP's pre-LN),
  * `final_logits_bias`. Byte-level BPE in GPT-2 mode with `<s>`/`</s>`
  * specials. Greedy decode; sequences are short and the parallel unit is
  * the row, so full recompute per step is acceptable here (the KV-cache
  * pattern from Whisper/GPT-2 applies identically if needed).
  */
final case class BartConfig(
    dModel: Int, encoderLayers: Int, encoderHeads: Int, decoderLayers: Int,
    decoderHeads: Int, encoderFfn: Int, decoderFfn: Int, maxPositions: Int,
    vocabSize: Int, bosTokenId: Int, eosTokenId: Int, decoderStartTokenId: Int,
    layerNormEps: Double = 1e-5,
    // Marian (opus-mt) variant knobs, HF config field names; BART defaults.
    scaleEmbedding: Boolean = false,     // scale_embedding: tokens × √d_model
    staticPositions: Boolean = false,    // static_position_embeddings: sinusoidal, offset 0
    normEmbedding: Boolean = true,       // Marian has no layernorm_embedding
    activation: String = "gelu",         // activation_function ("swish" = SiLU)
) extends Serializable {
  require(dModel % encoderHeads == 0 && dModel % decoderHeads == 0)
}

object BartConfig {
  def fromJson(json: String): BartConfig = {
    val n = new ObjectMapper().readTree(json)
    def i(name: String): Int = {
      require(n.has(name), s"bart config missing $name"); n.get(name).asInt()
    }
    val marian = n.has("model_type") && n.get("model_type").asText() == "marian"
    BartConfig(
      dModel = i("d_model"), encoderLayers = i("encoder_layers"),
      encoderHeads = i("encoder_attention_heads"), decoderLayers = i("decoder_layers"),
      decoderHeads = i("decoder_attention_heads"), encoderFfn = i("encoder_ffn_dim"),
      decoderFfn = i("decoder_ffn_dim"), maxPositions = i("max_position_embeddings"),
      vocabSize = i("vocab_size"), bosTokenId = i("bos_token_id"),
      eosTokenId = i("eos_token_id"), decoderStartTokenId = i("decoder_start_token_id"),
      scaleEmbedding =
        if (n.has("scale_embedding")) n.get("scale_embedding").asBoolean() else marian,
      staticPositions = if (n.has("static_position_embeddings"))
        n.get("static_position_embeddings").asBoolean() else marian,
      normEmbedding = !marian,
      activation = if (n.has("activation_function"))
        n.get("activation_function").asText() else "gelu",
    )
  }
}

final class BartModel(val cfg: BartConfig, weights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"bart checkpoint missing tensor $name"))

  private def lnInPlace(x: Array[Float], m: Int, stem: String): Unit =
    Tensors.layerNorm(x, m, cfg.dModel, w(stem + ".weight"), w(stem + ".bias"),
      cfg.layerNormEps)

  /** Post-LN residual: x = LN(x + sub). */
  private def addNorm(x: Array[Float], sub: Array[Float], m: Int, stem: String): Unit = {
    Tensors.addInPlace(x, sub)
    lnInPlace(x, m, stem)
  }

  private def attend(x: Array[Float], lq: Int, kv: Array[Float], lkv: Int,
      stem: String, heads: Int, causal: Boolean): Array[Float] = {
    val h = cfg.dModel
    val dh = h / heads
    val scale = 1.0 / math.sqrt(dh.toDouble)
    def pr(n: String) = Tensors.linear(
      if (n == "q_proj") x else kv, if (n == "q_proj") lq else lkv, h,
      w(s"$stem.$n.weight"), w(s"$stem.$n.bias"))
    val q = pr("q_proj"); val k = pr("k_proj"); val v = pr("v_proj")
    val ctx = new Array[Float](lq * h)
    val scores = new Array[Float](lkv)
    var hd = 0
    while (hd < heads) {
      val hOff = hd * dh
      var i = 0
      while (i < lq) {
        var j = 0
        while (j < lkv) {
          if (causal && j > i) scores(j) = -1e9f
          else {
            var acc = 0.0
            var d = 0
            while (d < dh) { acc += q(i * h + hOff + d).toDouble * k(j * h + hOff + d); d += 1 }
            scores(j) = (acc * scale).toFloat
          }
          j += 1
        }
        Tensors.softmaxRows(scores, 1, lkv)
        var d = 0
        while (d < dh) {
          var acc = 0.0
          var jj = 0
          while (jj < lkv) { acc += scores(jj).toDouble * v(jj * h + hOff + d); jj += 1 }
          ctx(i * h + hOff + d) = acc.toFloat
          d += 1
        }
        i += 1
      }
      hd += 1
    }
    Tensors.linear(ctx, lq, h, w(s"$stem.out_proj.weight"), w(s"$stem.out_proj.bias"))
  }

  private def ffn(x: Array[Float], m: Int, p: String, ffnDim: Int): Array[Float] = {
    val inter = Tensors.linear(x, m, cfg.dModel, w(p + "fc1.weight"), w(p + "fc1.bias"))
    if (cfg.activation == "swish" || cfg.activation == "silu") {
      var i = 0
      while (i < inter.length) {
        inter(i) = (inter(i) / (1.0 + math.exp(-inter(i).toDouble))).toFloat
        i += 1
      }
    } else Tensors.gelu(inter)
    Tensors.linear(inter, m, ffnDim, w(p + "fc2.weight"), w(p + "fc2.bias"))
  }

  /** Marian's MarianSinusoidalPositionalEmbedding table: first half sin,
    * second half cos, frequency 10000^(2i/d) — computed when the
    * checkpoint doesn't carry `embed_positions.weight` (newer HF Marian
    * checkpoints drop the buffer since it's deterministic).
    */
  private lazy val sinusoidalPositions: Tensor = {
    val d = cfg.dModel
    val half = d / 2
    val data = new Array[Float](cfg.maxPositions * d)
    var p = 0
    while (p < cfg.maxPositions) {
      var i = 0
      while (i < half) {
        val angle = p / math.pow(10000.0, 2.0 * i / d)
        data(p * d + i) = math.sin(angle).toFloat
        data(p * d + half + i) = math.cos(angle).toFloat
        i += 1
      }
      p += 1
    }
    Tensor(Array(cfg.maxPositions, d), data)
  }

  private def embed(tokens: Seq[Int], side: String): Array[Float] = {
    val h = cfg.dModel
    val shared = w("model.shared.weight")
    val pos =
      if (cfg.staticPositions)
        weights.getOrElse(s"model.$side.embed_positions.weight", sinusoidalPositions)
      else w(s"model.$side.embed_positions.weight")
    // BART: learned positions offset by 2 (the RoBERTa quirk); Marian:
    // sinusoidal from position 0, token embeddings scaled by √d_model
    val off = if (cfg.staticPositions) 0 else 2
    val tokScale = if (cfg.scaleEmbedding) math.sqrt(h.toDouble).toFloat else 1f
    val x = new Array[Float](tokens.length * h)
    var i = 0
    while (i < tokens.length) {
      var k = 0
      while (k < h) {
        x(i * h + k) = shared.data(tokens(i) * h + k) * tokScale +
          pos.data((i + off) * h + k)
        k += 1
      }
      i += 1
    }
    if (cfg.normEmbedding)
      lnInPlace(x, tokens.length, s"model.$side.layernorm_embedding")
    x
  }

  def encode(tokens: Seq[Int]): Array[Float] = {
    val l = tokens.length
    require(l > 0 && l + 2 <= cfg.maxPositions, s"source length $l out of range")
    val x = embed(tokens, "encoder")
    var layer = 0
    while (layer < cfg.encoderLayers) {
      val p = s"model.encoder.layers.$layer."
      addNorm(x, attend(x, l, x, l, p + "self_attn", cfg.encoderHeads, causal = false),
        l, p + "self_attn_layer_norm")
      addNorm(x, ffn(x, l, p, cfg.encoderFfn), l, p + "final_layer_norm")
      layer += 1
    }
    x
  }

  /** Full-recompute decoder forward → logits of the LAST position
    * (includes `final_logits_bias`).
    */
  def decodeStep(tokens: Seq[Int], encStates: Array[Float], encLen: Int): Array[Float] = {
    val l = tokens.length
    require(l + 2 <= cfg.maxPositions, s"decode length $l out of range")
    val h = cfg.dModel
    val x = embed(tokens, "decoder")
    var layer = 0
    while (layer < cfg.decoderLayers) {
      val p = s"model.decoder.layers.$layer."
      addNorm(x, attend(x, l, x, l, p + "self_attn", cfg.decoderHeads, causal = true),
        l, p + "self_attn_layer_norm")
      addNorm(x, attend(x, l, encStates, encLen, p + "encoder_attn", cfg.decoderHeads,
        causal = false), l, p + "encoder_attn_layer_norm")
      addNorm(x, ffn(x, l, p, cfg.decoderFfn), l, p + "final_layer_norm")
      layer += 1
    }
    val shared = w("model.shared.weight")
    val bias = weights.get("final_logits_bias")
    val last = (l - 1) * h
    val logits = new Array[Float](cfg.vocabSize)
    var vtok = 0
    while (vtok < cfg.vocabSize) {
      var acc: Double = bias.map(_.data(vtok).toDouble).getOrElse(0.0)
      var k = 0
      while (k < h) { acc += x(last + k).toDouble * shared.data(vtok * h + k); k += 1 }
      logits(vtok) = acc.toFloat
      vtok += 1
    }
    logits
  }

  /** Greedy summary token ids (start token not included; stops at EOS). */
  def summarize(sourceTokens: Seq[Int], maxNewTokens: Int): Seq[Int] =
    generate(sourceTokens, maxNewTokens, forcedBosTokenId = None)

  /** Beam-search seq2seq generation with HF `generate` semantics
    * (`num_beams`, `early_stopping=True`, `length_penalty` — the exact
    * kwargs the reference's `translation` UDF passes,
    * huggingface.py:1628): per step each live beam expands by
    * log-softmax next-token scores; the top 2·numBeams candidates are
    * scanned in score order, EOS continuations finalize a hypothesis
    * (score = Σ logprob / len^penalty, length including the start
    * token, the BeamHypotheses.add convention) and the first numBeams
    * non-EOS survivors become the next live set; stops early once
    * numBeams hypotheses are finished. `forcedBosTokenId` masks step 0
    * to the target-language token (logprob 0 after masking, as HF's
    * processor renormalizes). numBeams = 1 reduces exactly to greedy.
    */
  def generateBeam(sourceTokens: Seq[Int], maxNewTokens: Int,
      numBeams: Int, forcedBosTokenId: Option[Int] = None,
      lengthPenalty: Double = 1.0): Seq[Int] = {
    require(numBeams >= 1, "numBeams must be >= 1")
    if (numBeams == 1) return generate(sourceTokens, maxNewTokens, forcedBosTokenId)
    val enc = encode(sourceTokens)
    val maxLen = math.min(maxNewTokens,
      cfg.maxPositions - 3) // decode length guard, as in generate()
    final case class Beam(tokens: Vector[Int], score: Double)
    def logSoftmax(logits: Array[Float]): Array[Double] = {
      var mx = Double.NegativeInfinity
      logits.foreach(l => if (l > mx) mx = l)
      val exps = logits.map(l => math.exp(l - mx))
      val lse = mx + math.log(exps.sum)
      logits.map(_ - lse)
    }
    var live = Seq(Beam(Vector(cfg.decoderStartTokenId), 0.0))
    val finished = scala.collection.mutable.ArrayBuffer.empty[(Vector[Int], Double)]
    var step = 0
    while (step < maxLen && finished.size < numBeams && live.nonEmpty) {
      val cands =
        if (step == 0 && forcedBosTokenId.isDefined)
          // forced step: every beam extends only with the target token,
          // logprob 0 after the processor masks and renormalizes
          live.map(b => (b, forcedBosTokenId.get, b.score))
        else
          live.flatMap { b =>
            val lp = logSoftmax(decodeStep(b.tokens, enc, sourceTokens.length))
            lp.indices.map(t => (b, t, b.score + lp(t)))
          }
      val top = cands.sortBy(-_._3).take(2 * numBeams)
      val nextLive = Seq.newBuilder[Beam]
      var taken = 0
      top.foreach { case (b, tok, sc) =>
        if (tok == cfg.eosTokenId) {
          if (finished.size < numBeams)
            // length includes the start token (BeamHypotheses convention)
            finished += ((b.tokens, sc / math.pow(b.tokens.length, lengthPenalty)))
        } else if (taken < numBeams) {
          nextLive += Beam(b.tokens :+ tok, sc)
          taken += 1
        }
      }
      live = nextLive.result()
      step += 1
    }
    // finalize leftover live beams if fewer than numBeams finished
    live.foreach { b =>
      if (finished.size < numBeams)
        finished += ((b.tokens, b.score / math.pow(b.tokens.length, lengthPenalty)))
    }
    val best = finished.maxBy(_._2)._1
    best.drop(1) // strip the decoder start token
  }

  /** Greedy seq2seq generation. `forcedBosTokenId` pins the FIRST
    * generated token (HF's forced_bos_token_id logits processor — how
    * the reference's `translation` UDF selects the target language on
    * multilingual checkpoints, huggingface.py:1566-1638).
    */
  def generate(sourceTokens: Seq[Int], maxNewTokens: Int,
      forcedBosTokenId: Option[Int]): Seq[Int] = {
    val enc = encode(sourceTokens)
    var tokens = Vector(cfg.decoderStartTokenId)
    val out = Vector.newBuilder[Int]
    var n = 0
    var done = false
    while (!done && n < maxNewTokens && tokens.length + 2 < cfg.maxPositions) {
      val best =
        if (n == 0 && forcedBosTokenId.isDefined) forcedBosTokenId.get
        else {
          val logits = decodeStep(tokens, enc, sourceTokens.length)
          var b = 0
          var i = 1
          while (i < logits.length) { if (logits(i) > logits(b)) b = i; i += 1 }
          b
        }
      if (best == cfg.eosTokenId) done = true
      else { tokens :+= best; out += best; n += 1 }
    }
    out.result()
  }
}
