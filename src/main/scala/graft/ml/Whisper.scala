package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper

/** Whisper-architecture speech-to-text (Radford et al. 2022) — the
  * reference's `speech2text_for_conditional_generation`
  * (`/root/reference/pixeltable/functions/huggingface.py:979`, which runs
  * HF Whisper in-process). Encoder-decoder transformer in HF Whisper
  * weight naming (`model.encoder.*` / `model.decoder.*`, `k_proj` without
  * bias, tied output projection), so real checkpoints load directly:
  *
  *  - encoder: log-mel frames → two GELU conv1d stems (stride 1 then 2) →
  *    +sinusoidal-table positions → pre-LN self-attention stack → LN;
  *  - decoder: token+position embeddings → pre-LN blocks of causal
  *    self-attention, cross-attention over encoder states, FFN → LN →
  *    logits against the tied token embedding;
  *  - greedy decode from `decoder_start_token_id` until EOS.
  *
  * Single-utterance forward (batch = the partition's rows, looped): audio
  * lengths vary too much for padded batching to pay off, and the per-row
  * decode loop is embarrassingly parallel across partitions.
  */
final case class WhisperConfig(
    dModel: Int, encoderLayers: Int, encoderHeads: Int, decoderLayers: Int,
    decoderHeads: Int, encoderFfn: Int, decoderFfn: Int, numMelBins: Int,
    maxSourcePositions: Int, maxTargetPositions: Int, vocabSize: Int,
    decoderStartTokenId: Int, eosTokenId: Int, layerNormEps: Double = 1e-5,
) extends Serializable {
  require(dModel % encoderHeads == 0 && dModel % decoderHeads == 0)
}

object WhisperConfig {
  def fromJson(json: String): WhisperConfig = {
    val n = new ObjectMapper().readTree(json)
    def i(name: String): Int = {
      require(n.has(name), s"whisper config missing $name"); n.get(name).asInt()
    }
    WhisperConfig(
      dModel = i("d_model"), encoderLayers = i("encoder_layers"),
      encoderHeads = i("encoder_attention_heads"), decoderLayers = i("decoder_layers"),
      decoderHeads = i("decoder_attention_heads"), encoderFfn = i("encoder_ffn_dim"),
      decoderFfn = i("decoder_ffn_dim"), numMelBins = i("num_mel_bins"),
      maxSourcePositions = i("max_source_positions"),
      maxTargetPositions = i("max_target_positions"), vocabSize = i("vocab_size"),
      decoderStartTokenId = i("decoder_start_token_id"), eosTokenId = i("eos_token_id"),
    )
  }
}

final class WhisperModel(val cfg: WhisperConfig, weights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"whisper checkpoint missing tensor $name"))

  /** linear with the bias optional (whisper k_proj has none). */
  private def lin(x: Array[Float], m: Int, in: Int, stem: String): Array[Float] = {
    val wt = w(stem + ".weight")
    val b = weights.getOrElse(stem + ".bias", Tensor(Array(wt.rows), new Array[Float](wt.rows)))
    Tensors.linear(x, m, in, wt, b)
  }

  /** conv1d k=3 pad=1: in [t][cIn] → out [tOut][cOut], GELU applied. */
  private def conv3(x: Array[Float], t: Int, cIn: Int, stride: Int,
      stem: String): Array[Float] = {
    val wt = w(stem + ".weight") // [cOut, cIn, 3]
    val b = w(stem + ".bias")
    val cOut = wt.shape(0)
    require(wt.shape(1) == cIn && wt.shape(2) == 3, s"$stem shape mismatch")
    val tOut = (t + 2 - 3) / stride + 1
    val out = new Array[Float](tOut * cOut)
    var ti = 0
    while (ti < tOut) {
      var o = 0
      while (o < cOut) {
        var acc: Double = b.data(o)
        var k = 0
        while (k < 3) {
          val src = ti * stride + k - 1
          if (src >= 0 && src < t) {
            var c = 0
            while (c < cIn) {
              acc += wt.data((o * cIn + c) * 3 + k).toDouble * x(src * cIn + c)
              c += 1
            }
          }
          k += 1
        }
        out(ti * cOut + o) = acc.toFloat
        o += 1
      }
      ti += 1
    }
    Tensors.gelu(out)
    out
  }

  /** Multi-head attention of x (queries, len lq) over kv (len lkv). */
  private def attend(x: Array[Float], lq: Int, kv: Array[Float], lkv: Int,
      stem: String, heads: Int, causal: Boolean): Array[Float] = {
    val h = cfg.dModel
    val dh = h / heads
    val scale = 1.0 / math.sqrt(dh.toDouble)
    val q = lin(x, lq, h, stem + ".q_proj")
    val k = lin(kv, lkv, h, stem + ".k_proj")
    val v = lin(kv, lkv, h, stem + ".v_proj")
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
    lin(ctx, lq, h, stem + ".out_proj")
  }

  private def lnCopy(x: Array[Float], m: Int, stem: String): Array[Float] = {
    val c = java.util.Arrays.copyOf(x, x.length)
    Tensors.layerNorm(c, m, cfg.dModel, w(stem + ".weight"), w(stem + ".bias"),
      cfg.layerNormEps)
    c
  }

  private def ffn(x: Array[Float], m: Int, p: String, ffnDim: Int): Array[Float] = {
    val inter = lin(x, m, cfg.dModel, p + "fc1")
    Tensors.gelu(inter)
    lin(inter, m, ffnDim, p + "fc2")
  }

  /** mel [T][nMels] → encoder hidden states [T/2 * dModel]. */
  def encode(mel: Array[Array[Float]]): (Array[Float], Int) = {
    val t = mel.length
    require(t > 0, "empty mel")
    val flat = new Array[Float](t * cfg.numMelBins)
    var i = 0
    while (i < t) {
      require(mel(i).length == cfg.numMelBins, "mel bin count mismatch")
      System.arraycopy(mel(i), 0, flat, i * cfg.numMelBins, cfg.numMelBins)
      i += 1
    }
    val c1 = conv3(flat, t, cfg.numMelBins, 1, "model.encoder.conv1")
    val t2 = (t + 2 - 3) / 2 + 1
    val x = conv3(c1, t, cfg.dModel, 2, "model.encoder.conv2")
    require(t2 <= cfg.maxSourcePositions,
      s"encoder frames $t2 > max_source_positions ${cfg.maxSourcePositions}")
    val pos = w("model.encoder.embed_positions.weight")
    var j = 0
    while (j < t2 * cfg.dModel) { x(j) += pos.data(j); j += 1 }
    var layer = 0
    while (layer < cfg.encoderLayers) {
      val p = s"model.encoder.layers.$layer."
      val n1 = lnCopy(x, t2, p + "self_attn_layer_norm")
      Tensors.addInPlace(x, attend(n1, t2, n1, t2, p + "self_attn",
        cfg.encoderHeads, causal = false))
      Tensors.addInPlace(x, ffn(lnCopy(x, t2, p + "final_layer_norm"), t2, p, cfg.encoderFfn))
      layer += 1
    }
    Tensors.layerNorm(x, t2, cfg.dModel, w("model.encoder.layer_norm.weight"),
      w("model.encoder.layer_norm.bias"), cfg.layerNormEps)
    (x, t2)
  }

  /** Full-recompute decoder forward → logits of the LAST position. */
  def decodeStep(tokens: Seq[Int], encStates: Array[Float], encLen: Int): Array[Float] = {
    val l = tokens.length
    require(l <= cfg.maxTargetPositions, s"decode length $l > max_target_positions")
    val h = cfg.dModel
    val tok = w("model.decoder.embed_tokens.weight")
    val pos = w("model.decoder.embed_positions.weight")
    val x = new Array[Float](l * h)
    var i = 0
    while (i < l) {
      var k = 0
      while (k < h) { x(i * h + k) = tok.data(tokens(i) * h + k) + pos.data(i * h + k); k += 1 }
      i += 1
    }
    var layer = 0
    while (layer < cfg.decoderLayers) {
      val p = s"model.decoder.layers.$layer."
      val n1 = lnCopy(x, l, p + "self_attn_layer_norm")
      Tensors.addInPlace(x, attend(n1, l, n1, l, p + "self_attn",
        cfg.decoderHeads, causal = true))
      Tensors.addInPlace(x, attend(lnCopy(x, l, p + "encoder_attn_layer_norm"), l,
        encStates, encLen, p + "encoder_attn", cfg.decoderHeads, causal = false))
      Tensors.addInPlace(x, ffn(lnCopy(x, l, p + "final_layer_norm"), l, p, cfg.decoderFfn))
      layer += 1
    }
    Tensors.layerNorm(x, l, h, w("model.decoder.layer_norm.weight"),
      w("model.decoder.layer_norm.bias"), cfg.layerNormEps)
    // tied projection: logits = h_last · embed_tokensᵀ
    val last = (l - 1) * h
    val logits = new Array[Float](cfg.vocabSize)
    var vtok = 0
    while (vtok < cfg.vocabSize) {
      var acc = 0.0
      var k = 0
      while (k < h) { acc += x(last + k).toDouble * tok.data(vtok * h + k); k += 1 }
      logits(vtok) = acc.toFloat
      vtok += 1
    }
    logits
  }

  /** Incremental decoder state: per-layer self-attention KV cache plus
    * cross-attention K/V computed ONCE from the encoder states (the
    * dominant per-step cost in full recompute). `stepDecode` is
    * bit-identical to `decodeStep` on the same prefix (each position's
    * math reads only earlier K/V, which carry the same float values) —
    * pinned in WhisperSpec.
    */
  final class DecoderState(encStates: Array[Float], encLen: Int) {
    private[WhisperModel] val selfK =
      Array.ofDim[Float](cfg.decoderLayers, cfg.maxTargetPositions * cfg.dModel)
    private[WhisperModel] val selfV =
      Array.ofDim[Float](cfg.decoderLayers, cfg.maxTargetPositions * cfg.dModel)
    private[WhisperModel] val crossK = Array.tabulate(cfg.decoderLayers)(l =>
      lin(encStates, encLen, cfg.dModel, s"model.decoder.layers.$l.encoder_attn.k_proj"))
    private[WhisperModel] val crossV = Array.tabulate(cfg.decoderLayers)(l =>
      lin(encStates, encLen, cfg.dModel, s"model.decoder.layers.$l.encoder_attn.v_proj"))
    private[WhisperModel] val eLen = encLen
    private[WhisperModel] var len = 0
    // when non-null, stepDecode accumulates this step's cross-attention
    // (summed over layers and heads) here — the word-timestamp signal
    private[WhisperModel] var crossAttnSink: Array[Float] = null
  }

  /** Feed one token at position `state.len`; returns its output logits. */
  def stepDecode(token: Int, state: DecoderState): Array[Float] = {
    val t = state.len
    require(t < cfg.maxTargetPositions, s"decode position $t >= max_target_positions")
    val h = cfg.dModel
    val tok = w("model.decoder.embed_tokens.weight")
    val x = new Array[Float](h)
    var kk = 0
    while (kk < h) {
      x(kk) = tok.data(token * h + kk) + w("model.decoder.embed_positions.weight").data(t * h + kk)
      kk += 1
    }
    val heads = cfg.decoderHeads
    val dh = h / heads
    val scale = 1.0 / math.sqrt(dh.toDouble)
    var layer = 0
    while (layer < cfg.decoderLayers) {
      val p = s"model.decoder.layers.$layer."
      // causal self-attention over the cache
      val n1 = java.util.Arrays.copyOf(x, h)
      Tensors.layerNorm(n1, 1, h, w(p + "self_attn_layer_norm.weight"),
        w(p + "self_attn_layer_norm.bias"), cfg.layerNormEps)
      val q = lin(n1, 1, h, p + "self_attn.q_proj")
      System.arraycopy(lin(n1, 1, h, p + "self_attn.k_proj"), 0, state.selfK(layer), t * h, h)
      System.arraycopy(lin(n1, 1, h, p + "self_attn.v_proj"), 0, state.selfV(layer), t * h, h)
      Tensors.addInPlace(x, lin(attendCached(q, state.selfK(layer), state.selfV(layer),
        t + 1, heads, scale), 1, h, p + "self_attn.out_proj"))
      // cross-attention over the precomputed encoder K/V
      val n2 = java.util.Arrays.copyOf(x, h)
      Tensors.layerNorm(n2, 1, h, w(p + "encoder_attn_layer_norm.weight"),
        w(p + "encoder_attn_layer_norm.bias"), cfg.layerNormEps)
      val q2 = lin(n2, 1, h, p + "encoder_attn.q_proj")
      Tensors.addInPlace(x, lin(attendCached(q2, state.crossK(layer), state.crossV(layer),
        state.eLen, heads, scale, state.crossAttnSink), 1, h, p + "encoder_attn.out_proj"))
      // FFN
      val n3 = java.util.Arrays.copyOf(x, h)
      Tensors.layerNorm(n3, 1, h, w(p + "final_layer_norm.weight"),
        w(p + "final_layer_norm.bias"), cfg.layerNormEps)
      Tensors.addInPlace(x, ffn(n3, 1, p, cfg.decoderFfn))
      layer += 1
    }
    state.len = t + 1
    Tensors.layerNorm(x, 1, h, w("model.decoder.layer_norm.weight"),
      w("model.decoder.layer_norm.bias"), cfg.layerNormEps)
    val logits = new Array[Float](cfg.vocabSize)
    var vtok = 0
    while (vtok < cfg.vocabSize) {
      var acc = 0.0
      var k2 = 0
      while (k2 < h) { acc += x(k2).toDouble * tok.data(vtok * h + k2); k2 += 1 }
      logits(vtok) = acc.toFloat
      vtok += 1
    }
    logits
  }

  /** One query position attending over `n` cached key/value rows; when
    * `attnSink` is non-null each head's softmax row is accumulated into
    * it (cross-attention capture for word-level alignment).
    */
  private def attendCached(q: Array[Float], kc: Array[Float], vc: Array[Float],
      n: Int, heads: Int, scale: Double,
      attnSink: Array[Float] = null): Array[Float] = {
    val h = cfg.dModel
    val dh = h / heads
    val scores = new Array[Float](n)
    val ctx = new Array[Float](h)
    var hd = 0
    while (hd < heads) {
      val hOff = hd * dh
      var j = 0
      while (j < n) {
        var acc = 0.0
        var d = 0
        while (d < dh) { acc += q(hOff + d).toDouble * kc(j * h + hOff + d); d += 1 }
        scores(j) = (acc * scale).toFloat
        j += 1
      }
      Tensors.softmaxRows(scores, 1, n)
      if (attnSink != null) {
        var jj = 0
        while (jj < n) { attnSink(jj) += scores(jj); jj += 1 }
      }
      var d = 0
      while (d < dh) {
        var acc = 0.0
        var jj = 0
        while (jj < n) { acc += scores(jj).toDouble * vc(jj * h + hOff + d); jj += 1 }
        ctx(hOff + d) = acc.toFloat
        d += 1
      }
      hd += 1
    }
    ctx
  }

  /** Greedy transcription WITH per-step cross-attention capture, the
    * word-timestamp signal: returns (tokens incl. start token, one
    * attention row per fed token — cross-attention averaged over all
    * layers × heads, encLen columns).
    */
  def transcribeAligned(mel: Array[Array[Float]], maxNewTokens: Int = 64)
      : (Seq[Int], IndexedSeq[Array[Float]]) = {
    val (enc, encLen) = encode(mel)
    val state = new DecoderState(enc, encLen)
    val rows = Vector.newBuilder[Array[Float]]
    val norm = (cfg.decoderLayers * cfg.decoderHeads).toFloat
    def step(tk: Int): Array[Float] = {
      val sink = new Array[Float](encLen)
      state.crossAttnSink = sink
      val logits = stepDecode(tk, state)
      var i = 0
      while (i < encLen) { sink(i) /= norm; i += 1 }
      rows += sink
      logits
    }
    var tokens = Vector(cfg.decoderStartTokenId)
    var logits = step(cfg.decoderStartTokenId)
    var done = false
    while (!done && tokens.length < math.min(cfg.maxTargetPositions, 1 + maxNewTokens)) {
      var best = 0
      var i = 1
      while (i < logits.length) { if (logits(i) > logits(best)) best = i; i += 1 }
      if (best == cfg.eosTokenId) done = true
      else {
        tokens :+= best
        // feed unconditionally (unlike plain transcribe): every token
        // needs its attention row for alignment
        if (state.len < cfg.maxTargetPositions) logits = step(best)
        else done = true
      }
    }
    (tokens, rows.result())
  }

  /** Greedy transcription: token ids INCLUDING the start token, stopping
    * at EOS (EOS itself not included) or `maxNewTokens`. KV-cached with
    * once-per-utterance cross-attention K/V.
    */
  def transcribe(mel: Array[Array[Float]], maxNewTokens: Int = 64,
      forcedPrefix: Seq[Int] = Seq.empty): Seq[Int] = {
    val (enc, encLen) = encode(mel)
    val state = new DecoderState(enc, encLen)
    var tokens = cfg.decoderStartTokenId +: forcedPrefix.toVector
    var logits: Array[Float] = null
    tokens.foreach(tk => logits = stepDecode(tk, state))
    var done = false
    while (!done && tokens.length < math.min(cfg.maxTargetPositions,
        1 + forcedPrefix.length + maxNewTokens)) {
      var best = 0
      var i = 1
      while (i < logits.length) { if (logits(i) > logits(best)) best = i; i += 1 }
      if (best == cfg.eosTokenId) done = true
      else {
        tokens :+= best
        if (tokens.length < math.min(cfg.maxTargetPositions,
            1 + forcedPrefix.length + maxNewTokens)) logits = stepDecode(best, state)
      }
    }
    tokens
  }

  /** Greedy transcription plus the decode-quality metadata of
    * openai-whisper's DecodingResult (whisper `decoding.py`): avg_logprob
    * = Σ log-softmax of each SELECTED token (final EOT included) divided
    * by their count, and no_speech_prob = the no-speech token's softmax
    * probability at the start-of-transcript step (0.0 when the
    * checkpoint's vocab carries no such token).
    */
  def transcribeScored(mel: Array[Array[Float]], maxNewTokens: Int = 64,
      noSpeechTokenId: Option[Int] = None): WhisperModel.Scored = {
    val (enc, encLen) = encode(mel)
    val state = new DecoderState(enc, encLen)
    var logits = stepDecode(cfg.decoderStartTokenId, state)
    def logProbs(a: Array[Float]): Array[Double] = {
      var mx = Double.NegativeInfinity
      a.foreach(v => if (v > mx) mx = v)
      val lse = mx + math.log(a.map(v => math.exp(v - mx)).sum)
      a.map(_ - lse)
    }
    val noSpeech = noSpeechTokenId.map { id =>
      math.exp(logProbs(logits)(id))
    }.getOrElse(0.0)
    var tokens = Vector(cfg.decoderStartTokenId)
    var sumLp = 0.0
    var nSel = 0
    var done = false
    while (!done && tokens.length < math.min(cfg.maxTargetPositions,
        1 + maxNewTokens)) {
      val lp = logProbs(logits)
      var best = 0
      var i = 1
      while (i < lp.length) { if (lp(i) > lp(best)) best = i; i += 1 }
      sumLp += lp(best)
      nSel += 1
      if (best == cfg.eosTokenId) done = true
      else {
        tokens :+= best
        if (tokens.length < math.min(cfg.maxTargetPositions, 1 + maxNewTokens))
          logits = stepDecode(best, state)
      }
    }
    WhisperModel.Scored(tokens, if (nSel == 0) 0.0 else sumLp / nSel, noSpeech)
  }
}

object WhisperModel {
  /** tokens INCLUDING the start token; avg_logprob over selected tokens
    * incl. the final EOT; no_speech_prob at the SOT step.
    */
  final case class Scored(tokens: Seq[Int], avgLogprob: Double,
      noSpeechProb: Double)
}

/** The model-free decode-quality/fallback kernel of openai-whisper's
  * `transcribe` (whisper `transcribe.py:decode_with_fallback` and the
  * silence-skip rule; surfaced by the reference through
  * `functions/whisper.py:21` — the response's per-segment avg_logprob /
  * compression_ratio / no_speech_prob fields and the temperature ladder).
  * Oracle-gated by q141.
  */
object WhisperQuality {

  /** gzip-deflate compression ratio of the UTF-8 text
    * (whisper `utils.py:compression_ratio`): repetitive hallucinations
    * compress far better than real language — ratios above ~2.4 flag a
    * degenerate decode.
    */
  def compressionRatio(text: String): Double = {
    val bytes = text.getBytes("UTF-8")
    if (bytes.isEmpty) return 0.0
    val d = new java.util.zip.Deflater()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](bytes.length * 2 + 64)
    var n = 0
    while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
    d.end()
    bytes.length.toDouble / n
  }

  /** decode_with_fallback's retry decision: too-compressible OR
    * too-improbable triggers the next temperature — UNLESS the no-speech
    * gate says the window is silence (then the result stands).
    * Thresholds `None` (NaN here) disable their clause, as in the
    * reference's Optional parameters.
    */
  def needsFallback(avgLogprob: Double, compressionRatio: Double,
      noSpeechProb: Double, compressionRatioThreshold: Double = 2.4,
      logprobThreshold: Double = -1.0,
      noSpeechThreshold: Double = 0.6): Boolean = {
    var fallback = false
    if (!compressionRatioThreshold.isNaN &&
      compressionRatio > compressionRatioThreshold) fallback = true
    if (!logprobThreshold.isNaN && avgLogprob < logprobThreshold)
      fallback = true
    if (!noSpeechThreshold.isNaN && noSpeechProb > noSpeechThreshold)
      fallback = false // silence: accept the empty-ish result as-is
    fallback
  }

  /** The main transcribe loop's silence skip: confident no-speech AND
    * low logprob → the window is treated as silence and its tokens
    * dropped (both conditions required, transcribe.py).
    */
  def shouldSkipSilence(avgLogprob: Double, noSpeechProb: Double,
      logprobThreshold: Double = -1.0,
      noSpeechThreshold: Double = 0.6): Boolean =
    !noSpeechThreshold.isNaN && noSpeechProb > noSpeechThreshold &&
      !logprobThreshold.isNaN && avgLogprob < logprobThreshold

  /** The temperature ladder (transcribe's default
    * `(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)`): index of the first rung whose
    * decode would be accepted, given per-rung quality triples; the last
    * rung is accepted unconditionally.
    */
  def acceptedRung(rungs: Seq[(Double, Double, Double)],
      compressionRatioThreshold: Double = 2.4,
      logprobThreshold: Double = -1.0,
      noSpeechThreshold: Double = 0.6): Int = {
    val idx = rungs.zipWithIndex.indexWhere { case ((alp, cr, nsp), i) =>
      i == rungs.length - 1 || !needsFallback(alp, cr, nsp,
        compressionRatioThreshold, logprobThreshold, noSpeechThreshold)
    }
    if (idx < 0) rungs.length - 1 else idx
  }
}

/** Monotonic token↔frame alignment over a cross-attention matrix — the
  * whisper-native word-timestamp algorithm (openai/whisper
  * `word_timestamps=True`: DTW through the attention cost; the
  * reference's `whisperx.transcribe` solves the same problem with an
  * external wav2vec2 forced aligner, a third-party model outside this
  * engine's checkpoint family).
  */
object WhisperAlign {

  /** One aligned token: index into the token sequence plus its
    * [startFrame, endFrame) span on the encoder time axis.
    */
  final case class TokenSpan(tokenIdx: Int, startFrame: Int, endFrame: Int)

  /** DTW with the 3 monotonic moves (diag / skip-frame / skip-token) over
    * cost = −attention. Returns one contiguous frame span per token row;
    * spans are non-overlapping, ordered, and cover [0, nFrames) jointly.
    */
  def dtw(attn: IndexedSeq[Array[Float]]): Seq[TokenSpan] = {
    val n = attn.length
    if (n == 0) return Seq.empty
    val m = attn(0).length
    val INF = Double.MaxValue / 4
    // cost[i][j]: best path cost ending at token i, frame j
    val cost = Array.fill(n + 1, m + 1)(INF)
    val move = Array.ofDim[Byte](n + 1, m + 1) // 0=diag 1=left(frame) 2=up(token)
    cost(0)(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val c = -attn(i - 1)(j - 1).toDouble
        val diag = cost(i - 1)(j - 1)
        val left = cost(i)(j - 1)
        val up = cost(i - 1)(j)
        val best = math.min(diag, math.min(left, up))
        if (best < INF) {
          cost(i)(j) = c + best
          move(i)(j) = if (best == diag) 0 else if (best == left) 1 else 2
        }
        j += 1
      }
      i += 1
    }
    // backtrack: collect the frames each token row traverses
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    java.util.Arrays.fill(starts, Int.MaxValue)
    var ti = n
    var fj = m
    while (ti > 0 || fj > 0) {
      if (ti == 0) fj -= 1
      else if (fj == 0) ti -= 1
      else {
        val t = ti - 1; val f = fj - 1
        if (f < starts(t)) starts(t) = f
        if (f + 1 > ends(t)) ends(t) = f + 1
        move(ti)(fj) match {
          case 0 => ti -= 1; fj -= 1
          case 1 => fj -= 1
          case _ => ti -= 1
        }
      }
    }
    (0 until n).map { t =>
      val s = if (starts(t) == Int.MaxValue) 0 else starts(t)
      TokenSpan(t, s, math.max(ends(t), s + 1))
    }
  }
}
