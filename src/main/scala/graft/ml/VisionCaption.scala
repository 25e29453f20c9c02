package graft.ml

/** Image captioning as the HF VisionEncoderDecoder composition — the
  * reference's `image_captioning`
  * (`/root/reference/pixeltable/functions/huggingface.py:1234`, which
  * accepts any image-to-text checkpoint; the ViT-encoder + GPT-2-decoder
  * pair is the canonical open composition, e.g.
  * `nlpconnect/vit-gpt2-image-captioning`). Encoder = the `Vit` tower's
  * full hidden states; decoder = GPT-2 blocks extended with the
  * `add_cross_attention` sublayer exactly as HF lays it out:
  *
  *   x += attn(ln_1(x));  x += crossattn(ln_cross_attn(x), enc);  x += mlp(ln_2(x))
  *
  * where crossattention uses `q_attn` [H,H] for queries and the fused
  * `c_attn` [H,2H] Conv1D for K/V from the encoder states. Weight names
  * follow the combined checkpoint layout (`encoder.*` ViT / `decoder.
  * transformer.*` GPT-2), remapped on load to the towers' native names.
  */
final class CaptionModel(val vitCfg: VitConfig, val gptCfg: Gpt2Config,
    weights: Map[String, Tensor]) extends Serializable {

  @transient private lazy val vit = new VitModel(vitCfg, weights)

  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"caption checkpoint missing tensor $name"))

  def preprocess(img: java.awt.image.BufferedImage): Array[Float] = vit.preprocess(img)

  def encode(pix: Array[Float]): Array[Float] = vit.encodeStates(pix)

  /** GPT-2-with-cross-attention forward → last-position logits. */
  def decodeLogits(tokens: Seq[Int], enc: Array[Float], encLen: Int): Array[Float] = {
    val l = tokens.length
    require(l > 0 && l <= gptCfg.nPositions, s"decode length $l out of range")
    val h = gptCfg.nEmbd
    require(enc.length == encLen * h, "encoder state shape mismatch")
    val wte = w("wte.weight")
    val x = new Array[Float](l * h)
    var i = 0
    while (i < l) {
      var k = 0
      while (k < h) { x(i * h + k) = wte.data(tokens(i) * h + k) + w("wpe.weight").data(i * h + k); k += 1 }
      i += 1
    }
    val heads = gptCfg.nHead
    val dh = h / heads
    val scale = 1.0 / math.sqrt(dh.toDouble)
    var layer = 0
    while (layer < gptCfg.nLayer) {
      val p = s"h.$layer."
      // causal self-attention (fused qkv)
      val n1 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(n1, l, h, w(p + "ln_1.weight"), w(p + "ln_1.bias"), gptCfg.layerNormEps)
      val qkv = Tensors.linearT(n1, l, h, w(p + "attn.c_attn.weight"), w(p + "attn.c_attn.bias"))
      val ctx = new Array[Float](l * h)
      val scores = new Array[Float](math.max(l, encLen))
      var hd = 0
      while (hd < heads) {
        val hOff = hd * dh
        var qi = 0
        while (qi < l) {
          var j = 0
          while (j <= qi) {
            var acc = 0.0
            var d = 0
            while (d < dh) { acc += qkv(qi * 3 * h + hOff + d).toDouble * qkv(j * 3 * h + h + hOff + d); d += 1 }
            scores(j) = (acc * scale).toFloat
            j += 1
          }
          Tensors.softmaxRows(scores, 1, qi + 1)
          var d = 0
          while (d < dh) {
            var acc = 0.0
            var jj = 0
            while (jj <= qi) { acc += scores(jj).toDouble * qkv(jj * 3 * h + 2 * h + hOff + d); jj += 1 }
            ctx(qi * h + hOff + d) = acc.toFloat
            d += 1
          }
          qi += 1
        }
        hd += 1
      }
      Tensors.addInPlace(x, Tensors.linearT(ctx, l, h,
        w(p + "attn.c_proj.weight"), w(p + "attn.c_proj.bias")))
      // cross-attention over encoder states
      val n2 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(n2, l, h, w(p + "ln_cross_attn.weight"),
        w(p + "ln_cross_attn.bias"), gptCfg.layerNormEps)
      val q = Tensors.linearT(n2, l, h,
        w(p + "crossattention.q_attn.weight"), w(p + "crossattention.q_attn.bias"))
      val kv = Tensors.linearT(enc, encLen, h,
        w(p + "crossattention.c_attn.weight"), w(p + "crossattention.c_attn.bias"))
      val ctx2 = new Array[Float](l * h)
      hd = 0
      while (hd < heads) {
        val hOff = hd * dh
        var qi = 0
        while (qi < l) {
          var j = 0
          while (j < encLen) {
            var acc = 0.0
            var d = 0
            while (d < dh) { acc += q(qi * h + hOff + d).toDouble * kv(j * 2 * h + hOff + d); d += 1 }
            scores(j) = (acc * scale).toFloat
            j += 1
          }
          Tensors.softmaxRows(scores, 1, encLen)
          var d = 0
          while (d < dh) {
            var acc = 0.0
            var jj = 0
            while (jj < encLen) { acc += scores(jj).toDouble * kv(jj * 2 * h + h + hOff + d); jj += 1 }
            ctx2(qi * h + hOff + d) = acc.toFloat
            d += 1
          }
          qi += 1
        }
        hd += 1
      }
      Tensors.addInPlace(x, Tensors.linearT(ctx2, l, h,
        w(p + "crossattention.c_proj.weight"), w(p + "crossattention.c_proj.bias")))
      // MLP
      val n3 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(n3, l, h, w(p + "ln_2.weight"), w(p + "ln_2.bias"), gptCfg.layerNormEps)
      val inter = Tensors.linearT(n3, l, h, w(p + "mlp.c_fc.weight"), w(p + "mlp.c_fc.bias"))
      Tensors.geluNew(inter)
      Tensors.addInPlace(x, Tensors.linearT(inter, l, w(p + "mlp.c_fc.weight").cols,
        w(p + "mlp.c_proj.weight"), w(p + "mlp.c_proj.bias")))
      layer += 1
    }
    Tensors.layerNorm(x, l, h, w("ln_f.weight"), w("ln_f.bias"), gptCfg.layerNormEps)
    val last = (l - 1) * h
    val logits = new Array[Float](gptCfg.vocabSize)
    var vtok = 0
    while (vtok < gptCfg.vocabSize) {
      var acc = 0.0
      var k = 0
      while (k < h) { acc += x(last + k).toDouble * wte.data(vtok * h + k); k += 1 }
      logits(vtok) = acc.toFloat
      vtok += 1
    }
    logits
  }

  /** Greedy caption token ids (start token not included; stops at EOS). */
  def caption(pix: Array[Float], maxNewTokens: Int): Seq[Int] = {
    require(vitCfg.hiddenSize == gptCfg.nEmbd,
      "encoder/decoder hidden sizes differ (projection layers not supported)")
    val enc = encode(pix)
    val encLen = vit.seqLen
    var tokens = Vector(gptCfg.eosTokenId) // BOS = EOS, the GPT-2 convention
    val out = Vector.newBuilder[Int]
    var n = 0
    var done = false
    while (!done && n < maxNewTokens && tokens.length < gptCfg.nPositions) {
      val logits = decodeLogits(tokens, enc, encLen)
      var best = 0
      var i = 1
      while (i < logits.length) { if (logits(i) > logits(best)) best = i; i += 1 }
      if (best == gptCfg.eosTokenId) done = true
      else { tokens :+= best; out += best; n += 1 }
    }
    out.result()
  }
}
