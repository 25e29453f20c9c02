package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper

/** GPT-2-architecture decoder-only language model (Radford et al. 2019) —
  * the reference's `text_generation`
  * (`/root/reference/pixeltable/functions/huggingface.py:1113`, HF
  * text-generation pipeline in-process). HF GPT-2 weight naming (`wte`,
  * `wpe`, `h.N.attn.c_attn` fused-QKV, `Conv1D` [in,out] weight layout,
  * `gelu_new`, tied LM head), so real checkpoints load directly. Greedy
  * decode for determinism; full-recompute per step (no KV cache — the
  * executor-parallel unit is the row, and test/registry generations are
  * short).
  */
final case class Gpt2Config(
    nEmbd: Int, nLayer: Int, nHead: Int, nPositions: Int, vocabSize: Int,
    eosTokenId: Int, layerNormEps: Double = 1e-5,
) extends Serializable {
  require(nEmbd % nHead == 0)
}

object Gpt2Config {
  def fromJson(json: String): Gpt2Config = {
    val n = new ObjectMapper().readTree(json)
    def i(name: String): Int = {
      require(n.has(name), s"gpt2 config missing $name"); n.get(name).asInt()
    }
    Gpt2Config(nEmbd = i("n_embd"), nLayer = i("n_layer"), nHead = i("n_head"),
      nPositions = i("n_positions"), vocabSize = i("vocab_size"),
      eosTokenId = i("eos_token_id"))
  }
}

final class Gpt2Model(val cfg: Gpt2Config, weights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = weights.getOrElse(name,
    // accept both bare and HF "transformer." prefixed checkpoints
    weights.getOrElse(s"transformer.$name",
      throw new IllegalArgumentException(s"gpt2 checkpoint missing tensor $name")))

  /** Forward over the whole sequence → logits of the last position. */
  def lastLogits(tokens: Seq[Int]): Array[Float] = {
    val l = tokens.length
    require(l > 0 && l <= cfg.nPositions, s"sequence length $l out of range")
    val h = cfg.nEmbd
    val wte = w("wte.weight")
    val wpe = w("wpe.weight")
    val x = new Array[Float](l * h)
    var i = 0
    while (i < l) {
      var k = 0
      while (k < h) { x(i * h + k) = wte.data(tokens(i) * h + k) + wpe.data(i * h + k); k += 1 }
      i += 1
    }
    val heads = cfg.nHead
    val dh = h / heads
    val scale = 1.0 / math.sqrt(dh.toDouble)
    var layer = 0
    while (layer < cfg.nLayer) {
      val p = s"h.$layer."
      // pre-LN attention with fused qkv (c_attn: [h, 3h] Conv1D)
      val n1 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(n1, l, h, w(p + "ln_1.weight"), w(p + "ln_1.bias"), cfg.layerNormEps)
      val qkv = Tensors.linearT(n1, l, h, w(p + "attn.c_attn.weight"), w(p + "attn.c_attn.bias"))
      val ctx = new Array[Float](l * h)
      val scores = new Array[Float](l)
      var hd = 0
      while (hd < heads) {
        val hOff = hd * dh
        var qi = 0
        while (qi < l) {
          var j = 0
          while (j <= qi) {
            var acc = 0.0
            var d = 0
            while (d < dh) {
              acc += qkv(qi * 3 * h + hOff + d).toDouble * qkv(j * 3 * h + h + hOff + d)
              d += 1
            }
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
      // pre-LN MLP with gelu_new
      val n2 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(n2, l, h, w(p + "ln_2.weight"), w(p + "ln_2.bias"), cfg.layerNormEps)
      val inter = Tensors.linearT(n2, l, h, w(p + "mlp.c_fc.weight"), w(p + "mlp.c_fc.bias"))
      Tensors.geluNew(inter)
      Tensors.addInPlace(x, Tensors.linearT(inter, l, w(p + "mlp.c_fc.weight").cols,
        w(p + "mlp.c_proj.weight"), w(p + "mlp.c_proj.bias")))
      layer += 1
    }
    Tensors.layerNorm(x, l, h, w("ln_f.weight"), w("ln_f.bias"), cfg.layerNormEps)
    // tied head: logits = x_last · wteᵀ
    val last = (l - 1) * h
    val logits = new Array[Float](cfg.vocabSize)
    var vtok = 0
    while (vtok < cfg.vocabSize) {
      var acc = 0.0
      var k = 0
      while (k < h) { acc += x(last + k).toDouble * wte.data(vtok * h + k); k += 1 }
      logits(vtok) = acc.toFloat
      vtok += 1
    }
    logits
  }

  /** Per-layer KV cache for incremental decoding: each step computes one
    * position's q/k/v and attends over the cached keys — O(L·H) per step
    * instead of the full-recompute O(L²·H). Produces bit-identical logits
    * to `lastLogits` (each position's math only reads earlier K/V, which
    * are the same float values either way) — pinned in Gpt2Spec.
    */
  final class KvState {
    private[Gpt2Model] val k = Array.ofDim[Float](cfg.nLayer, cfg.nPositions * cfg.nEmbd)
    private[Gpt2Model] val v = Array.ofDim[Float](cfg.nLayer, cfg.nPositions * cfg.nEmbd)
    private[Gpt2Model] var len = 0
  }

  /** Feed ONE token at position `state.len`; returns its output logits. */
  def step(token: Int, state: KvState): Array[Float] = {
    val t = state.len
    require(t < cfg.nPositions, s"position $t >= n_positions")
    val h = cfg.nEmbd
    val wte = w("wte.weight")
    val x = new Array[Float](h)
    var kk = 0
    while (kk < h) { x(kk) = wte.data(token * h + kk) + w("wpe.weight").data(t * h + kk); kk += 1 }
    val heads = cfg.nHead
    val dh = h / heads
    val scale = 1.0 / math.sqrt(dh.toDouble)
    val scores = new Array[Float](t + 1)
    var layer = 0
    while (layer < cfg.nLayer) {
      val p = s"h.$layer."
      val n1 = java.util.Arrays.copyOf(x, h)
      Tensors.layerNorm(n1, 1, h, w(p + "ln_1.weight"), w(p + "ln_1.bias"), cfg.layerNormEps)
      val qkv = Tensors.linearT(n1, 1, h, w(p + "attn.c_attn.weight"), w(p + "attn.c_attn.bias"))
      val kc = state.k(layer); val vc = state.v(layer)
      System.arraycopy(qkv, h, kc, t * h, h)
      System.arraycopy(qkv, 2 * h, vc, t * h, h)
      val ctx = new Array[Float](h)
      var hd = 0
      while (hd < heads) {
        val hOff = hd * dh
        var j = 0
        while (j <= t) {
          var acc = 0.0
          var d = 0
          while (d < dh) { acc += qkv(hOff + d).toDouble * kc(j * h + hOff + d); d += 1 }
          scores(j) = (acc * scale).toFloat
          j += 1
        }
        Tensors.softmaxRows(scores, 1, t + 1)
        var d = 0
        while (d < dh) {
          var acc = 0.0
          var jj = 0
          while (jj <= t) { acc += scores(jj).toDouble * vc(jj * h + hOff + d); jj += 1 }
          ctx(hOff + d) = acc.toFloat
          d += 1
        }
        hd += 1
      }
      Tensors.addInPlace(x, Tensors.linearT(ctx, 1, h,
        w(p + "attn.c_proj.weight"), w(p + "attn.c_proj.bias")))
      val n2 = java.util.Arrays.copyOf(x, h)
      Tensors.layerNorm(n2, 1, h, w(p + "ln_2.weight"), w(p + "ln_2.bias"), cfg.layerNormEps)
      val inter = Tensors.linearT(n2, 1, h, w(p + "mlp.c_fc.weight"), w(p + "mlp.c_fc.bias"))
      Tensors.geluNew(inter)
      Tensors.addInPlace(x, Tensors.linearT(inter, 1, w(p + "mlp.c_fc.weight").cols,
        w(p + "mlp.c_proj.weight"), w(p + "mlp.c_proj.bias")))
      layer += 1
    }
    state.len = t + 1
    Tensors.layerNorm(x, 1, h, w("ln_f.weight"), w("ln_f.bias"), cfg.layerNormEps)
    val logits = new Array[Float](cfg.vocabSize)
    var vtok = 0
    while (vtok < cfg.vocabSize) {
      var acc = 0.0
      var k2 = 0
      while (k2 < h) { acc += x(k2).toDouble * wte.data(vtok * h + k2); k2 += 1 }
      logits(vtok) = acc.toFloat
      vtok += 1
    }
    logits
  }

  /** Greedy continuation of `prompt` token ids (prompt NOT included in the
    * return), stopping at EOS or `maxNewTokens`. KV-cached: O(L·H) per
    * generated token.
    */
  def generate(prompt: Seq[Int], maxNewTokens: Int): Seq[Int] = {
    require(prompt.nonEmpty, "empty prompt")
    val usable = prompt.takeRight(cfg.nPositions)
    val state = new KvState
    var logits: Array[Float] = null
    usable.foreach(tok => logits = step(tok, state))
    val out = Vector.newBuilder[Int]
    var n = 0
    var done = false
    while (!done && n < maxNewTokens && state.len < cfg.nPositions) {
      var best = 0
      var i = 1
      while (i < logits.length) { if (logits(i) > logits(best)) best = i; i += 1 }
      if (best == cfg.eosTokenId) done = true
      else {
        out += best; n += 1
        if (n < maxNewTokens && state.len < cfg.nPositions) logits = step(best, state)
        else done = true
      }
    }
    out.result()
  }
}
