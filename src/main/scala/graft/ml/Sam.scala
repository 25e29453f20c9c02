package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import java.awt.image.BufferedImage

/** SAM — Segment Anything (Kirillov et al. 2023), the reference's
  * promptable-segmentation family (`sam3_for_segmentation` /
  * `sam_automatic_mask_generation`,
  * `/root/reference/pixeltable/functions/huggingface.py:419,557` — the
  * reference wraps the newer gated SAM 3; this implements the canonical
  * public `SamModel` checkpoint layout, e.g. facebook/sam-vit-base, which
  * the same pixeltable API family originally shipped against).
  *
  * Architecture, all from the public HF `modeling_sam.py` semantics:
  *  - vision encoder: ViTDet — patch conv, learned absolute positions,
  *    per-layer WINDOW attention (window 14, global at
  *    `global_attn_indexes`) with decomposed relative positions added to
  *    the attention logits per axis, pre-LN MLP blocks, then a 2-conv
  *    neck with LayerNorm2d to `output_channels`;
  *  - prompt encoder: random-Fourier positional embedding (the
  *    checkpoint's gaussian matrix), labeled point embeddings, boxes as
  *    two corner points, `no_mask_embed` as the dense embedding;
  *  - mask decoder: iou token + 4 mask tokens + sparse prompts through a
  *    2-layer two-way transformer (token self-attn, token→image cross,
  *    MLP, image→token cross, with the 2× internal downsample), then
  *    transposed-conv upscaling and per-token hypernetwork MLPs dotted
  *    against the upscaled embedding → mask logits at 4× the embedding
  *    grid; a 3-layer MLP head predicts per-mask IoU.
  */
final case class SamConfig(
    visionHidden: Int, visionLayers: Int, visionHeads: Int, patchSize: Int,
    imageSize: Int, windowSize: Int, globalAttnIndexes: Set[Int],
    outputChannels: Int, mlpDim: Int, promptHidden: Int, numPosFeats: Int,
    decoderHeads: Int, decoderMlpDim: Int, attnDownsample: Int,
    numMaskTokens: Int, vitEps: Double = 1e-6, lnEps: Double = 1e-6,
) extends Serializable {
  require(promptHidden == outputChannels, "decoder hidden must equal neck output")
  def grid: Int = imageSize / patchSize
  def visionHeadDim: Int = visionHidden / visionHeads
}

object SamConfig {
  def fromJson(json: String): SamConfig = {
    val n = new ObjectMapper().readTree(json)
    val v = n.get("vision_config"); val m = n.get("mask_decoder_config")
    val p = n.get("prompt_encoder_config")
    require(v != null && m != null && p != null, "sam config sections missing")
    def i(node: com.fasterxml.jackson.databind.JsonNode, name: String, dflt: Int = Int.MinValue): Int =
      if (node.has(name)) node.get(name).asInt()
      else { require(dflt != Int.MinValue, s"sam config missing $name"); dflt }
    import scala.jdk.CollectionConverters._
    val hidden = i(v, "hidden_size")
    val mlpRatio = if (v.has("mlp_ratio")) v.get("mlp_ratio").asDouble() else 4.0
    SamConfig(
      visionHidden = hidden,
      visionLayers = i(v, "num_hidden_layers"),
      visionHeads = i(v, "num_attention_heads"),
      patchSize = i(v, "patch_size"),
      imageSize = i(v, "image_size"),
      windowSize = i(v, "window_size", 14),
      globalAttnIndexes =
        if (!v.has("global_attn_indexes")) Set.empty
        else v.get("global_attn_indexes").elements().asScala.map(_.asInt()).toSet,
      outputChannels = i(v, "output_channels"),
      mlpDim = math.round(hidden * mlpRatio).toInt,
      promptHidden = i(p, "hidden_size"),
      numPosFeats = i(p, "hidden_size") / 2,
      decoderHeads = i(m, "num_attention_heads", 8),
      decoderMlpDim = i(m, "mlp_dim", 2048),
      attnDownsample = i(m, "attention_downsample_rate", 2),
      numMaskTokens = i(m, "num_multimask_outputs", 3) + 1)
  }
}

/** One SAM instance: score, [x1,y1,x2,y2] box of the binary mask, mask. */
final case class SamInstance(score: Float, box: Array[Float],
    mask: Array[Array[Boolean]])

final class SamModel(val cfg: SamConfig, weights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"sam checkpoint missing tensor $name"))

  // ---- vision encoder (ViTDet) ----------------------------------------

  /** Decomposed relative-position attention over a (qh×qw) token grid —
    * rel tables indexed by coordinate delta (no interpolation: table size
    * must be 2·size−1, true for same-size q/k). x is [n, hid] row-major
    * over the grid; returns [n, hid].
    */
  private def visionAttention(li: Int, x: Array[Float], qh: Int, qw: Int): Array[Float] = {
    val hid = cfg.visionHidden; val heads = cfg.visionHeads; val dh = cfg.visionHeadDim
    val n = qh * qw
    val p = s"vision_encoder.layers.$li.attn."
    val qkv = Tensors.linear(x, n, hid, w(p + "qkv.weight"), w(p + "qkv.bias"))
    val relH = w(p + "rel_pos_h"); val relW = w(p + "rel_pos_w")
    require(relH.rows >= 2 * qh - 1 && relW.rows >= 2 * qw - 1, "rel_pos table too small")
    val scale = 1.0 / math.sqrt(dh.toDouble)
    val ctx = new Array[Float](n * hid)
    val scores = new Array[Float](n)
    var hd = 0
    while (hd < heads) {
      val off = hd * dh
      var qi = 0
      while (qi < n) {
        val qy = qi / qw; val qx = qi % qw
        // per-axis rel-pos dot products: relTerm(k) = q·Rh[qy-ky+qh-1] + q·Rw[qx-kx+qw-1]
        var ki = 0
        while (ki < n) {
          val ky = ki / qw; val kx = ki % qw
          var acc = 0.0
          var relh = 0.0
          var relw = 0.0
          val rhOff = (qy - ky + qh - 1) * relH.cols
          val rwOff = (qx - kx + qw - 1) * relW.cols
          var c = 0
          while (c < dh) {
            val qv = qkv(qi * 3 * hid + off + c).toDouble
            acc += qv * qkv(ki * 3 * hid + hid + off + c) // k block
            relh += qv * relH.data(rhOff + c)
            relw += qv * relW.data(rwOff + c)
            c += 1
          }
          scores(ki) = (acc * scale + relh + relw).toFloat
          ki += 1
        }
        Tensors.softmaxRows(scores, 1, n)
        var c = 0
        while (c < dh) {
          var acc = 0.0
          var kk = 0
          while (kk < n) { acc += scores(kk).toDouble * qkv(kk * 3 * hid + 2 * hid + off + c); kk += 1 }
          ctx(qi * hid + off + c) = acc.toFloat
          c += 1
        }
        qi += 1
      }
      hd += 1
    }
    Tensors.linear(ctx, n, hid, w(p + "proj.weight"), w(p + "proj.bias"))
  }

  /** Vision encoder forward: pixels [3, S, S] CHW → neck output
    * ([G·G, C] tokens row-major over the embedding grid).
    */
  def visionEncoder(pix: Array[Float]): Array[Float] = {
    val hid = cfg.visionHidden; val g = cfg.grid; val n = g * g
    // patch embedding + absolute positions (checkpoint layout [1,G,G,hid])
    val (patches, ph, pw) = Tensors.conv2d(pix, 3, cfg.imageSize, cfg.imageSize,
      w("vision_encoder.patch_embed.projection.weight"),
      w("vision_encoder.patch_embed.projection.bias"), cfg.patchSize, 0)
    require(ph == g && pw == g, s"patch grid $ph x $pw != $g")
    var x = new Array[Float](n * hid)
    val pos = w("vision_encoder.pos_embed")
    var t = 0
    while (t < n) {
      var c = 0
      while (c < hid) { x(t * hid + c) = patches(c * n + t) + pos.data(t * hid + c); c += 1 }
      t += 1
    }
    var li = 0
    while (li < cfg.visionLayers) {
      val p = s"vision_encoder.layers.$li."
      val res = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(x, n, hid, w(p + "layer_norm1.weight"), w(p + "layer_norm1.bias"), cfg.vitEps)
      val attnOut =
        if (cfg.globalAttnIndexes.contains(li) || cfg.windowSize <= 0)
          visionAttention(li, x, g, g)
        else {
          // window partition: pad grid to a ws multiple, attend per window
          val ws = cfg.windowSize
          val pg = ((g + ws - 1) / ws) * ws
          val out = new Array[Float](n * hid)
          val win = new Array[Float](ws * ws * hid)
          var wy = 0
          while (wy < pg / ws) {
            var wx = 0
            while (wx < pg / ws) {
              var yy = 0
              while (yy < ws) {
                var xx = 0
                while (xx < ws) {
                  val gy = wy * ws + yy; val gx = wx * ws + xx
                  val dst = (yy * ws + xx) * hid
                  if (gy < g && gx < g)
                    System.arraycopy(x, (gy * g + gx) * hid, win, dst, hid)
                  else java.util.Arrays.fill(win, dst, dst + hid, 0f)
                  xx += 1
                }
                yy += 1
              }
              val o = visionAttention(li, win, ws, ws)
              yy = 0
              while (yy < ws) {
                var xx = 0
                while (xx < ws) {
                  val gy = wy * ws + yy; val gx = wx * ws + xx
                  if (gy < g && gx < g)
                    System.arraycopy(o, (yy * ws + xx) * hid, out, (gy * g + gx) * hid, hid)
                  xx += 1
                }
                yy += 1
              }
              wx += 1
            }
            wy += 1
          }
          out
        }
      Tensors.addInPlace(attnOut, res)
      x = attnOut
      val res2 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(x, n, hid, w(p + "layer_norm2.weight"), w(p + "layer_norm2.bias"), cfg.vitEps)
      val inter = Tensors.linear(x, n, hid, w(p + "mlp.lin1.weight"), w(p + "mlp.lin1.bias"))
      Tensors.gelu(inter)
      x = Tensors.linear(inter, n, w(p + "mlp.lin1.weight").rows,
        w(p + "mlp.lin2.weight"), w(p + "mlp.lin2.bias"))
      Tensors.addInPlace(x, res2)
      li += 1
    }
    // neck: tokens → CHW, conv1×1 (no bias) + LayerNorm2d + conv3×3 + LayerNorm2d
    val cOut = cfg.outputChannels
    val chw = new Array[Float](hid * n)
    t = 0
    while (t < n) {
      var c = 0
      while (c < hid) { chw(c * n + t) = x(t * hid + c); c += 1 }
      t += 1
    }
    val (n1, _, _) = Tensors.conv2d(chw, hid, g, g, w("vision_encoder.neck.conv1.weight"), null, 1, 0)
    layerNorm2d(n1, cOut, n, "vision_encoder.neck.layer_norm1")
    val (n2, _, _) = Tensors.conv2d(n1, cOut, g, g, w("vision_encoder.neck.conv2.weight"), null, 1, 1)
    layerNorm2d(n2, cOut, n, "vision_encoder.neck.layer_norm2")
    // back to [n, C] tokens
    val out = new Array[Float](n * cOut)
    t = 0
    while (t < n) {
      var c = 0
      while (c < cOut) { out(t * cOut + c) = n2(c * n + t); c += 1 }
      t += 1
    }
    out
  }

  /** LayerNorm2d: per spatial position, normalize ACROSS channels of a
    * CHW block (the SAM neck/upscale norm).
    */
  private def layerNorm2d(x: Array[Float], c: Int, hw: Int, stem: String): Unit = {
    val g = w(stem + ".weight"); val b = w(stem + ".bias")
    var i = 0
    while (i < hw) {
      var sum = 0.0
      var ch = 0
      while (ch < c) { sum += x(ch * hw + i); ch += 1 }
      val mean = sum / c
      var vs = 0.0
      ch = 0
      while (ch < c) { val d = x(ch * hw + i) - mean; vs += d * d; ch += 1 }
      val inv = 1.0 / math.sqrt(vs / c + cfg.lnEps)
      ch = 0
      while (ch < c) {
        x(ch * hw + i) = ((x(ch * hw + i) - mean) * inv * g.data(ch) + b.data(ch)).toFloat
        ch += 1
      }
      i += 1
    }
  }

  // ---- prompt encoder --------------------------------------------------

  /** Random-Fourier positional encoding of normalized [0,1] coords:
    * c' = 2c−1; f = 2π (c' · G); pe = [sin f ∥ cos f].
    */
  def positionalEmbedding(xNorm: Double, yNorm: Double): Array[Float] = {
    val gm = w("shared_image_embedding.positional_embedding") // [2, numPosFeats]
    val nf = cfg.numPosFeats
    val cx = 2 * xNorm - 1; val cy = 2 * yNorm - 1
    val out = new Array[Float](2 * nf)
    var j = 0
    while (j < nf) {
      val f = 2 * math.Pi * (cx * gm.data(j) + cy * gm.data(nf + j))
      out(j) = math.sin(f).toFloat
      out(nf + j) = math.cos(f).toFloat
      j += 1
    }
    out
  }

  /** Positional grid for the G×G image embedding: pe((i+0.5)/G). Returns
    * [G·G, C] row-major.
    */
  def imagePositionalEmbeddings(): Array[Array[Float]] = {
    val g = cfg.grid
    Array.tabulate(g * g) { t =>
      positionalEmbedding((t % g + 0.5) / g, (t / g + 0.5) / g)
    }
  }

  /** Sparse prompt embeddings: labeled points (label 1 = foreground,
    * 0 = background, −1 = padding) and boxes as corner-point pairs —
    * coordinates in ORIGINAL preprocessed-image pixels ([0, imageSize)).
    * When points are given without boxes, HF pads with one (0,0,−1)
    * point; mirrored here.
    */
  def encodePrompts(points: Seq[(Double, Double, Int)],
      boxes: Seq[Array[Double]]): Array[Array[Float]] = {
    val s = cfg.imageSize.toDouble
    val c = cfg.promptHidden
    def emb(name: String): Array[Float] = w(name).data
    val padded =
      if (points.nonEmpty && boxes.isEmpty) points :+ ((0.0, 0.0, -1))
      else points
    val pointEmb = padded.map { case (x, y, label) =>
      if (label == -1) java.util.Arrays.copyOf(emb("prompt_encoder.not_a_point_embed.weight"), c)
      else {
        val pe = positionalEmbedding((x + 0.5) / s, (y + 0.5) / s)
        val add = emb(s"prompt_encoder.point_embed.$label.weight")
        Tensors.addInPlace(pe, add)
        pe
      }
    }
    val boxEmb = boxes.flatMap { b =>
      val tl = positionalEmbedding((b(0) + 0.5) / s, (b(1) + 0.5) / s)
      Tensors.addInPlace(tl, emb("prompt_encoder.point_embed.2.weight"))
      val br = positionalEmbedding((b(2) + 0.5) / s, (b(3) + 0.5) / s)
      Tensors.addInPlace(br, emb("prompt_encoder.point_embed.3.weight"))
      Seq(tl, br)
    }
    (pointEmb ++ boxEmb).toArray
  }

  // ---- mask decoder ----------------------------------------------------

  /** Multi-head attention with separate q/k/v inputs and an optional
    * internal downsample (out_proj maps back to C). q/k/v are [m, C]
    * flattened; internal dim read off q_proj.weight.
    */
  private def decoderAttention(stem: String, q: Array[Float], nq: Int,
      k: Array[Float], v: Array[Float], nk: Int): Array[Float] = {
    val c = cfg.promptHidden
    val inner = w(stem + "q_proj.weight").rows
    val heads = cfg.decoderHeads; val dh = inner / heads
    val qp = Tensors.linear(q, nq, c, w(stem + "q_proj.weight"), w(stem + "q_proj.bias"))
    val kp = Tensors.linear(k, nk, c, w(stem + "k_proj.weight"), w(stem + "k_proj.bias"))
    val vp = Tensors.linear(v, nk, c, w(stem + "v_proj.weight"), w(stem + "v_proj.bias"))
    val ctx = new Array[Float](nq * inner)
    val scores = new Array[Float](nk)
    val scale = 1.0 / math.sqrt(dh.toDouble)
    var hd = 0
    while (hd < heads) {
      val off = hd * dh
      var i = 0
      while (i < nq) {
        var j = 0
        while (j < nk) {
          var acc = 0.0
          var d = 0
          while (d < dh) { acc += qp(i * inner + off + d).toDouble * kp(j * inner + off + d); d += 1 }
          scores(j) = (acc * scale).toFloat
          j += 1
        }
        Tensors.softmaxRows(scores, 1, nk)
        var d = 0
        while (d < dh) {
          var acc = 0.0
          var jj = 0
          while (jj < nk) { acc += scores(jj).toDouble * vp(jj * inner + off + d); jj += 1 }
          ctx(i * inner + off + d) = acc.toFloat
          d += 1
        }
        i += 1
      }
      hd += 1
    }
    Tensors.linear(ctx, nq, inner, w(stem + "out_proj.weight"), w(stem + "out_proj.bias"))
  }

  private def addVecs(a: Array[Float], b: Array[Float]): Array[Float] = {
    val y = java.util.Arrays.copyOf(a, a.length); Tensors.addInPlace(y, b); y
  }

  /** Mask decoder: image embedding [G·G, C] + sparse prompts → (mask
    * logits [numMaskTokens · 4G · 4G], iou predictions [numMaskTokens]).
    */
  def maskDecoder(imgEmb: Array[Float], sparse: Array[Array[Float]])
      : (Array[Float], Array[Float]) = {
    val c = cfg.promptHidden; val g = cfg.grid; val nk = g * g
    val nm = cfg.numMaskTokens
    val imgPE = imagePositionalEmbeddings()
    val keyPE = new Array[Float](nk * c)
    var t = 0
    while (t < nk) { System.arraycopy(imgPE(t), 0, keyPE, t * c, c); t += 1 }
    // keys = image embedding + dense (no-mask) prompt embedding
    var keys = java.util.Arrays.copyOf(imgEmb, imgEmb.length)
    val dense = w("prompt_encoder.no_mask_embed.weight").data
    t = 0
    while (t < nk) {
      var ch = 0
      while (ch < c) { keys(t * c + ch) += dense(ch); ch += 1 }
      t += 1
    }
    // tokens: iou ∥ mask tokens ∥ sparse prompts
    val nq = 1 + nm + sparse.length
    val tokens = new Array[Float](nq * c)
    System.arraycopy(w("mask_decoder.iou_token.weight").data, 0, tokens, 0, c)
    System.arraycopy(w("mask_decoder.mask_tokens.weight").data, 0, tokens, c, nm * c)
    var i = 0
    while (i < sparse.length) {
      System.arraycopy(sparse(i), 0, tokens, (1 + nm + i) * c, c)
      i += 1
    }
    val queryPE = java.util.Arrays.copyOf(tokens, tokens.length)
    var queries = tokens
    var li = 0
    while (li < 2) {
      val p = s"mask_decoder.transformer.layers.$li."
      // 1. token self-attention (first layer attends raw tokens, later
      //    layers add the token PE to q/k — HF skip_first_layer_pe)
      if (li == 0) {
        queries = decoderAttention(p + "self_attn.", queries, nq, queries, queries, nq)
        // NOTE: HF REPLACES queries with the attention output on layer 0
      } else {
        val q = addVecs(queries, queryPE)
        val att = decoderAttention(p + "self_attn.", q, nq, q, queries, nq)
        queries = addVecs(queries, att)
      }
      Tensors.layerNorm(queries, nq, c, w(p + "layer_norm1.weight"), w(p + "layer_norm1.bias"), cfg.lnEps)
      // 2. cross attention token → image
      val q2 = addVecs(queries, queryPE)
      val k2 = addVecs(keys, keyPE)
      val att2 = decoderAttention(p + "cross_attn_token_to_image.", q2, nq, k2, keys, nk)
      queries = addVecs(queries, att2)
      Tensors.layerNorm(queries, nq, c, w(p + "layer_norm2.weight"), w(p + "layer_norm2.bias"), cfg.lnEps)
      // 3. MLP
      val inter = Tensors.linear(queries, nq, c, w(p + "mlp.lin1.weight"), w(p + "mlp.lin1.bias"))
      Tensors.reluInPlace(inter)
      val mlpOut = Tensors.linear(inter, nq, w(p + "mlp.lin1.weight").rows,
        w(p + "mlp.lin2.weight"), w(p + "mlp.lin2.bias"))
      queries = addVecs(queries, mlpOut)
      Tensors.layerNorm(queries, nq, c, w(p + "layer_norm3.weight"), w(p + "layer_norm3.bias"), cfg.lnEps)
      // 4. cross attention image → token
      val q4 = addVecs(queries, queryPE)
      val k4 = addVecs(keys, keyPE)
      val att4 = decoderAttention(p + "cross_attn_image_to_token.", k4, nk, q4, queries, nq)
      keys = addVecs(keys, att4)
      Tensors.layerNorm(keys, nk, c, w(p + "layer_norm4.weight"), w(p + "layer_norm4.bias"), cfg.lnEps)
      li += 1
    }
    // final token → image attention
    val qf = addVecs(queries, queryPE)
    val kf = addVecs(keys, keyPE)
    val attF = decoderAttention("mask_decoder.transformer.final_attn_token_to_image.",
      qf, nq, kf, keys, nk)
    queries = addVecs(queries, attF)
    Tensors.layerNorm(queries, nq, c,
      w("mask_decoder.transformer.layer_norm_final_attn.weight"),
      w("mask_decoder.transformer.layer_norm_final_attn.bias"), cfg.lnEps)
    // upscale the (updated) image embedding: tokens → CHW → 2× convT ×2
    val chw = new Array[Float](c * nk)
    t = 0
    while (t < nk) {
      var ch = 0
      while (ch < c) { chw(ch * nk + t) = keys(t * c + ch); ch += 1 }
      t += 1
    }
    val (u1, h1, w1) = convTranspose2x(chw, c, g, g, "mask_decoder.upscale_conv1")
    val c1 = w("mask_decoder.upscale_conv1.weight").shape(1)
    layerNorm2d(u1, c1, h1 * w1, "mask_decoder.upscale_layer_norm")
    Tensors.gelu(u1)
    val (u2, h2, w2) = convTranspose2x(u1, c1, h1, w1, "mask_decoder.upscale_conv2")
    val c2 = w("mask_decoder.upscale_conv2.weight").shape(1)
    Tensors.gelu(u2)
    // hypernetwork MLPs → per-token mask logits
    val masks = new Array[Float](nm * h2 * w2)
    var m = 0
    while (m < nm) {
      val tok = java.util.Arrays.copyOfRange(queries, (1 + m) * c, (2 + m) * c)
      val hyper = feedForward(tok, c, s"mask_decoder.output_hypernetworks_mlps.$m")
      var pxi = 0
      while (pxi < h2 * w2) {
        var acc = 0.0
        var ch = 0
        while (ch < c2) { acc += hyper(ch).toDouble * u2(ch * h2 * w2 + pxi); ch += 1 }
        masks(m * h2 * w2 + pxi) = acc.toFloat
        pxi += 1
      }
      m += 1
    }
    val iou = feedForward(java.util.Arrays.copyOfRange(queries, 0, c), c,
      "mask_decoder.iou_prediction_head")
    (masks, iou)
  }

  /** SamFeedForward: proj_in → ReLU → layers.i → ReLU → proj_out. */
  private def feedForward(x: Array[Float], in: Int, stem: String): Array[Float] = {
    var cur = Tensors.linear(x, 1, in, w(s"$stem.proj_in.weight"), w(s"$stem.proj_in.bias"))
    Tensors.reluInPlace(cur)
    var i = 0
    while (weights.contains(s"$stem.layers.$i.weight")) {
      cur = Tensors.linear(cur, 1, w(s"$stem.layers.$i.weight").cols,
        w(s"$stem.layers.$i.weight"), w(s"$stem.layers.$i.bias"))
      Tensors.reluInPlace(cur)
      i += 1
    }
    Tensors.linear(cur, 1, w(s"$stem.proj_out.weight").cols,
      w(s"$stem.proj_out.weight"), w(s"$stem.proj_out.bias"))
  }

  /** ConvTranspose2d kernel 2 stride 2 (the SAM upscaler shape); weight
    * layout [cin, cout, 2, 2].
    */
  private def convTranspose2x(x: Array[Float], cin: Int, h: Int, wd: Int,
      stem: String): (Array[Float], Int, Int) = {
    val wt = w(stem + ".weight"); val b = w(stem + ".bias")
    require(wt.shape(0) == cin && wt.shape(2) == 2 && wt.shape(3) == 2, s"$stem shape")
    val cout = wt.shape(1)
    val oh = h * 2; val ow = wd * 2
    val y = new Array[Float](cout * oh * ow)
    var oc = 0
    while (oc < cout) {
      java.util.Arrays.fill(y, oc * oh * ow, (oc + 1) * oh * ow, b.data(oc))
      oc += 1
    }
    var ic = 0
    while (ic < cin) {
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < wd) {
          val v = x((ic * h + yy) * wd + xx)
          var ky = 0
          while (ky < 2) {
            var kx = 0
            while (kx < 2) {
              var oc2 = 0
              while (oc2 < cout) {
                y((oc2 * oh + 2 * yy + ky) * ow + 2 * xx + kx) +=
                  v * wt.data(((ic * cout + oc2) * 2 + ky) * 2 + kx)
                oc2 += 1
              }
              kx += 1
            }
            ky += 1
          }
          xx += 1
        }
        yy += 1
      }
      ic += 1
    }
    (y, oh, ow)
  }

  // ---- end-to-end ------------------------------------------------------

  /** SamProcessor preprocessing: bilinear resize so the LONGEST edge is
    * imageSize, ImageNet-normalize, zero-pad bottom/right to the square.
    * Returns (pixels [3·S·S], resizedH, resizedW).
    */
  def preprocess(img: BufferedImage): (Array[Float], Int, Int) = {
    val s = cfg.imageSize
    val sw = img.getWidth; val sh = img.getHeight
    val scale = s.toDouble / math.max(sw, sh)
    val rw = math.max(1, math.round(sw * scale).toInt)
    val rh = math.max(1, math.round(sh * scale).toInt)
    val mean = Array(0.485, 0.456, 0.406)
    val std = Array(0.229, 0.224, 0.225)
    val out = new Array[Float](3 * s * s)
    // zero-pad = the NORMALIZED zero (HF pads after normalize with 0)
    var y = 0
    while (y < rh) {
      val fy = (y + 0.5) * sh / rh - 0.5
      val y0 = math.max(0, math.min(sh - 1, math.floor(fy).toInt))
      val y1 = math.min(sh - 1, y0 + 1)
      val wy = fy - y0
      var x = 0
      while (x < rw) {
        val fx = (x + 0.5) * sw / rw - 0.5
        val x0 = math.max(0, math.min(sw - 1, math.floor(fx).toInt))
        val x1 = math.min(sw - 1, x0 + 1)
        val wx = fx - x0
        val p00 = img.getRGB(x0, y0); val p01 = img.getRGB(x1, y0)
        val p10 = img.getRGB(x0, y1); val p11 = img.getRGB(x1, y1)
        var c = 0
        while (c < 3) {
          val sh8 = 16 - 8 * c
          val v = ((p00 >> sh8 & 0xff) * (1 - wx) + (p01 >> sh8 & 0xff) * wx) * (1 - wy) +
            ((p10 >> sh8 & 0xff) * (1 - wx) + (p11 >> sh8 & 0xff) * wx) * wy
          out(c * s * s + y * s + x) = ((v / 255.0 - mean(c)) / std(c)).toFloat
          c += 1
        }
        x += 1
      }
      y += 1
    }
    (out, rh, rw)
  }

  /** HF post_process_masks: mask logits (at S/4) → bilinear to (S, S) →
    * crop the un-padded region → bilinear to the original size →
    * threshold at 0. Returns the binary mask.
    */
  def postProcessMask(logits: Array[Float], mh: Int, mw: Int, resizedH: Int,
      resizedW: Int, origH: Int, origW: Int): Array[Array[Boolean]] = {
    val s = cfg.imageSize
    val full = Tensors.resizeBilinear(logits, mh, mw, s, s)
    val crop = new Array[Float](resizedH * resizedW)
    var y = 0
    while (y < resizedH) {
      System.arraycopy(full, y * s, crop, y * resizedW, resizedW)
      y += 1
    }
    val fin = Tensors.resizeBilinear(crop, resizedH, resizedW, origH, origW)
    Array.tabulate(origH, origW)((yy, xx) => fin(yy * origW + xx) > 0f)
  }

  /** Promptable segmentation: points/boxes in ORIGINAL image pixels
    * (scaled internally to the preprocessed frame), multimask output
    * (mask tokens 1..3) ranked by predicted IoU. Returns instances with
    * per-mask scores, mask bounding boxes and binary masks at original
    * resolution.
    */
  def segment(img: BufferedImage, points: Seq[(Double, Double, Int)],
      boxes: Seq[Array[Double]], multimask: Boolean = true): Seq[SamInstance] = {
    val (pix, rh, rw) = preprocess(img)
    val imgEmb = visionEncoder(pix)
    segmentEmbedded(imgEmb, img.getWidth, img.getHeight, rh, rw, points, boxes, multimask)
  }

  /** `segment` minus the vision tower — reuse one image embedding across
    * many prompts (the automatic-mask-generation loop).
    */
  def segmentEmbedded(imgEmb: Array[Float], origW: Int, origH: Int, rh: Int,
      rw: Int, points: Seq[(Double, Double, Int)], boxes: Seq[Array[Double]],
      multimask: Boolean): Seq[SamInstance] = {
    require(points.nonEmpty || boxes.nonEmpty,
      "at least one of points or boxes must be provided") // reference errors likewise
    val scale = rw.toDouble / origW // == rh/origH (longest-edge resize)
    val sp = points.map { case (x, y, l) => (x * scale, y * scale, l) }
    val sb = boxes.map(b => b.map(_ * scale))
    val sparse = encodePrompts(sp, sb)
    val (masks, iou) = maskDecoder(imgEmb, sparse)
    val g4 = cfg.grid * 4
    val sel = if (multimask) 1 until cfg.numMaskTokens else 0 until 1
    sel.map { m =>
      val bin = postProcessMask(
        java.util.Arrays.copyOfRange(masks, m * g4 * g4, (m + 1) * g4 * g4),
        g4, g4, rh, rw, origH, origW)
      var x1 = origW; var y1 = origH; var x2 = -1; var y2 = -1
      var yy = 0
      while (yy < origH) {
        var xx = 0
        while (xx < origW) {
          if (bin(yy)(xx)) {
            if (xx < x1) x1 = xx; if (xx > x2) x2 = xx
            if (yy < y1) y1 = yy; if (yy > y2) y2 = yy
          }
          xx += 1
        }
        yy += 1
      }
      val box = if (x2 < 0) Array(0f, 0f, 0f, 0f)
        else Array(x1.toFloat, y1.toFloat, (x2 + 1).toFloat, (y2 + 1).toFloat)
      SamInstance(iou(m), box, bin)
    }.sortBy(-_.score)
  }

  /** Automatic mask generation (the reference's
    * `sam_automatic_mask_generation`, huggingface.py:557-620, which
    * delegates to the HF `mask-generation` pipeline): a uniform point
    * grid, multimask predictions per point, filtered by predicted IoU and
    * stability score, then greedy mask-IoU NMS — all via `SamAuto`, whose
    * kernels are independently pinned by SamAutoSpec and oracle-gated by
    * q136 on closed-form synthetic candidates.
    */
  def automaticMasks(img: BufferedImage, gridSize: Int = 8,
      predIouThresh: Float = 0.7f, stabilityThresh: Float = 0.9f,
      stabilityOffset: Float = 1.0f, nmsIouThresh: Float = 0.7f): Seq[SamInstance] = {
    val (pix, rh, rw) = preprocess(img)
    val imgEmb = visionEncoder(pix)
    val g4 = cfg.grid * 4
    val candidates = Seq.newBuilder[(Float, Array[Float])] // (iou, logits)
    val scale = rw.toDouble / img.getWidth
    SamAuto.pointGrid(gridSize).foreach { case (nx, ny) =>
      val px = nx * img.getWidth
      val py = ny * img.getHeight
      val sparse = encodePrompts(Seq((px * scale, py * scale, 1)), Seq.empty)
      val (masks, iou) = maskDecoder(imgEmb, sparse)
      var m = 1
      while (m < cfg.numMaskTokens) {
        candidates += ((iou(m),
          java.util.Arrays.copyOfRange(masks, m * g4 * g4, (m + 1) * g4 * g4)))
        m += 1
      }
    }
    SamAuto.filterAndNms(candidates.result(), predIouThresh, stabilityThresh,
      stabilityOffset, nmsIouThresh).map { case (score, bin) =>
      val lg = Array.tabulate(g4 * g4)(i => if (bin(i)) 1f else -1f)
      val full = postProcessMask(lg, g4, g4, rh, rw, img.getHeight, img.getWidth)
      var x1 = img.getWidth; var y1 = img.getHeight; var x2 = -1; var y2 = -1
      var yy = 0
      while (yy < img.getHeight) {
        var xx = 0
        while (xx < img.getWidth) {
          if (full(yy)(xx)) {
            if (xx < x1) x1 = xx; if (xx > x2) x2 = xx
            if (yy < y1) y1 = yy; if (yy > y2) y2 = yy
          }
          xx += 1
        }
        yy += 1
      }
      val box = if (x2 < 0) Array(0f, 0f, 0f, 0f)
        else Array(x1.toFloat, y1.toFloat, (x2 + 1).toFloat, (y2 + 1).toFloat)
      SamInstance(score, box, full)
    }
  }
}

/** The model-free kernels of automatic mask generation, factored out so
  * the filter/dedup math is testable on synthetic candidates (SamAutoSpec)
  * and oracle-gateable (q136) independently of the neural towers. Mirrors
  * the public SAM `amg.py` / HF mask-generation pipeline semantics the
  * reference rides (huggingface.py:557-620).
  */
object SamAuto {

  /** `build_point_grid`: n uniformly spaced points per side in normalized
    * [0,1] with a half-cell offset — ((i+0.5)/n, (j+0.5)/n) — row-major.
    */
  def pointGrid(n: Int): Seq[(Double, Double)] =
    for (gy <- 0 until n; gx <- 0 until n)
      yield ((gx + 0.5) / n, (gy + 0.5) / n)

  /** `calculate_stability_score`: IoU between the mask binarized at
    * ±offset around the zero logit threshold. Because thresholding at
    * +offset yields a subset of thresholding at −offset, that IoU is
    * exactly area(logits > +offset) / area(logits > −offset).
    */
  def stabilityScore(lg: Array[Float], offset: Float): Float = {
    var hi = 0; var lo = 0; var i = 0
    while (i < lg.length) {
      if (lg(i) > offset) hi += 1
      if (lg(i) > -offset) lo += 1
      i += 1
    }
    if (lo == 0) 0f else hi.toFloat / lo
  }

  def maskIou(a: Array[Boolean], b: Array[Boolean]): Float = {
    var inter = 0; var union = 0; var i = 0
    while (i < a.length) {
      if (a(i) && b(i)) inter += 1
      if (a(i) || b(i)) union += 1
      i += 1
    }
    if (union == 0) 0f else inter.toFloat / union
  }

  /** The candidate filter chain: predicted-IoU threshold, stability-score
    * threshold, then greedy mask-IoU NMS binarized at logit 0, highest
    * predicted IoU first. Only KEPT masks suppress — a suppressed mask
    * never removes later candidates (the greedy-NMS property q136's m=3
    * branch exercises). Returns kept (score, binary mask) pairs in
    * descending score order.
    */
  def filterAndNms(cands: Seq[(Float, Array[Float])], predIouThresh: Float,
      stabilityThresh: Float, stabilityOffset: Float,
      nmsIouThresh: Float): Seq[(Float, Array[Boolean])] = {
    val filtered = cands.filter { case (score, lg) =>
      score >= predIouThresh &&
        stabilityScore(lg, stabilityOffset) >= stabilityThresh
    }
    val keptBin = Seq.newBuilder[(Float, Array[Boolean])]
    var kept = List.empty[Array[Boolean]]
    filtered.sortBy(-_._1).foreach { case (score, lg) =>
      val bin = lg.map(_ > 0f)
      if (!kept.exists(k => maskIou(bin, k) > nmsIouThresh)) {
        kept ::= bin
        keptBin += ((score, bin))
      }
    }
    keptBin.result()
  }
}
