package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import java.awt.image.BufferedImage

/** DETR object detection (Carion et al. 2020, "End-to-End Object Detection
  * with Transformers") — the reference's `detr_for_object_detection`
  * (`/root/reference/pixeltable/functions/huggingface.py:220`, HF
  * DetrForObjectDetection in-process). HF weight naming for the
  * `use_timm_backbone=false` checkpoint layout: a transformers-native
  * ResNet bottleneck backbone (`model.backbone.conv_encoder.model.*` —
  * embedder 7×7/2 conv + frozen BN + ReLU + 3×3/2 maxpool, then stages of
  * bottleneck layers with the stride in the middle 3×3 conv and a
  * conv+BN shortcut on each stage's first layer), a 1×1 input projection
  * to d_model, normalized sine 2-D position embeddings (temperature
  * 10000, scale 2π), a post-LN transformer encoder over the flattened
  * feature map (positions added to Q/K at every layer, never to V), a
  * post-LN decoder over `num_queries` learned query embeddings (queries
  * added to Q/K of self-attention and to Q of cross-attention), and the
  * two heads: `class_labels_classifier` (num_labels + 1 no-object class)
  * and the 3-layer ReLU MLP `bbox_predictor` with sigmoid (cx, cy, w, h)
  * output. Batchnorm is inference-frozen (DetrFrozenBatchNorm2d).
  */
final case class ResNetConfig(
    embeddingSize: Int, hiddenSizes: Seq[Int], depths: Seq[Int],
) extends Serializable {
  require(hiddenSizes.length == depths.length && hiddenSizes.nonEmpty)
}

final case class DetrConfig(
    dModel: Int, encoderLayers: Int, decoderLayers: Int, numHeads: Int,
    ffnDim: Int, numQueries: Int, numLabels: Int, backbone: ResNetConfig,
    layerNormEps: Double = 1e-5, bnEps: Double = 1e-5,
    id2label: Map[Int, String] = Map.empty,
) extends Serializable {
  require(dModel % 2 == 0 && dModel % numHeads == 0)
  def headDim: Int = dModel / numHeads
}

object DetrConfig {
  def fromJson(json: String): DetrConfig = {
    val n = new ObjectMapper().readTree(json)
    def i(name: String): Int = {
      require(n.has(name), s"detr config missing $name"); n.get(name).asInt()
    }
    require(!n.has("use_timm_backbone") || !n.get("use_timm_backbone").asBoolean(),
      "timm backbone layout not supported; export with use_timm_backbone=false")
    val bb = n.get("backbone_config")
    require(bb != null, "detr config missing backbone_config")
    require(!bb.has("layer_type") || bb.get("layer_type").asText() == "bottleneck",
      "only bottleneck ResNet backbones supported")
    import scala.jdk.CollectionConverters._
    val id2label =
      if (!n.has("id2label")) Map.empty[Int, String]
      else n.get("id2label").properties().iterator().asScala
        .map(e => e.getKey.toInt -> e.getValue.asText()).toMap
    DetrConfig(
      dModel = i("d_model"), encoderLayers = i("encoder_layers"),
      decoderLayers = i("decoder_layers"), numHeads = i("encoder_attention_heads"),
      ffnDim = i("encoder_ffn_dim"), numQueries = i("num_queries"),
      numLabels = if (id2label.nonEmpty) id2label.size else i("num_labels"),
      backbone = ResNetConfig(
        embeddingSize = bb.get("embedding_size").asInt(),
        hiddenSizes = bb.get("hidden_sizes").elements().asScala.map(_.asInt()).toSeq,
        depths = bb.get("depths").elements().asScala.map(_.asInt()).toSeq),
      id2label = id2label)
  }
}

final case class Detection(score: Float, label: Int, labelText: String,
    box: Array[Float]) // box = [x1, y1, x2, y2] in input-image pixels

/** One backbone stage output: CHW data, channels, height, width. */
final case class StageOut(data: Array[Float], c: Int, h: Int, w: Int)

/** One panoptic segment: `id` matches pixel values in the segmentation
  * map (reference `SegmentInfo`, huggingface.py:300-306).
  */
final case class PanopticSegment(id: Int, labelId: Int, labelText: String,
    score: Float, wasFused: Boolean)

/** `detr_for_segmentation` response (huggingface.py:308-310): the (H, W)
  * segment-id map (−1 = unassigned) plus per-segment metadata.
  */
final case class PanopticResult(segmentation: Array[Array[Int]],
    segments: Seq[PanopticSegment])

final class DetrModel(val cfg: DetrConfig, weights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"detr checkpoint missing tensor $name"))
  private def has(name: String): Boolean = weights.contains(name)

  private val BB = "model.backbone.conv_encoder.model."

  /** conv + frozen BN (+ optional ReLU) — the HF ResNetConvLayer. */
  private def convBn(x: Array[Float], cin: Int, h: Int, wd: Int, stem: String,
      stride: Int, pad: Int, relu: Boolean): (Array[Float], Int, Int) = {
    val (y, oh, ow) = Tensors.conv2d(x, cin, h, wd, w(stem + "convolution.weight"),
      null, stride, pad)
    val c = w(stem + "convolution.weight").shape(0)
    Tensors.batchNorm2d(y, c, oh * ow,
      w(stem + "normalization.weight"), w(stem + "normalization.bias"),
      w(stem + "normalization.running_mean"), w(stem + "normalization.running_var"),
      cfg.bnEps)
    if (relu) Tensors.reluInPlace(y)
    (y, oh, ow)
  }

  /** ResNet backbone → every stage's output feature map (HF
    * DetrConvEncoder returns all stages; detection uses only the last,
    * the segmentation mask head takes FPN laterals from stages 2, 1, 0).
    */
  def backboneStages(pix: Array[Float], h0: Int, w0: Int): Seq[StageOut] = {
    var (x, h, wd) = convBn(pix, 3, h0, w0, BB + "embedder.embedder.", 2, 3, relu = true)
    var c = cfg.backbone.embeddingSize
    val mp = Tensors.maxPool2d(x, c, h, wd, 3, 2, 1)
    x = mp._1; h = mp._2; wd = mp._3
    val stages = Seq.newBuilder[StageOut]
    var s = 0
    while (s < cfg.backbone.depths.length) {
      val out = cfg.backbone.hiddenSizes(s)
      val reduces = out / 4
      var l = 0
      while (l < cfg.backbone.depths(s)) {
        val p = BB + s"encoder.stages.$s.layers.$l."
        // HF ResNetStage: stride 2 on the first layer of every stage but
        // the first (downsample_in_first_stage=false), stride in the
        // middle 3×3 conv (downsample_in_bottleneck=false)
        val stride = if (l == 0 && s > 0) 2 else 1
        val shortcut: (Array[Float], Int, Int) =
          if (has(p + "shortcut.convolution.weight"))
            convBn(x, c, h, wd, p + "shortcut.", stride, 0, relu = false)
          else (x, h, wd)
        val (a, h1, w1) = convBn(x, c, h, wd, p + "layer.0.", 1, 0, relu = true)
        val (b, h2, w2) = convBn(a, reduces, h1, w1, p + "layer.1.", stride, 1, relu = true)
        val (y, h3, w3) = convBn(b, reduces, h2, w2, p + "layer.2.", 1, 0, relu = false)
        require(h3 == shortcut._2 && w3 == shortcut._3, "resnet residual shape mismatch")
        Tensors.addInPlace(y, shortcut._1)
        Tensors.reluInPlace(y)
        x = y; h = h3; wd = w3; c = out
        l += 1
      }
      stages += StageOut(x, c, h, wd)
      s += 1
    }
    stages.result()
  }

  /** ResNet backbone → (C_last feature map CHW, outH, outW). */
  def backbone(pix: Array[Float], h0: Int, w0: Int): (Array[Float], Int, Int) = {
    val last = backboneStages(pix, h0, w0).last
    (last.data, last.h, last.w)
  }

  /** DetrSinePositionEmbedding (normalize=true, scale=2π, T=10000) →
    * [H·W, d_model] row-major, y-half then x-half, interleaved sin/cos.
    */
  def sinePositions(h: Int, wd: Int): Array[Float] = {
    val d = cfg.dModel; val half = d / 2
    val scale = 2.0 * math.Pi
    val dimT = Array.tabulate(half)(i => math.pow(10000.0, 2.0 * (i / 2) / half))
    val pos = new Array[Float](h * wd * d)
    var y = 0
    while (y < h) {
      val yEmb = (y + 1).toDouble / (h + 1e-6) * scale
      var x = 0
      while (x < wd) {
        val xEmb = (x + 1).toDouble / (wd + 1e-6) * scale
        val off = (y * wd + x) * d
        var m = 0
        while (m < half / 2) {
          pos(off + 2 * m) = math.sin(yEmb / dimT(2 * m)).toFloat
          pos(off + 2 * m + 1) = math.cos(yEmb / dimT(2 * m + 1)).toFloat
          pos(off + half + 2 * m) = math.sin(xEmb / dimT(2 * m)).toFloat
          pos(off + half + 2 * m + 1) = math.cos(xEmb / dimT(2 * m + 1)).toFloat
          m += 1
        }
        x += 1
      }
      y += 1
    }
    pos
  }

  /** HF DetrAttention: Q from (qIn + qPos), K from (kIn + kPos), V from
    * kIn; q scaled by headDim^-0.5 after projection.
    */
  private def attention(stem: String, qIn: Array[Float], qPos: Array[Float],
      kIn: Array[Float], kPos: Array[Float], lq: Int, lk: Int): Array[Float] = {
    val d = cfg.dModel; val heads = cfg.numHeads; val dh = cfg.headDim
    val scaling = 1.0 / math.sqrt(dh.toDouble)
    def withPos(xArr: Array[Float], p: Array[Float]): Array[Float] =
      if (p == null) xArr
      else { val y = java.util.Arrays.copyOf(xArr, xArr.length); Tensors.addInPlace(y, p); y }
    val q = Tensors.linear(withPos(qIn, qPos), lq, d, w(stem + "q_proj.weight"), w(stem + "q_proj.bias"))
    val k = Tensors.linear(withPos(kIn, kPos), lk, d, w(stem + "k_proj.weight"), w(stem + "k_proj.bias"))
    val v = Tensors.linear(kIn, lk, d, w(stem + "v_proj.weight"), w(stem + "v_proj.bias"))
    val ctx = new Array[Float](lq * d)
    val scores = new Array[Float](lk)
    var hd = 0
    while (hd < heads) {
      val off = hd * dh
      var i = 0
      while (i < lq) {
        var j = 0
        while (j < lk) {
          var acc = 0.0
          var dd = 0
          while (dd < dh) { acc += q(i * d + off + dd).toDouble * k(j * d + off + dd); dd += 1 }
          scores(j) = (acc * scaling).toFloat
          j += 1
        }
        Tensors.softmaxRows(scores, 1, lk)
        var dd = 0
        while (dd < dh) {
          var acc = 0.0
          var jj = 0
          while (jj < lk) { acc += scores(jj).toDouble * v(jj * d + off + dd); jj += 1 }
          ctx(i * d + off + dd) = acc.toFloat
          dd += 1
        }
        i += 1
      }
      hd += 1
    }
    Tensors.linear(ctx, lq, d, w(stem + "out_proj.weight"), w(stem + "out_proj.bias"))
  }

  private def lnInPlace(x: Array[Float], m: Int, stem: String): Unit =
    Tensors.layerNorm(x, m, cfg.dModel, w(stem + ".weight"), w(stem + ".bias"), cfg.layerNormEps)

  private def ffn(x: Array[Float], m: Int, p: String): Array[Float] = {
    val inter = Tensors.linear(x, m, cfg.dModel, w(p + "fc1.weight"), w(p + "fc1.bias"))
    Tensors.reluInPlace(inter) // DETR activation_function = relu
    Tensors.linear(inter, m, w(p + "fc1.weight").rows, w(p + "fc2.weight"), w(p + "fc2.bias"))
  }

  /** Transformer forward over the backbone's last stage: returns
    * (projected feature map CHW [d·fh·fw], encoder memory [fh·fw, d]
    * tokens, decoder hidden after final layernorm [nq, d], fh, fw).
    */
  private def transformerForward(stages: Seq[StageOut])
      : (Array[Float], Array[Float], Array[Float], Int, Int) = {
    val d = cfg.dModel
    val last = stages.last
    val (fh, fw) = (last.h, last.w)
    // 1×1 input projection, CHW → [HW, d] tokens
    val (proj, _, _) = Tensors.conv2d(last.data, last.c, fh, fw,
      w("model.input_projection.weight"), w("model.input_projection.bias"), 1, 0)
    val lk = fh * fw
    var src = new Array[Float](lk * d)
    var t = 0
    while (t < lk) {
      var c = 0
      while (c < d) { src(t * d + c) = proj(c * lk + t); c += 1 }
      t += 1
    }
    val pos = sinePositions(fh, fw)
    // encoder (post-LN)
    var li = 0
    while (li < cfg.encoderLayers) {
      val p = s"model.encoder.layers.$li."
      val att = attention(p + "self_attn.", src, pos, src, pos, lk, lk)
      Tensors.addInPlace(att, src); src = att
      lnInPlace(src, lk, p + "self_attn_layer_norm")
      val f = ffn(src, lk, p)
      Tensors.addInPlace(f, src); src = f
      lnInPlace(src, lk, p + "final_layer_norm")
      li += 1
    }
    // decoder over learned queries (hidden starts at zero)
    val nq = cfg.numQueries
    val qPos = w("model.query_position_embeddings.weight")
    require(qPos.rows == nq && qPos.cols == d, "query_position_embeddings shape")
    var hid = new Array[Float](nq * d)
    li = 0
    while (li < cfg.decoderLayers) {
      val p = s"model.decoder.layers.$li."
      val att = attention(p + "self_attn.", hid, qPos.data, hid, qPos.data, nq, nq)
      Tensors.addInPlace(att, hid); hid = att
      lnInPlace(hid, nq, p + "self_attn_layer_norm")
      val cross = attention(p + "encoder_attn.", hid, qPos.data, src, pos, nq, lk)
      Tensors.addInPlace(cross, hid); hid = cross
      lnInPlace(hid, nq, p + "encoder_attn_layer_norm")
      val f = ffn(hid, nq, p)
      Tensors.addInPlace(f, hid); hid = f
      lnInPlace(hid, nq, p + "final_layer_norm")
      li += 1
    }
    lnInPlace(hid, nq, "model.decoder.layernorm")
    (proj, src, hid, fh, fw)
  }

  /** Classification + box heads over the decoder hidden states. */
  private def heads(hid: Array[Float]): (Array[Float], Array[Float]) = {
    val d = cfg.dModel; val nq = cfg.numQueries
    val logits = Tensors.linear(hid, nq, d,
      w("class_labels_classifier.weight"), w("class_labels_classifier.bias"))
    // 3-layer ReLU MLP box head + sigmoid
    var bx = hid
    var inDim = d
    var i = 0
    while (i < 3) {
      bx = Tensors.linear(bx, nq, inDim,
        w(s"bbox_predictor.layers.$i.weight"), w(s"bbox_predictor.layers.$i.bias"))
      inDim = w(s"bbox_predictor.layers.$i.weight").rows
      if (i < 2) Tensors.reluInPlace(bx)
      i += 1
    }
    Tensors.sigmoidInPlace(bx)
    (logits, bx)
  }

  /** Full forward → (class logits [numQueries·(numLabels+1)], boxes
    * [numQueries·4] as sigmoid (cx, cy, w, h) in [0,1]).
    */
  def detect(pix: Array[Float], h0: Int, w0: Int): (Array[Float], Array[Float]) = {
    val (_, _, hid, _, _) = transformerForward(backboneStages(pix, h0, w0))
    heads(hid)
  }

  // ---- panoptic segmentation head (HF DetrForSegmentation) ------------

  /** DetrMHAttentionMap: per-query multi-head 2-D attention over the
    * encoder memory — q_linear on decoder hidden, k_linear as a 1×1 conv
    * on the memory map, scores scaled by (d/heads)^-0.5, softmax JOINTLY
    * over heads × H × W (the flatten(2) in the HF/original-DETR code).
    * Returns [nq][heads·fh·fw].
    */
  def bboxAttention(hid: Array[Float], memory: Array[Float], fh: Int,
      fw: Int): Array[Array[Float]] = {
    val d = cfg.dModel; val nq = cfg.numQueries
    val heads = cfg.numHeads; val dh = cfg.headDim
    val lk = fh * fw
    val normalize = 1.0 / math.sqrt(dh.toDouble)
    val q = Tensors.linear(hid, nq, d,
      w("bbox_attention.q_linear.weight"), w("bbox_attention.q_linear.bias"))
    // 1×1 conv with a Linear weight ≡ plain linear on the token axis
    val k = Tensors.linear(memory, lk, d,
      w("bbox_attention.k_linear.weight"), w("bbox_attention.k_linear.bias"))
    Array.tabulate(nq) { qi =>
      val m = new Array[Float](heads * lk)
      var hd = 0
      while (hd < heads) {
        val off = hd * dh
        var t = 0
        while (t < lk) {
          var acc = 0.0
          var c = 0
          while (c < dh) { acc += q(qi * d + off + c).toDouble * normalize * k(t * d + off + c); c += 1 }
          m(hd * lk + t) = acc.toFloat
          t += 1
        }
        hd += 1
      }
      Tensors.softmaxRows(m, 1, heads * lk)
      m
    }
  }

  /** DetrMaskHeadSmallConv: FPN-style conv head. Input per query is the
    * projected feature map concatenated with that query's attention maps
    * ([d+heads, fh, fw]); three upsample-add lateral rounds against
    * backbone stages 2, 1, 0 (the HF hard-coded indices); GroupNorm(8 or
    * channel count)+ReLU between 3×3 convs; 1-channel logit output at
    * stage-0 resolution. Returns ([nq · mh · mw] mask logits, mh, mw).
    */
  def maskHead(proj: Array[Float], fh: Int, fw: Int,
      bboxMask: Array[Array[Float]], stages: Seq[StageOut])
      : (Array[Float], Int, Int) = {
    require(stages.length >= 3, "mask head needs >= 3 backbone stages")
    val d = cfg.dModel; val nq = cfg.numQueries; val heads = cfg.numHeads
    val dim = d + heads
    def gnRelu(x: Array[Float], c: Int, hw: Int, name: String): Unit = {
      Tensors.groupNorm(x, c, hw, math.min(8, c), w(s"mask_head.$name.weight"),
        w(s"mask_head.$name.bias"), 1e-5)
      Tensors.reluInPlace(x)
    }
    def conv3(x: Array[Float], cin: Int, h: Int, wd: Int, name: String): Array[Float] =
      Tensors.conv2d(x, cin, h, wd, w(s"mask_head.$name.weight"),
        w(s"mask_head.$name.bias"), 1, 1)._1
    // lateral adapters are query-independent — compute once
    val fpns = Seq(stages(2), stages(1), stages(0))
    val adapted = fpns.zipWithIndex.map { case (st, i) =>
      val wt = w(s"mask_head.adapter${i + 1}.weight")
      (Tensors.conv2d(st.data, st.c, st.h, st.w, wt,
        w(s"mask_head.adapter${i + 1}.bias"), 1, 0)._1, wt.shape(0), st.h, st.w)
    }
    val outH = stages(0).h; val outW = stages(0).w
    val out = new Array[Float](nq * outH * outW)
    var qi = 0
    while (qi < nq) {
      var x = new Array[Float](dim * fh * fw)
      System.arraycopy(proj, 0, x, 0, d * fh * fw)
      System.arraycopy(bboxMask(qi), 0, x, d * fh * fw, heads * fh * fw)
      var (c, h, wd) = (dim, fh, fw)
      x = conv3(x, c, h, wd, "lay1"); gnRelu(x, dim, h * wd, "gn1")
      x = conv3(x, dim, h, wd, "lay2")
      var cOut = w("mask_head.lay2.weight").shape(0)
      gnRelu(x, cOut, h * wd, "gn2"); c = cOut
      var i = 0
      while (i < 3) {
        val (lat, latC, latH, latW) = adapted(i)
        require(latC == c, s"mask head adapter${i + 1} channel mismatch")
        val up = Tensors.resizeNearest(x, c, h, wd, latH, latW)
        Tensors.addInPlace(up, lat)
        h = latH; wd = latW
        x = conv3(up, c, h, wd, s"lay${i + 3}")
        cOut = w(s"mask_head.lay${i + 3}.weight").shape(0)
        gnRelu(x, cOut, h * wd, s"gn${i + 3}"); c = cOut
        i += 1
      }
      val logit = Tensors.conv2d(x, c, h, wd, w("mask_head.out_lay.weight"),
        w("mask_head.out_lay.bias"), 1, 1)._1
      System.arraycopy(logit, 0, out, qi * outH * outW, outH * outW)
      qi += 1
    }
    (out, outH, outW)
  }

  /** Full segmentation forward → (class logits, boxes, mask logits
    * [nq · mh · mw], mh, mw). Requires a checkpoint with the
    * bbox_attention + mask_head tensors (DetrForSegmentation layout).
    */
  def segment(pix: Array[Float], h0: Int, w0: Int)
      : (Array[Float], Array[Float], Array[Float], Int, Int) = {
    val stages = backboneStages(pix, h0, w0)
    val (proj, memory, hid, fh, fw) = transformerForward(stages)
    val (logits, boxes) = heads(hid)
    val att = bboxAttention(hid, memory, fh, fw)
    val (masks, mh, mw) = maskHead(proj, fh, fw, att, stages)
    (logits, boxes, masks, mh, mw)
  }

  /** HF post_process_panoptic_segmentation semantics
    * (DetrImageProcessor → compute_segments, shared with the universal
    * segmentation post-processors):
    *  1. per-query softmax over ALL nc classes (INCLUDING no-object) and
    *     max → (score, label); keep = label ≠ no-object ∧ score > threshold
    *     (note: unlike detection post-process, the max runs over the
    *     no-object column too);
    *  2. kept mask logits → sigmoid → bilinear resize
    *     (align_corners=false) to the target size → weighted by score;
    *  3. per-pixel argmax across kept queries → candidate segments;
    *  4. a segment survives if its claimed area > 0 and
    *     claimed/original > overlapThreshold, where original =
    *     #(weighted probs ≥ maskThreshold);
    *  5. surviving segments get sequential ids (from 1) painted into the
    *     segmentation map; classes in `labelIdsToFuse` reuse the id of a
    *     previous segment of the same class ("stuff" fusion; the HF
    *     current_segment_id reassignment on fusion is mirrored
    *     bug-for-bug);
    *  6. no kept queries → a −1-filled map and empty segments.
    */
  def postProcessPanoptic(logits: Array[Float], maskLogits: Array[Float],
      mh: Int, mw: Int, targetH: Int, targetW: Int, threshold: Float = 0.5f,
      maskThreshold: Float = 0.5f, overlapThreshold: Float = 0.8f,
      labelIdsToFuse: Set[Int] = Set.empty): PanopticResult = {
    val nc = cfg.numLabels + 1
    // 1. keep set
    val kept = Seq.newBuilder[(Int, Float, Int)] // (query, score, label)
    var q = 0
    while (q < cfg.numQueries) {
      val probs = java.util.Arrays.copyOfRange(logits, q * nc, (q + 1) * nc)
      Tensors.softmaxRows(probs, 1, nc)
      var best = 0
      var c = 1
      while (c < nc) { if (probs(c) > probs(best)) best = c; c += 1 }
      if (best != nc - 1 && probs(best) > threshold) kept += ((q, probs(best), best))
      q += 1
    }
    val ks = kept.result()
    val seg = Array.fill(targetH, targetW)(-1)
    if (ks.isEmpty) return PanopticResult(seg, Seq.empty)
    // 2. sigmoid → resize → score-weight
    val weighted = ks.map { case (qi, score, _) =>
      val m = java.util.Arrays.copyOfRange(maskLogits, qi * mh * mw, (qi + 1) * mh * mw)
      Tensors.sigmoidInPlace(m)
      val r = Tensors.resizeBilinear(m, mh, mw, targetH, targetW)
      var i = 0
      while (i < r.length) { r(i) *= score; i += 1 }
      r
    }
    // 3. per-pixel argmax across kept queries
    val n = targetH * targetW
    val argmax = new Array[Int](n)
    var i = 0
    while (i < n) {
      var bk = 0
      var k = 1
      while (k < weighted.length) { if (weighted(k)(i) > weighted(bk)(i)) bk = k; k += 1 }
      argmax(i) = bk
      i += 1
    }
    // 4-5. validity + fusion, in query order
    val segments = Seq.newBuilder[PanopticSegment]
    val stuffMemory = scala.collection.mutable.Map.empty[Int, Int]
    var currentId = 0
    var k = 0
    while (k < ks.length) {
      val (_, score, label) = ks(k)
      val shouldFuse = labelIdsToFuse.contains(label)
      var claimed = 0
      var original = 0
      i = 0
      while (i < n) {
        if (argmax(i) == k) claimed += 1
        if (weighted(k)(i) >= maskThreshold) original += 1
        i += 1
      }
      if (claimed > 0 && original > 0 &&
          claimed.toDouble / original > overlapThreshold) {
        currentId = stuffMemory.getOrElse(label, currentId + 1)
        i = 0
        while (i < n) {
          if (argmax(i) == k) seg(i / targetW)(i % targetW) = currentId
          i += 1
        }
        segments += PanopticSegment(currentId, label,
          cfg.id2label.getOrElse(label, s"LABEL_$label"),
          math.rint(score * 1e6).toFloat / 1e6f, shouldFuse)
        if (shouldFuse) stuffMemory(label) = currentId
      }
      k += 1
    }
    PanopticResult(seg, segments.result())
  }

  /** HF post_process_object_detection: per-query softmax over classes,
    * drop the trailing no-object class, argmax → (score, label),
    * threshold, (cx, cy, w, h) → corner box scaled to the target size.
    */
  def postProcess(logits: Array[Float], boxes: Array[Float], threshold: Float,
      targetW: Int, targetH: Int): Seq[Detection] = {
    val nc = cfg.numLabels + 1
    val out = Seq.newBuilder[Detection]
    var q = 0
    while (q < cfg.numQueries) {
      val probs = java.util.Arrays.copyOfRange(logits, q * nc, (q + 1) * nc)
      Tensors.softmaxRows(probs, 1, nc)
      var best = 0
      var c = 1
      while (c < nc - 1) { if (probs(c) > probs(best)) best = c; c += 1 }
      if (probs(best) > threshold) {
        val cx = boxes(q * 4); val cy = boxes(q * 4 + 1)
        val bw = boxes(q * 4 + 2); val bh = boxes(q * 4 + 3)
        out += Detection(probs(best), best,
          cfg.id2label.getOrElse(best, s"LABEL_$best"),
          Array((cx - bw / 2) * targetW, (cy - bh / 2) * targetH,
            (cx + bw / 2) * targetW, (cy + bh / 2) * targetH))
      }
      q += 1
    }
    out.result()
  }

  /** DetrImageProcessor default preprocessing: bilinear resize so the
    * shortest edge is `shortestEdge` (longest capped at `maxSize`,
    * aspect preserved), scale to [0,1], ImageNet mean/std → CHW.
    * Returns (pixels, height, width).
    */
  def preprocess(img: BufferedImage, shortestEdge: Int = 800,
      maxSize: Int = 1333): (Array[Float], Int, Int) = {
    val sw = img.getWidth; val sh = img.getHeight
    var scale = shortestEdge.toDouble / math.min(sw, sh)
    if (scale * math.max(sw, sh) > maxSize) scale = maxSize.toDouble / math.max(sw, sh)
    val ow = math.max(1, math.round(sw * scale).toInt)
    val oh = math.max(1, math.round(sh * scale).toInt)
    val mean = Array(0.485, 0.456, 0.406)
    val std = Array(0.229, 0.224, 0.225)
    val out = new Array[Float](3 * oh * ow)
    var y = 0
    while (y < oh) {
      val fy = (y + 0.5) * sh / oh - 0.5
      val y0 = math.max(0, math.min(sh - 1, math.floor(fy).toInt))
      val y1 = math.min(sh - 1, y0 + 1)
      val wy = fy - y0
      var xx = 0
      while (xx < ow) {
        val fx = (xx + 0.5) * sw / ow - 0.5
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
          out(c * oh * ow + y * ow + xx) = ((v / 255.0 - mean(c)) / std(c)).toFloat
          c += 1
        }
        xx += 1
      }
      y += 1
    }
    (out, oh, ow)
  }
}
