package graft.ml

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.awt.image.BufferedImage

/** CLIP dual-tower (Radford et al. 2021) — the reference's joint
  * image/text embedding (`/root/reference/pixeltable/functions/
  * huggingface.py:127-205`, both the `clip(text)` and `clip(image)`
  * overloads). Pre-LayerNorm transformer towers in HF CLIP weight naming
  * (`text_model.*` / `vision_model.*` + the two projection matrices), so
  * real `model.safetensors` checkpoints load directly:
  *
  *  - text: byte-level BPE ids → token+position embeddings → causal
  *    pre-LN stack → final LN → hidden at the EOS position →
  *    `text_projection` → L2 normalize;
  *  - vision: bilinear resize to `image_size`, CLIP mean/std normalize,
  *    P×P patch conv (no bias) → [CLS]+patches+position embeddings →
  *    pre-LN stack → `post_layernorm` on CLS → `visual_projection` →
  *    L2 normalize.
  *
  * With the causal mask and end-padding, a text's embedding is
  * bit-identical alone or batched (padded keys are never attended by real
  * queries); ClipSpec pins this plus a naive-reimplementation cross-check.
  */
final case class ClipTowerConfig(
    hiddenSize: Int, numLayers: Int, numHeads: Int, intermediateSize: Int,
    maxPositions: Int, layerNormEps: Double, quickGelu: Boolean,
    vocabSize: Int = 0, eosTokenId: Int = 0, // text tower
    imageSize: Int = 0, patchSize: Int = 0,  // vision tower
) extends Serializable {
  require(hiddenSize % numHeads == 0)
  def headDim: Int = hiddenSize / numHeads
}

final case class ClipConfig(text: ClipTowerConfig, vision: ClipTowerConfig,
    projectionDim: Int) extends Serializable

object ClipConfig {
  private def tower(n: JsonNode, vision: Boolean): ClipTowerConfig = {
    def i(name: String, dflt: Int = Int.MinValue): Int =
      if (n.has(name)) n.get(name).asInt()
      else { require(dflt != Int.MinValue, s"clip config missing $name"); dflt }
    ClipTowerConfig(
      hiddenSize = i("hidden_size"),
      numLayers = i("num_hidden_layers"),
      numHeads = i("num_attention_heads"),
      intermediateSize = i("intermediate_size"),
      maxPositions = if (vision) 0 else i("max_position_embeddings"),
      layerNormEps = if (n.has("layer_norm_eps")) n.get("layer_norm_eps").asDouble() else 1e-5,
      quickGelu = !n.has("hidden_act") || n.get("hidden_act").asText() == "quick_gelu",
      vocabSize = if (vision) 0 else i("vocab_size"),
      eosTokenId = if (vision) 0 else i("eos_token_id", 2),
      imageSize = if (vision) i("image_size") else 0,
      patchSize = if (vision) i("patch_size") else 0,
    )
  }

  def fromJson(json: String): ClipConfig = {
    val n = new ObjectMapper().readTree(json)
    ClipConfig(
      text = tower(n.get("text_config"), vision = false),
      vision = tower(n.get("vision_config"), vision = true),
      projectionDim = n.get("projection_dim").asInt(),
    )
  }
}

final class ClipModel(val cfg: ClipConfig, rawWeights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = rawWeights.getOrElse(name,
    // HF ships "pre_layrnorm" (sic); accept the corrected spelling too
    rawWeights.getOrElse(name.replace("pre_layrnorm", "pre_layernorm"),
      throw new IllegalArgumentException(s"clip checkpoint missing tensor $name")))

  /** Shared pre-LN stack: x += attn(ln1(x)); x += mlp(ln2(x)). */
  private def encoderStack(x: Array[Float], b: Int, l: Int, tower: ClipTowerConfig,
      prefix: String, causal: Boolean, mask: Array[Int]): Unit = {
    val h = tower.hiddenSize
    val m = b * l
    val heads = tower.numHeads
    val dh = tower.headDim
    val scale = 1.0 / math.sqrt(dh.toDouble)
    val scores = new Array[Float](l * l)
    var layer = 0
    while (layer < tower.numLayers) {
      val p = s"${prefix}encoder.layers.$layer."
      // --- attention sublayer (pre-LN) ---
      val normed = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(normed, m, h, w(p + "layer_norm1.weight"),
        w(p + "layer_norm1.bias"), tower.layerNormEps)
      val q = Tensors.linear(normed, m, h, w(p + "self_attn.q_proj.weight"), w(p + "self_attn.q_proj.bias"))
      val k = Tensors.linear(normed, m, h, w(p + "self_attn.k_proj.weight"), w(p + "self_attn.k_proj.bias"))
      val v = Tensors.linear(normed, m, h, w(p + "self_attn.v_proj.weight"), w(p + "self_attn.v_proj.bias"))
      val ctx = new Array[Float](m * h)
      var bi = 0
      while (bi < b) {
        val rowOff = bi * l
        var hd = 0
        while (hd < heads) {
          val hOff = hd * dh
          var i = 0
          while (i < l) {
            var j = 0
            while (j < l) {
              if ((causal && j > i) || mask(rowOff + j) == 0) scores(i * l + j) = -1e9f
              else {
                var acc = 0.0
                val qOff = (rowOff + i) * h + hOff
                val kOff = (rowOff + j) * h + hOff
                var d = 0
                while (d < dh) { acc += q(qOff + d).toDouble * k(kOff + d); d += 1 }
                scores(i * l + j) = (acc * scale).toFloat
              }
              j += 1
            }
            i += 1
          }
          Tensors.softmaxRows(scores, l, l)
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
      Tensors.addInPlace(x, Tensors.linear(ctx, m, h,
        w(p + "self_attn.out_proj.weight"), w(p + "self_attn.out_proj.bias")))
      // --- MLP sublayer (pre-LN) ---
      val normed2 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(normed2, m, h, w(p + "layer_norm2.weight"),
        w(p + "layer_norm2.bias"), tower.layerNormEps)
      val inter = Tensors.linear(normed2, m, h, w(p + "mlp.fc1.weight"), w(p + "mlp.fc1.bias"))
      if (tower.quickGelu) Tensors.quickGelu(inter) else Tensors.gelu(inter)
      Tensors.addInPlace(x, Tensors.linear(inter, m, tower.intermediateSize,
        w(p + "mlp.fc2.weight"), w(p + "mlp.fc2.bias")))
      layer += 1
    }
  }

  private def project(vec: Array[Float], proj: Tensor): Array[Float] = {
    val h = vec.length
    val out = new Array[Float](proj.rows)
    var o = 0
    while (o < proj.rows) {
      var acc = 0.0
      var kk = 0
      while (kk < h) { acc += vec(kk).toDouble * proj.data(o * h + kk); kk += 1 }
      out(o) = acc.toFloat
      o += 1
    }
    Tensors.l2NormalizeInPlace(out)
    out
  }

  /** ids must already carry `<|startoftext|> … <|endoftext|>`. */
  def textEmbed(idsBatch: Seq[Array[Int]]): Array[Array[Float]] = {
    val tower = cfg.text
    val b = idsBatch.length
    val l = idsBatch.map(_.length).max
    require(l <= tower.maxPositions, s"text length $l > ${tower.maxPositions}")
    val h = tower.hiddenSize
    val x = new Array[Float](b * l * h)
    val mask = new Array[Int](b * l)
    val tok = w("text_model.embeddings.token_embedding.weight")
    val pos = w("text_model.embeddings.position_embedding.weight")
    var bi = 0
    while (bi < b) {
      val ids = idsBatch(bi)
      var t = 0
      while (t < ids.length) {
        val off = (bi * l + t) * h
        var kk = 0
        while (kk < h) { x(off + kk) = tok.data(ids(t) * h + kk) + pos.data(t * h + kk); kk += 1 }
        mask(bi * l + t) = 1
        t += 1
      }
      bi += 1
    }
    encoderStack(x, b, l, tower, "text_model.", causal = true, mask)
    Tensors.layerNorm(x, b * l, h, w("text_model.final_layer_norm.weight"),
      w("text_model.final_layer_norm.bias"), tower.layerNormEps)
    val proj = w("text_projection.weight")
    idsBatch.zipWithIndex.map { case (ids, i) =>
      val eosPos = ids.indexOf(tower.eosTokenId) match {
        case -1 => ids.length - 1
        case p => p
      }
      val off = (i * l + eosPos) * h
      project(java.util.Arrays.copyOfRange(x, off, off + h), proj)
    }.toArray
  }

  /** pix: CHW float array of length 3·S·S, already resized+normalized. */
  def imageEmbed(pixBatch: Seq[Array[Float]]): Array[Array[Float]] = {
    val tower = cfg.vision
    val s = tower.imageSize
    val p = tower.patchSize
    require(s % p == 0, s"image size $s not divisible by patch $p")
    val grid = s / p
    val nPatch = grid * grid
    val l = nPatch + 1
    val h = tower.hiddenSize
    val b = pixBatch.length
    val patchW = w("vision_model.embeddings.patch_embedding.weight") // [H, 3, P, P]
    require(patchW.data.length == h * 3 * p * p, "patch embedding shape mismatch")
    val clsEmb = w("vision_model.embeddings.class_embedding")
    val posEmb = w("vision_model.embeddings.position_embedding.weight")
    val x = new Array[Float](b * l * h)
    val mask = Array.fill(b * l)(1)
    var bi = 0
    while (bi < b) {
      val pix = pixBatch(bi)
      require(pix.length == 3 * s * s, s"expected ${3 * s * s} pixels, got ${pix.length}")
      // CLS at position 0
      var kk = 0
      while (kk < h) { x((bi * l) * h + kk) = clsEmb.data(kk) + posEmb.data(kk); kk += 1 }
      // patches row-major: position 1 + gy*grid + gx
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val t = 1 + gy * grid + gx
          val off = (bi * l + t) * h
          var o = 0
          while (o < h) {
            var acc = 0.0
            var c = 0
            while (c < 3) {
              var py = 0
              while (py < p) {
                var px = 0
                while (px < p) {
                  acc += patchW.data(((o * 3 + c) * p + py) * p + px).toDouble *
                    pix(c * s * s + (gy * p + py) * s + (gx * p + px))
                  px += 1
                }
                py += 1
              }
              c += 1
            }
            x(off + o) = (acc + posEmb.data(t * h + o)).toFloat
            o += 1
          }
          gx += 1
        }
        gy += 1
      }
      bi += 1
    }
    Tensors.layerNorm(x, b * l, h, w("vision_model.pre_layrnorm.weight"),
      w("vision_model.pre_layrnorm.bias"), tower.layerNormEps)
    encoderStack(x, b, l, tower, "vision_model.", causal = false, mask)
    val proj = w("visual_projection.weight")
    (0 until b).map { bi =>
      val cls = java.util.Arrays.copyOfRange(x, bi * l * h, bi * l * h + h)
      Tensors.layerNorm(cls, 1, h, w("vision_model.post_layernorm.weight"),
        w("vision_model.post_layernorm.bias"), tower.layerNormEps)
      project(cls, proj)
    }.toArray
  }

  /** Bilinear resize to S×S + CLIP mean/std channel normalize → CHW. */
  def preprocess(img: BufferedImage): Array[Float] = {
    val s = cfg.vision.imageSize
    val out = new Array[Float](3 * s * s)
    val sw = img.getWidth; val sh = img.getHeight
    var y = 0
    while (y < s) {
      val fy = (y + 0.5) * sh / s - 0.5
      val y0 = math.max(0, math.min(sh - 1, math.floor(fy).toInt))
      val y1 = math.min(sh - 1, y0 + 1)
      val wy = fy - y0
      var xx = 0
      while (xx < s) {
        val fx = (xx + 0.5) * sw / s - 0.5
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
          out(c * s * s + y * s + xx) =
            ((v / 255.0 - ClipModel.Mean(c)) / ClipModel.Std(c)).toFloat
          c += 1
        }
        xx += 1
      }
      y += 1
    }
    out
  }
}

object ClipModel {
  /** CLIP's published preprocessing constants. */
  val Mean: Array[Double] = Array(0.48145466, 0.4578275, 0.40821073)
  val Std: Array[Double] = Array(0.26862954, 0.26130258, 0.27577711)
}
