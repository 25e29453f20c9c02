package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import java.awt.image.BufferedImage

/** ViT image classification (Dosovitskiy et al. 2020) — the reference's
  * `vit_for_image_classification`
  * (`/root/reference/pixeltable/functions/huggingface.py:899`, HF
  * ViTForImageClassification in-process). HF ViT weight naming
  * (`vit.embeddings.*`, `vit.encoder.layer.N.attention.attention.*`,
  * `layernorm_before/after`), pre-LN blocks with exact GELU, biased patch
  * conv, learned CLS + position embeddings, classifier over the
  * final-layernormed CLS state. Preprocessing: bilinear resize +
  * mean/std 0.5 (the ViT default, unlike CLIP's constants).
  */
final case class VitConfig(
    hiddenSize: Int, numLayers: Int, numHeads: Int, intermediateSize: Int,
    imageSize: Int, patchSize: Int, layerNormEps: Double = 1e-12,
    id2label: Map[Int, String] = Map.empty,
) extends Serializable {
  require(hiddenSize % numHeads == 0 && imageSize % patchSize == 0)
  def headDim: Int = hiddenSize / numHeads
}

object VitConfig {
  def fromJson(json: String): VitConfig = {
    val n = new ObjectMapper().readTree(json)
    def i(name: String): Int = {
      require(n.has(name), s"vit config missing $name"); n.get(name).asInt()
    }
    VitConfig(
      hiddenSize = i("hidden_size"), numLayers = i("num_hidden_layers"),
      numHeads = i("num_attention_heads"), intermediateSize = i("intermediate_size"),
      imageSize = i("image_size"), patchSize = i("patch_size"),
      layerNormEps = if (n.has("layer_norm_eps")) n.get("layer_norm_eps").asDouble() else 1e-12,
      id2label =
        if (!n.has("id2label")) Map.empty
        else scala.jdk.CollectionConverters.IteratorHasAsScala(
          n.get("id2label").properties().iterator())
          .asScala.map(e => e.getKey.toInt -> e.getValue.asText()).toMap,
    )
  }
}

final class VitModel(val cfg: VitConfig, weights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"vit checkpoint missing tensor $name"))

  /** pix: CHW float array (3·S·S, already resized+normalized) → class
    * logits (classifier over the final-layernormed CLS state).
    */
  def classifyLogits(pix: Array[Float]): Array[Float] = {
    val states = encodeStates(pix)
    val clsOut = java.util.Arrays.copyOfRange(states, 0, cfg.hiddenSize)
    Tensors.linear(clsOut, 1, cfg.hiddenSize, w("classifier.weight"), w("classifier.bias"))
  }

  /** Full encoder: final-layernormed hidden states of ALL positions
    * ([1+numPatches] · hidden) — the `last_hidden_state` a
    * VisionEncoderDecoder captioner cross-attends over.
    */
  def encodeStates(pix: Array[Float]): Array[Float] = {
    val s = cfg.imageSize; val p = cfg.patchSize; val grid = s / p
    val h = cfg.hiddenSize
    val l = 1 + grid * grid
    require(pix.length == 3 * s * s, s"expected ${3 * s * s} pixels, got ${pix.length}")
    val patchW = w("vit.embeddings.patch_embeddings.projection.weight") // [H,3,P,P]
    val patchB = w("vit.embeddings.patch_embeddings.projection.bias")
    val cls = w("vit.embeddings.cls_token")          // [1,1,H]
    val pos = w("vit.embeddings.position_embeddings") // [1,L,H]
    require(pos.data.length == l * h, s"position embeddings ${pos.data.length} != ${l * h}")
    val x = new Array[Float](l * h)
    var k = 0
    while (k < h) { x(k) = cls.data(k) + pos.data(k); k += 1 }
    var gy = 0
    while (gy < grid) {
      var gx = 0
      while (gx < grid) {
        val t = 1 + gy * grid + gx
        val off = t * h
        var o = 0
        while (o < h) {
          var acc: Double = patchB.data(o)
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
          x(off + o) = (acc + pos.data(t * h + o)).toFloat
          o += 1
        }
        gx += 1
      }
      gy += 1
    }
    // pre-LN encoder: x += attn(ln_before(x)); x += mlp(ln_after(x))
    val heads = cfg.numHeads; val dh = cfg.headDim
    val scale = 1.0 / math.sqrt(dh.toDouble)
    val scores = new Array[Float](l * l)
    var layer = 0
    while (layer < cfg.numLayers) {
      val p0 = s"vit.encoder.layer.$layer."
      val n1 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(n1, l, h, w(p0 + "layernorm_before.weight"),
        w(p0 + "layernorm_before.bias"), cfg.layerNormEps)
      val a = p0 + "attention.attention."
      val q = Tensors.linear(n1, l, h, w(a + "query.weight"), w(a + "query.bias"))
      val kk = Tensors.linear(n1, l, h, w(a + "key.weight"), w(a + "key.bias"))
      val v = Tensors.linear(n1, l, h, w(a + "value.weight"), w(a + "value.bias"))
      val ctx = new Array[Float](l * h)
      var hd = 0
      while (hd < heads) {
        val hOff = hd * dh
        var i = 0
        while (i < l) {
          var j = 0
          while (j < l) {
            var acc = 0.0
            var d = 0
            while (d < dh) { acc += q(i * h + hOff + d).toDouble * kk(j * h + hOff + d); d += 1 }
            scores(i * l + j) = (acc * scale).toFloat
            j += 1
          }
          i += 1
        }
        Tensors.softmaxRows(scores, l, l)
        var i2 = 0
        while (i2 < l) {
          var d = 0
          while (d < dh) {
            var acc = 0.0
            var j = 0
            while (j < l) { acc += scores(i2 * l + j).toDouble * v(j * h + hOff + d); j += 1 }
            ctx(i2 * h + hOff + d) = acc.toFloat
            d += 1
          }
          i2 += 1
        }
        hd += 1
      }
      Tensors.addInPlace(x, Tensors.linear(ctx, l, h,
        w(p0 + "attention.output.dense.weight"), w(p0 + "attention.output.dense.bias")))
      val n2 = java.util.Arrays.copyOf(x, x.length)
      Tensors.layerNorm(n2, l, h, w(p0 + "layernorm_after.weight"),
        w(p0 + "layernorm_after.bias"), cfg.layerNormEps)
      val inter = Tensors.linear(n2, l, h,
        w(p0 + "intermediate.dense.weight"), w(p0 + "intermediate.dense.bias"))
      Tensors.gelu(inter)
      Tensors.addInPlace(x, Tensors.linear(inter, l, cfg.intermediateSize,
        w(p0 + "output.dense.weight"), w(p0 + "output.dense.bias")))
      layer += 1
    }
    Tensors.layerNorm(x, l, h, w("vit.layernorm.weight"),
      w("vit.layernorm.bias"), cfg.layerNormEps)
    x
  }

  def seqLen: Int = 1 + (cfg.imageSize / cfg.patchSize) * (cfg.imageSize / cfg.patchSize)

  /** ViT default preprocessing: bilinear resize, scale to [0,1],
    * normalize mean 0.5 / std 0.5 per channel → CHW.
    */
  def preprocess(img: BufferedImage): Array[Float] = {
    val s = cfg.imageSize
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
          out(c * s * s + y * s + xx) = ((v / 255.0 - 0.5) / 0.5).toFloat
          c += 1
        }
        xx += 1
      }
      y += 1
    }
    out
  }
}
