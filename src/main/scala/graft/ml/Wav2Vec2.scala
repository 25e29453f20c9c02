package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper

/** Wav2Vec2 CTC speech recognition (Baevski et al. 2020) — the wav2vec2 /
  * generic-CTC branches of the reference's `automatic_speech_recognition`
  * (`/root/reference/pixeltable/functions/huggingface.py:1932-2085`,
  * `Wav2Vec2ForCTC` / `AutoModelForCTC`; the whisper branch rides the
  * existing `graft.ml.Whisper`).
  *
  * HF base layout (`feat_extract_norm="group"`, `do_stable_layer_norm=
  * false`): raw 16 kHz waveform → stack of bias-free 1-D convs (GroupNorm
  * with groups == channels on layer 0 only, GELU each) → feature
  * projection (LayerNorm + Linear) → grouped weight-normed positional
  * conv (GELU, last element trimmed when the kernel is even) added to the
  * hidden states → post-LN transformer encoder → `lm_head` linear → CTC:
  * per-frame argmax, collapse consecutive repeats, drop the blank
  * (pad id 0), `|` decodes as the word delimiter.
  */
final case class Wav2Vec2Config(
    convDims: Seq[Int], convKernels: Seq[Int], convStrides: Seq[Int],
    hidden: Int, layers: Int, heads: Int, intermediate: Int,
    posConvKernel: Int, posConvGroups: Int, vocabSize: Int,
    padTokenId: Int, layerNormEps: Double = 1e-5,
) extends Serializable {
  require(convDims.nonEmpty && convDims.length == convKernels.length &&
    convDims.length == convStrides.length)
  require(hidden % heads == 0)
}

object Wav2Vec2Config {
  def fromJson(json: String): Wav2Vec2Config = {
    val n = new ObjectMapper().readTree(json)
    import scala.jdk.CollectionConverters._
    def ints(name: String): Seq[Int] =
      n.get(name).elements().asScala.map(_.asInt()).toSeq
    def i(name: String): Int = {
      require(n.has(name), s"wav2vec2 config missing $name"); n.get(name).asInt()
    }
    Wav2Vec2Config(
      convDims = ints("conv_dim"), convKernels = ints("conv_kernel"),
      convStrides = ints("conv_stride"), hidden = i("hidden_size"),
      layers = i("num_hidden_layers"), heads = i("num_attention_heads"),
      intermediate = i("intermediate_size"),
      posConvKernel = i("num_conv_pos_embeddings"),
      posConvGroups = i("num_conv_pos_embedding_groups"),
      vocabSize = i("vocab_size"), padTokenId = i("pad_token_id"))
  }
}

final class Wav2Vec2Model(val cfg: Wav2Vec2Config, weights: Map[String, Tensor])
    extends Serializable {

  private def w(name: String): Tensor = weights.getOrElse(name,
    throw new IllegalArgumentException(s"wav2vec2 checkpoint missing tensor $name"))

  /** Bias-free conv1d, channels-first: in [cin][t] → out [cout][tOut]. */
  private def conv1d(x: Array[Float], cin: Int, t: Int, weight: Tensor,
      stride: Int, pad: Int, groups: Int = 1): (Array[Float], Int) = {
    val cout = weight.shape(0)
    val cinG = weight.shape(1) // cin / groups
    val k = weight.shape(2)
    val tOut = (t + 2 * pad - k) / stride + 1
    val out = new Array[Float](cout * tOut)
    val coutG = cout / groups
    var o = 0
    while (o < cout) {
      val g = o / coutG
      var ti = 0
      while (ti < tOut) {
        var acc = 0.0
        var ci = 0
        while (ci < cinG) {
          val cIn = g * cinG + ci
          var kk = 0
          while (kk < k) {
            val src = ti * stride + kk - pad
            if (src >= 0 && src < t)
              acc += weight.data((o * cinG + ci) * k + kk).toDouble * x(cIn * t + src)
            kk += 1
          }
          ci += 1
        }
        out(o * tOut + ti) = acc.toFloat
        ti += 1
      }
      o += 1
    }
    (out, tOut)
  }

  /** Feature extractor: waveform [-1, 1] floats → frames [t][convDims.last]. */
  private[ml] def extractFeatures(wave: Array[Float]): (Array[Float], Int) = {
    var x = wave
    var c = 1
    var t = wave.length
    cfg.convDims.indices.foreach { li =>
      val (y, tOut) = conv1d(x, c, t,
        w(s"wav2vec2.feature_extractor.conv_layers.$li.conv.weight"),
        cfg.convStrides(li), pad = 0)
      c = cfg.convDims(li)
      t = tOut
      // feat_extract_norm="group": GroupNorm(groups == channels) on the
      // FIRST layer only — per-channel instance norm
      if (li == 0)
        Tensors.groupNorm(y, c, t, c,
          w("wav2vec2.feature_extractor.conv_layers.0.layer_norm.weight"),
          w("wav2vec2.feature_extractor.conv_layers.0.layer_norm.bias"),
          cfg.layerNormEps)
      Tensors.gelu(y)
      x = y
    }
    // channels-first [c][t] → frames-first [t][c]
    val frames = new Array[Float](t * c)
    var ti = 0
    while (ti < t) {
      var ci = 0
      while (ci < c) { frames(ti * c + ci) = x(ci * t + ti); ci += 1 }
      ti += 1
    }
    (frames, t)
  }

  /** Weight-normed positional conv (dim=2: one g per kernel position). */
  private def posConv(hid: Array[Float], t: Int): Array[Float] = {
    val h = cfg.hidden
    val g = w("wav2vec2.encoder.pos_conv_embed.conv.weight_g")
    val v = w("wav2vec2.encoder.pos_conv_embed.conv.weight_v")
    val b = w("wav2vec2.encoder.pos_conv_embed.conv.bias")
    val k = v.shape(2)
    val cinG = v.shape(1)
    // materialize weight = g[k] * v[:,:,k] / ||v[:,:,k]||
    val norm = new Array[Double](k)
    var kk = 0
    while (kk < k) {
      var s = 0.0
      var i = 0
      while (i < v.shape(0) * cinG) { val x = v.data(i * k + kk).toDouble; s += x * x; i += 1 }
      norm(kk) = math.sqrt(s)
      kk += 1
    }
    val weight = Tensor(v.shape.clone(),
      Array.tabulate(v.data.length) { i =>
        val kp = i % k
        (g.data(kp) * v.data(i) / math.max(norm(kp), 1e-12)).toFloat
      })
    // channels-first transpose, grouped conv with pad = k/2, trim last
    // element when the kernel is even (Wav2Vec2SamePadLayer)
    val cf = new Array[Float](h * t)
    var ti = 0
    while (ti < t) {
      var ci = 0
      while (ci < h) { cf(ci * t + ti) = hid(ti * h + ci); ci += 1 }
      ti += 1
    }
    val (y, tOut) = conv1d(cf, h, t, weight, stride = 1, pad = k / 2,
      groups = cfg.posConvGroups)
    val keep = if (k % 2 == 0) tOut - 1 else tOut
    require(keep == t, s"pos conv length mismatch: $keep vs $t")
    val out = new Array[Float](t * h)
    ti = 0
    while (ti < t) {
      var ci = 0
      while (ci < h) {
        out(ti * h + ci) = y(ci * tOut + ti) + b.data(ci)
        ci += 1
      }
      ti += 1
    }
    Tensors.gelu(out)
    out
  }

  private def attend(x: Array[Float], t: Int, stem: String): Array[Float] = {
    val h = cfg.hidden
    val dh = h / cfg.heads
    val scale = 1.0 / math.sqrt(dh.toDouble)
    def pr(n: String) = Tensors.linear(x, t, h, w(s"$stem.$n.weight"), w(s"$stem.$n.bias"))
    val q = pr("q_proj"); val k = pr("k_proj"); val v = pr("v_proj")
    val ctx = new Array[Float](t * h)
    val scores = new Array[Float](t)
    var hd = 0
    while (hd < cfg.heads) {
      val off = hd * dh
      var i = 0
      while (i < t) {
        var j = 0
        while (j < t) {
          var acc = 0.0
          var d = 0
          while (d < dh) { acc += q(i * h + off + d).toDouble * k(j * h + off + d); d += 1 }
          scores(j) = (acc * scale).toFloat
          j += 1
        }
        Tensors.softmaxRows(scores, 1, t)
        var d = 0
        while (d < dh) {
          var acc = 0.0
          var jj = 0
          while (jj < t) { acc += scores(jj).toDouble * v(jj * h + off + d); jj += 1 }
          ctx(i * h + off + d) = acc.toFloat
          d += 1
        }
        i += 1
      }
      hd += 1
    }
    Tensors.linear(ctx, t, h, w(s"$stem.out_proj.weight"), w(s"$stem.out_proj.bias"))
  }

  /** waveform → per-frame CTC logits [t][vocab]. */
  def logits(wave: Array[Float]): (Array[Float], Int) = {
    val h = cfg.hidden
    val (feat, t) = extractFeatures(wave)
    val c = cfg.convDims.last
    Tensors.layerNorm(feat, t, c,
      w("wav2vec2.feature_projection.layer_norm.weight"),
      w("wav2vec2.feature_projection.layer_norm.bias"), cfg.layerNormEps)
    val hid = Tensors.linear(feat, t, c,
      w("wav2vec2.feature_projection.projection.weight"),
      w("wav2vec2.feature_projection.projection.bias"))
    Tensors.addInPlace(hid, posConv(hid, t))
    // do_stable_layer_norm=false: LN after adding positional conv
    Tensors.layerNorm(hid, t, h, w("wav2vec2.encoder.layer_norm.weight"),
      w("wav2vec2.encoder.layer_norm.bias"), cfg.layerNormEps)
    var x = hid
    var li = 0
    while (li < cfg.layers) {
      val p = s"wav2vec2.encoder.layers.$li"
      val att = attend(x, t, s"$p.attention")
      Tensors.addInPlace(att, x)
      Tensors.layerNorm(att, t, h, w(s"$p.layer_norm.weight"),
        w(s"$p.layer_norm.bias"), cfg.layerNormEps)
      val inter = Tensors.linear(att, t, h,
        w(s"$p.feed_forward.intermediate_dense.weight"),
        w(s"$p.feed_forward.intermediate_dense.bias"))
      Tensors.gelu(inter)
      val ff = Tensors.linear(inter, t, cfg.intermediate,
        w(s"$p.feed_forward.output_dense.weight"),
        w(s"$p.feed_forward.output_dense.bias"))
      Tensors.addInPlace(ff, att)
      Tensors.layerNorm(ff, t, h, w(s"$p.final_layer_norm.weight"),
        w(s"$p.final_layer_norm.bias"), cfg.layerNormEps)
      x = ff
      li += 1
    }
    (Tensors.linear(x, t, h, w("lm_head.weight"), w("lm_head.bias")), t)
  }

  /** Per-frame argmax ids. */
  def frameIds(wave: Array[Float]): Seq[Int] = {
    val (lg, t) = logits(wave)
    val v = cfg.vocabSize
    (0 until t).map { ti =>
      var best = 0
      var i = 1
      while (i < v) { if (lg(ti * v + i) > lg(ti * v + best)) best = i; i += 1 }
      best
    }
  }
}

/** The model-free CTC greedy decode kernel — oracle-gated by q139. */
object Ctc {
  /** Collapse consecutive repeats, then drop the blank. The order matters:
    * a blank BETWEEN equal ids keeps both ("aa" vs "a·a" — the CTC
    * alignment distinction).
    */
  def decode(frameIds: Seq[Int], blank: Int): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var prev = -1
    frameIds.foreach { id =>
      if (id != prev && id != blank) out += id
      prev = id
    }
    out.result()
  }

  /** ids → text through a char vocab; `|` is the word delimiter
    * (Wav2Vec2CTCTokenizer convention).
    */
  def toText(ids: Seq[Int], idToToken: Map[Int, String]): String =
    ids.map(idToToken.getOrElse(_, "")).mkString
      .replace("|", " ").trim
}
