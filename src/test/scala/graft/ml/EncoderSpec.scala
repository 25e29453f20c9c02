package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Kernel pins + safetensors round-trip + tokenizer semantics + an
  * INDEPENDENT naive forward-pass cross-check: the reference
  * implementation below is written per-position over double vectors (no
  * flattening, no buffer reuse) so a layout/transpose bug in the engine
  * cannot cancel itself out in the comparison.
  */
class EncoderSpec extends AnyFunSuite {

  // ---- kernel pins --------------------------------------------------

  test("erf/gelu match published values") {
    assert(math.abs(Tensors.erf(0.7071067811865476) - 0.6826894921370859) < 1e-6)
    val g = Array(1f, 0f, -1f, 2f)
    Tensors.gelu(g)
    assert(math.abs(g(0) - 0.8413447f) < 1e-5)
    assert(g(1) == 0f)
    assert(math.abs(g(2) - (-0.1586553f)) < 1e-5)
    assert(math.abs(g(3) - 1.9544997f) < 1e-5)
  }

  test("layerNorm of [1,2,3] with unit gamma is [-sqrt(3/2), 0, sqrt(3/2)]") {
    val x = Array(1f, 2f, 3f)
    Tensors.layerNorm(x, 1, 3, Tensor(Array(3), Array(1f, 1f, 1f)),
      Tensor(Array(3), Array(0f, 0f, 0f)), 0.0)
    assert(math.abs(x(0) + 1.2247449f) < 1e-5)
    assert(math.abs(x(1)) < 1e-6)
    assert(math.abs(x(2) - 1.2247449f) < 1e-5)
  }

  test("linear uses the torch [out,in] convention: y = xWt + b") {
    // x = [1, 2]; W = [[1,0],[0,1],[1,1]] (3 out, 2 in); b = [10, 20, 30]
    val y = Tensors.linear(Array(1f, 2f), 1, 2,
      Tensor(Array(3, 2), Array(1f, 0f, 0f, 1f, 1f, 1f)),
      Tensor(Array(3), Array(10f, 20f, 30f)))
    assert(y.toSeq == Seq(11f, 22f, 33f))
  }

  test("softmax rows sum to 1 and order correctly") {
    val x = Array(1f, 2f, 3f, 0f, 0f, 0f)
    Tensors.softmaxRows(x, 2, 3)
    assert(math.abs(x.take(3).sum - 1f) < 1e-6)
    assert(x(2) > x(1) && x(1) > x(0))
    assert(math.abs(x(3) - 1f / 3) < 1e-6)
  }

  test("half-float decode: normals, subnormals, specials") {
    assert(SafeTensors.halfToFloat(0x3c00.toShort) == 1.0f)
    assert(SafeTensors.halfToFloat(0xc000.toShort) == -2.0f)
    assert(SafeTensors.halfToFloat(0x7bff.toShort) == 65504.0f) // max half
    assert(math.abs(SafeTensors.halfToFloat(0x0001.toShort) - 5.9604645e-8f) < 1e-12f)
    assert(SafeTensors.halfToFloat(0x7c00.toShort).isPosInfinity)
    assert(SafeTensors.halfToFloat(0xfc00.toShort).isNegInfinity)
    assert(SafeTensors.halfToFloat(0x7e00.toShort).isNaN)
    assert(SafeTensors.halfToFloat(0x8000.toShort) == -0.0f)
  }

  // ---- safetensors --------------------------------------------------

  test("safetensors round-trip is exact, metadata preserved") {
    val dir = Files.createTempDirectory("st").toString
    val a = Tensor(Array(2, 3), Array(1f, -2f, 3.5f, 0f, 1e-30f, 6.02e23f))
    val b = Tensor(Array(4), Array(0.1f, 0.2f, 0.3f, 0.4f))
    SafeTensors.write(s"$dir/w.safetensors", Seq("alpha" -> a, "beta" -> b),
      Map("format" -> "pt"))
    val (back, meta) = SafeTensors.readWithMetadata(s"$dir/w.safetensors")
    assert(meta == Map("format" -> "pt"))
    assert(back("alpha").shape.toSeq == Seq(2, 3))
    assert(back("alpha").data.toSeq == a.data.toSeq)
    assert(back("beta").data.toSeq == b.data.toSeq)
  }

  test("safetensors reads hand-built F16 buffer") {
    // header: one tensor "h" F16 shape [3] offsets [0,6); values 1.0, -2.0, 0.5
    val json = """{"h":{"dtype":"F16","shape":[3],"data_offsets":[0,6]}}"""
    val jb = json.getBytes("UTF-8")
    val buf = java.nio.ByteBuffer.allocate(8 + jb.length + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(jb.length.toLong).put(jb)
      .putShort(0x3c00.toShort).putShort(0xc000.toShort).putShort(0x3800.toShort)
    val p = Files.createTempFile("st16", ".safetensors")
    Files.write(p, buf.array())
    val t = SafeTensors.read(p.toString)("h")
    assert(t.data.toSeq == Seq(1.0f, -2.0f, 0.5f))
  }

  test("safetensors rejects out-of-range offsets and bad header lengths") {
    val json = """{"h":{"dtype":"F32","shape":[4],"data_offsets":[0,16]}}"""
    val jb = json.getBytes("UTF-8")
    val buf = java.nio.ByteBuffer.allocate(8 + jb.length + 8) // only 8 data bytes
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(jb.length.toLong).put(jb).putLong(0L)
    val p = Files.createTempFile("stbad", ".safetensors")
    Files.write(p, buf.array())
    intercept[IllegalArgumentException](SafeTensors.read(p.toString))
  }

  // ---- tokenizer ----------------------------------------------------

  test("wordpiece: classic un+##aff+##able, UNK fallback, longest match") {
    val wp = WordPiece.fromTokens(Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]",
      "un", "##aff", "##able", "aff", "hello", "##llo", "he"))
    assert(wp.wordpiece("unaffable") == Seq("un", "##aff", "##able"))
    assert(wp.wordpiece("zzz") == Seq("[UNK]"))
    assert(wp.wordpiece("hello") == Seq("hello")) // whole-word beats he+##llo
    assert(wp.tokenize("UNAFFABLE hello") == Seq("un", "##aff", "##able", "hello"))
  }

  test("basic tokenizer isolates punctuation and lowercases") {
    val wp = WordPiece.fromTokens(Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]"))
    assert(wp.basicTokenize("Hello, world! it's 3.5") ==
      Seq("hello", ",", "world", "!", "it", "'", "s", "3", ".", "5"))
  }

  test("encodePair: segment ids and longest-first truncation") {
    val toks = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++ "abcdefgh".map(_.toString)
    val wp = WordPiece.fromTokens(toks)
    val (ids, types) = wp.encodePair("a b c d e", "f g", maxLen = 8)
    // longest-first: the 5-token a-side is cut to 3 → [CLS] a b c [SEP] f g [SEP]
    assert(ids.length == 8 && types.length == 8)
    assert(ids(0) == wp.clsId && ids(4) == wp.sepId && ids(7) == wp.sepId)
    assert(types.toSeq == Seq(0, 0, 0, 0, 0, 1, 1, 1))
  }

  // ---- independent naive forward cross-check ------------------------

  /** Straight-from-the-paper forward: per-position double vectors. */
  private def naiveEmbed(bundle: LocalModels.ModelBundle, text: String,
      maxLen: Int): Array[Double] = {
    val cfg = bundle.cfg
    val W = bundle.weights
    val h = cfg.hiddenSize
    def matvec(w: Tensor, b: Tensor, x: Array[Double]): Array[Double] =
      (0 until w.rows).map(o =>
        (0 until w.cols).map(k => w(o, k).toDouble * x(k)).sum + b.data(o)).toArray
    def ln(x: Array[Double], g: Tensor, b: Tensor): Array[Double] = {
      val mean = x.sum / x.length
      val v = x.map(d => (d - mean) * (d - mean)).sum / x.length
      x.indices.map(k =>
        (x(k) - mean) / math.sqrt(v + cfg.layerNormEps) * g.data(k) + b.data(k)).toArray
    }
    val ids = bundle.tokenizer.encode(text, maxLen)
    var xs: Seq[Array[Double]] = ids.toSeq.zipWithIndex.map { case (id, pos) =>
      (0 until h).map(k =>
        W("embeddings.word_embeddings.weight")(id, k).toDouble +
          W("embeddings.position_embeddings.weight")(pos, k) +
          W("embeddings.token_type_embeddings.weight")(0, k)).toArray
    }
    xs = xs.map(ln(_, W("embeddings.LayerNorm.weight"), W("embeddings.LayerNorm.bias")))
    for (l <- 0 until cfg.numLayers) {
      val p = s"encoder.layer.$l."
      val q = xs.map(matvec(W(p + "attention.self.query.weight"), W(p + "attention.self.query.bias"), _))
      val k = xs.map(matvec(W(p + "attention.self.key.weight"), W(p + "attention.self.key.bias"), _))
      val v = xs.map(matvec(W(p + "attention.self.value.weight"), W(p + "attention.self.value.bias"), _))
      val dh = cfg.headDim
      val ctx = xs.indices.map { i =>
        val out = new Array[Double](h)
        for (head <- 0 until cfg.numHeads) {
          val off = head * dh
          val scores = xs.indices.map { j =>
            (0 until dh).map(d => q(i)(off + d) * k(j)(off + d)).sum / math.sqrt(dh.toDouble)
          }
          val mx = scores.max
          val exps = scores.map(s => math.exp(s - mx))
          val z = exps.sum
          for (d <- 0 until dh; j <- xs.indices)
            out(off + d) += exps(j) / z * v(j)(off + d)
        }
        out
      }
      val attnOut = ctx.map(matvec(W(p + "attention.output.dense.weight"), W(p + "attention.output.dense.bias"), _))
      xs = xs.zip(attnOut).map { case (a, b) =>
        ln(a.zip(b).map { case (x1, x2) => x1 + x2 },
          W(p + "attention.output.LayerNorm.weight"), W(p + "attention.output.LayerNorm.bias"))
      }
      val inter = xs.map(matvec(W(p + "intermediate.dense.weight"), W(p + "intermediate.dense.bias"), _))
        .map(_.map(x => x * 0.5 * (1.0 + Tensors.erf(x / math.sqrt(2.0)))))
      val ffOut = inter.map(matvec(W(p + "output.dense.weight"), W(p + "output.dense.bias"), _))
      xs = xs.zip(ffOut).map { case (a, b) =>
        ln(a.zip(b).map { case (x1, x2) => x1 + x2 },
          W(p + "output.LayerNorm.weight"), W(p + "output.LayerNorm.bias"))
      }
    }
    val mean = (0 until h).map(k => xs.map(_(k)).sum / xs.length).toArray
    val norm = math.sqrt(mean.map(d => d * d).sum)
    mean.map(_ / norm)
  }

  private lazy val tinyDir: String = LocalModels.ensureTinyModel(seed = 42L)

  test("engine forward matches the independent naive implementation") {
    val bundle = LocalModels.load(tinyDir)
    for (text <- Seq("hello world", "the quick brown fox jumps over 13 lazy dogs!",
        "a", "punctuation, heavy; text: (with) [brackets]!?")) {
      val fast = bundle.encoder.meanPoolNormalized(
        bundle.encoder.forward(Seq(bundle.tokenizer.encode(text, 64))))(0)
      val slow = naiveEmbed(bundle, text, 64)
      assert(fast.length == slow.length)
      fast.zip(slow).foreach { case (f, s) =>
        assert(math.abs(f - s) < 1e-4, s"dim mismatch for '$text': $f vs $s")
      }
    }
  }

  test("padded-batch encoding is bit-identical to one-at-a-time encoding") {
    val bundle = LocalModels.load(tinyDir)
    val texts = Seq("a", "a much longer sentence that pads the batch out considerably",
      "medium length text here")
    val batched = bundle.encoder.meanPoolNormalized(
      bundle.encoder.forward(texts.map(bundle.tokenizer.encode(_, 64))))
    val single = texts.map(t => bundle.encoder.meanPoolNormalized(
      bundle.encoder.forward(Seq(bundle.tokenizer.encode(t, 64))))(0))
    batched.zip(single).foreach { case (b, s) => assert(b.toSeq == s.toSeq) }
  }

  test("embeddings are unit-norm and deterministic") {
    val bundle = LocalModels.load(tinyDir)
    val e1 = bundle.encoder.meanPoolNormalized(
      bundle.encoder.forward(Seq(bundle.tokenizer.encode("determinism check", 64))))(0)
    val e2 = bundle.encoder.meanPoolNormalized(
      bundle.encoder.forward(Seq(bundle.tokenizer.encode("determinism check", 64))))(0)
    assert(e1.toSeq == e2.toSeq)
    val norm = math.sqrt(e1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("tiny checkpoint loads through the standard HF layout") {
    val bundle = LocalModels.load(tinyDir)
    assert(bundle.cfg.hiddenSize == 16 && bundle.cfg.numLayers == 2)
    assert(bundle.vocabTokens.take(2) == Seq("[PAD]", "[UNK]"))
    // a bert.-prefixed checkpoint resolves the same way
    val prefixed = bundle.weights.map { case (k, v) => s"bert.$k" -> v }
    val enc2 = new Encoder(bundle.cfg, prefixed)
    val ids = Seq(bundle.tokenizer.encode("prefix check", 64))
    assert(enc2.meanPoolNormalized(enc2.forward(ids))(0).toSeq ==
      bundle.encoder.meanPoolNormalized(bundle.encoder.forward(ids))(0).toSeq)
  }
}
