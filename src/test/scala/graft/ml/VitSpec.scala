package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** ViT: independent naive forward cross-check, preprocessing pin, and the
  * Spark image-classification surface.
  */
class VitSpec extends AnyFunSuite {

  private lazy val vitDir: String = LocalModels.ensureTinyVitModel(seed = 42L)

  private def naiveLogits(bundle: LocalModels.VitBundle,
      pix: Array[Float]): Array[Double] = {
    val W = bundle.weights
    val cfg = bundle.cfg
    val h = cfg.hiddenSize
    val s = cfg.imageSize; val p = cfg.patchSize; val grid = s / p
    def ln(x: Array[Double], stem: String): Array[Double] = {
      val g = W(stem + ".weight"); val b = W(stem + ".bias")
      val mean = x.sum / x.length
      val v = x.map(d => (d - mean) * (d - mean)).sum / x.length
      x.indices.map(k => (x(k) - mean) / math.sqrt(v + cfg.layerNormEps) * g.data(k) + b.data(k)).toArray
    }
    def mv(stem: String, x: Array[Double]): Array[Double] = {
      val wt = W(stem + ".weight"); val b = W(stem + ".bias")
      (0 until wt.rows).map(o =>
        (0 until wt.cols).map(k => wt(o, k).toDouble * x(k)).sum + b.data(o)).toArray
    }
    val posE = W("vit.embeddings.position_embeddings")
    val pw = W("vit.embeddings.patch_embeddings.projection.weight")
    val pb = W("vit.embeddings.patch_embeddings.projection.bias")
    val cls = (0 until h).map(k =>
      W("vit.embeddings.cls_token").data(k).toDouble + posE.data(k)).toArray
    val patches = for (gy <- 0 until grid; gx <- 0 until grid) yield {
      val t = 1 + gy * grid + gx
      (0 until h).map { o =>
        var acc = pb.data(o).toDouble
        for (c <- 0 until 3; py <- 0 until p; px <- 0 until p)
          acc += pw.data(((o * 3 + c) * p + py) * p + px) *
            pix(c * s * s + (gy * p + py) * s + (gx * p + px))
        acc + posE.data(t * h + o)
      }.toArray
    }
    var xs: Seq[Array[Double]] = cls +: patches
    val dh = cfg.headDim
    for (l <- 0 until cfg.numLayers) {
      val p0 = s"vit.encoder.layer.$l."
      val n1 = xs.map(ln(_, p0 + "layernorm_before"))
      val q = n1.map(mv(p0 + "attention.attention.query", _))
      val k = n1.map(mv(p0 + "attention.attention.key", _))
      val v = n1.map(mv(p0 + "attention.attention.value", _))
      val ctx = xs.indices.map { i =>
        val out = new Array[Double](h)
        for (hd <- 0 until cfg.numHeads) {
          val off = hd * dh
          val scores = xs.indices.map(j =>
            (0 until dh).map(d => q(i)(off + d) * k(j)(off + d)).sum / math.sqrt(dh.toDouble))
          val mx = scores.max
          val exps = scores.map(sc => math.exp(sc - mx))
          val z = exps.sum
          for ((j, jj) <- xs.indices.zip(exps.indices); d <- 0 until dh)
            out(off + d) += exps(jj) / z * v(j)(off + d)
        }
        out
      }
      val attnOut = ctx.map(mv(p0 + "attention.output.dense", _))
      xs = xs.zip(attnOut).map { case (a, b) => a.zip(b).map { case (u, vv) => u + vv } }
      val n2 = xs.map(ln(_, p0 + "layernorm_after"))
      val ff = n2.map(x => mv(p0 + "output.dense",
        mv(p0 + "intermediate.dense", x).map(g => g * 0.5 * (1.0 + Tensors.erf(g / math.sqrt(2.0))))))
      xs = xs.zip(ff).map { case (a, b) => a.zip(b).map { case (u, vv) => u + vv } }
    }
    mv("classifier", ln(xs.head, "vit.layernorm"))
  }

  test("classifyLogits matches the independent naive implementation") {
    val bundle = LocalModels.loadVit(vitDir)
    val s = bundle.cfg.imageSize
    val pix = Array.tabulate(3 * s * s)(i => ((i * 53 % 97) / 97.0f) - 0.5f)
    val fast = bundle.model.classifyLogits(pix)
    val slow = naiveLogits(bundle, pix)
    assert(fast.length == 4)
    fast.zip(slow).foreach { case (f, sv) => assert(math.abs(f - sv) < 1e-4, s"$f vs $sv") }
  }

  test("preprocess: white pixel normalizes to exactly 1.0 (mean/std 0.5)") {
    val bundle = LocalModels.loadVit(vitDir)
    val img = new java.awt.image.BufferedImage(5, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 5) img.setRGB(x, y, 0xffffff)
    val pix = bundle.model.preprocess(img)
    assert(pix.forall(v => math.abs(v - 1.0f) < 1e-6f))
  }

  test("imageClassification: top-k labels, softmax scores, null safety") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = (1 to 5).map(i =>
      (i.toLong, graft.functions.Images.solidPng(12, 9, i * 111111 % 0xffffff))) :+
      (9L, null.asInstanceOf[Array[Byte]])
    val df = rows.toDF("id", "png")
    val out = LocalModels.imageClassification(df, "png", "cls", vitDir, topK = 4)
      .select("id", "cls").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[org.apache.spark.sql.Row](1))).toMap
    assert(out(9L).isEmpty)
    val e = out(1L).get
    assert(e.length == 4)
    assert(math.abs(e.map(_.getFloat(1).toDouble).sum - 1.0) < 1e-5)
    assert(e.map(_.getFloat(1)).sliding(2).forall(p => p(0) >= p(1)))
    // deterministic across partitioning
    val again = LocalModels.imageClassification(df.repartition(3), "png", "cls", vitDir,
      topK = 4).select("id", "cls").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[org.apache.spark.sql.Row](1))).toMap
    assert(out == again)
  }
}
