package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** IVF-PQ approximate nearest neighbor (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the layout
  * faiss calls IVFPQ): the memory-bounded scale path for a 100 TB
  * embedding store, complementing [[ExactAnn]] (exact, reads full
  * vectors) and [[Quantize]] (int8, 4×). Reference surface: the same
  * `similarity()` family the reference indexes serve
  * (`/root/reference/pixeltable/index/embedding_index.py`).
  *
  *  - TRAIN (`build`): unit-normalize; coarse k-means over the vectors
  *    (kc cells, deterministic md5-ordered init via [[KMeans]]); then M
  *    per-subspace k-means over the coarse RESIDUALS (x − cell centroid,
  *    the faiss default — residual energy is far below vector energy, so
  *    the same ks codes quantize much finer). All codebooks are driver
  *    metadata: kc·d + M·ks·(d/M) doubles.
  *  - ENCODE (`encode`): map-only; each vector stores its cell id and M
  *    bytes of sub-codes — 8 bytes/vector at d=64, M=8 vs 256 bytes of
  *    float32: 32× compression, which is what makes a 100 TB store's
  *    codes fit an executor-memory-sized working set.
  *  - SEARCH (`search`): coarse-score the kc cells (driver math), probe
  *    the best `nprobe`; ADC — one M×ks lookup table of ⟨q_m, codebook⟩
  *    partial dots per query, score = ⟨q, cell⟩ + Σ_m LUT[m][code_m] —
  *    scores candidates map-only off the CODES (no vector reads), takes
  *    the top `rerank` approximately, then re-scores exactly against the
  *    true vectors (broadcast-joined candidate ids) for the final top-k.
  *    One TakeOrdered over codes + one id-join: no shuffle proportional
  *    to corpus size.
  */
object Pq {

  final case class Model(
      coarse: Array[Array[Double]], // kc × d unit-space cell centroids
      codebooks: Array[Array[Array[Double]]], // M × ks × (d/M) residual codebooks
  ) extends Serializable {
    def kc: Int = coarse.length
    def m: Int = codebooks.length
    def ks: Int = codebooks(0).length
    def subDim: Int = codebooks(0)(0).length
    def dim: Int = m * subDim
  }

  private def unit(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) v else v.map(_ / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) {
        val t = v(i) - cents(c)(i); d += t * t; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train coarse + residual codebooks on a BOUNDED deterministic sample
    * (md5-ordered by id, the faiss practice — PQ training needs thousands
    * of vectors, not the corpus): the sample collects to the driver and
    * Lloyd iterations run locally in a FIXED accumulation order, so the
    * model is bit-reproducible — distributed float reduction is not
    * (partition combine order varies run to run), and a last-ULP centroid
    * shift can flip a code assignment. Encode/search stay distributed;
    * only the bounded training sample ever reaches the driver.
    */
  def build(df: DataFrame, vecCol: String, idCol: String,
      kc: Int = 8, m: Int = 8, ks: Int = 16, maxIter: Int = 8,
      trainSample: Int = 4096): Model = {
    val sample = df.select(col(idCol).cast("string").as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .where(col("_v").isNotNull)
      .orderBy(md5(concat(lit("pq-sample"), col("_id"))))
      .limit(trainSample)
      .collect()
      .map(r => unit(r.getAs[scala.collection.Seq[Double]]("_v").toArray))
    require(sample.nonEmpty, "no vectors to train on")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val ds = dim / m
    val coarse = lloyd(sample, kc, maxIter)
    val resid = sample.map { v =>
      val c = coarse(nearest(coarse, v))
      val r = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { r(i) = v(i) - c(i); i += 1 }
      r
    }
    val codebooks = Array.tabulate(m) { mi =>
      lloyd(resid.map(r =>
        java.util.Arrays.copyOfRange(r, mi * ds, (mi + 1) * ds)), ks, maxIter)
    }
    Model(coarse, codebooks)
  }

  /** local Lloyd's k-means, fixed iteration order: init = first k sample
    * vectors (the sample itself is md5-shuffled), empty clusters keep
    * their previous centroid
    */
  private def lloyd(xs: Array[Array[Double]], k: Int, maxIter: Int): Array[Array[Double]] = {
    val d = xs.head.length
    var cents = Array.tabulate(math.min(k, xs.length))(i => xs(i).clone())
    if (cents.length < k)
      cents = cents ++ Array.fill(k - cents.length)(cents(0).clone())
    var it = 0
    while (it < maxIter) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      var i = 0
      while (i < xs.length) {
        val c = nearest(cents, xs(i))
        counts(c) += 1
        var j = 0
        while (j < d) { sums(c)(j) += xs(i)(j); j += 1 }
        i += 1
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c)))
      it += 1
    }
    cents
  }

  /** cell id + M sub-codes for one unit vector */
  private[operators] def encodeVec(model: Model, v0: Array[Double]): (Int, Array[Byte]) = {
    val v = unit(v0)
    val cell = nearest(model.coarse, v)
    val c = model.coarse(cell)
    val ds = model.subDim
    val code = new Array[Byte](model.m)
    var mi = 0
    while (mi < model.m) {
      val sub = new Array[Double](ds)
      var i = 0
      while (i < ds) { sub(i) = v(mi * ds + i) - c(mi * ds + i); i += 1 }
      code(mi) = nearest(model.codebooks(mi), sub).toByte
      mi += 1
    }
    (cell, code)
  }

  /** Map-only encode: (idCol, cell int, code binary[M]). At 100 TB this
    * is the ONLY full read of the vectors; everything downstream works
    * off 8-byte codes.
    */
  def encode(df: DataFrame, vecCol: String, idCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    df.select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .where(col("_v").isNotNull)
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, v) =>
          val (cell, code) = encodeVec(m, v.toArray)
          (id, cell, code)
        }
      }
      .toDF(idCol, "cell", "code")
  }

  /** Persist a model: one parquet row holding the java-serialized bytes —
    * bit-exact round-trip (JSON would re-parse doubles), tiny (kc·d +
    * M·ks·d/M doubles of driver metadata).
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, path: String,
      model: Model): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(model); oos.close()
    import spark.implicits._
    Seq(Tuple1(bos.toByteArray)).toDF("model")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val bytes = spark.read.parquet(path).head().getAs[Array[Byte]](0)
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try ois.readObject().asInstanceOf[Model] finally ois.close()
  }

  /** ADC scores for every code row in the probed cells: (id, adc) */
  private def adcScores(codes: DataFrame, model: Model, q: Array[Double],
      cells: Set[Int], idCol: String): DataFrame = {
    val spark = codes.sparkSession
    val ds = model.subDim
    val lut = Array.tabulate(model.m, model.ks) { (mi, j) =>
      var s = 0.0
      var i = 0
      while (i < ds) { s += q(mi * ds + i) * model.codebooks(mi)(j)(i); i += 1 }
      s
    }
    val cellDot = model.coarse.map(dot(q, _))
    val bcLut = spark.sparkContext.broadcast((lut, cellDot))
    import spark.implicits._
    codes
      .where(col("cell").isInCollection(cells))
      .select(col(idCol).cast("long"), col("cell"), col("code"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        val (l, cd) = bcLut.value
        it.map { case (id, cell, code) =>
          var s = cd(cell)
          var mi = 0
          while (mi < code.length) { s += l(mi)(code(mi) & 0xff); mi += 1 }
          (id, s)
        }
      }
      .toDF(idCol, "adc")
  }

  /** top-`fetch` candidate ids by ADC over the `nprobe` best cells —
    * the candidate stage the catalog's searchIndex re-ranks against live
    * vectors (TakeOrdered over codes; no corpus-sized shuffle)
    */
  def candidates(codes: DataFrame, model: Model, queryVec: Seq[Double],
      fetch: Int, nprobe: Int, idCol: String): DataFrame = {
    val q = unit(queryVec.toArray)
    val cells = model.coarse.indices
      .sortBy(c => -dot(q, model.coarse(c))).take(nprobe).toSet
    adcScores(codes, model, q, cells, idCol)
      .orderBy(col("adc").desc, col(idCol))
      .limit(fetch)
      .select(idCol)
      .dropDuplicates(idCol)
  }

  /** ADC search over codes + exact re-rank over the true vectors.
    * Returns (idCol, cos_sim) rows, exact cosine, ordered desc.
    */
  def search(df: DataFrame, codes: DataFrame, vecCol: String, idCol: String,
      model: Model, queryVec: Seq[Double], k: Int,
      nprobe: Int = 4, rerank: Int = 100): DataFrame = {
    val q = unit(queryVec.toArray)
    // coarse probe order is driver math; ADC LUT is M × ks partial dots
    // (residual codebooks are cell-independent — ONE table serves every
    // cell); TakeOrderedAndProject over codes — no full shuffle
    val cells = model.coarse.indices
      .sortBy(c => -dot(q, model.coarse(c))).take(nprobe).toSet
    val cand = adcScores(codes, model, q, cells, idCol)
      .orderBy(col("adc").desc, col(idCol))
      .limit(rerank)
      .select(idCol)
    // exact cosine re-rank of the bounded candidate set
    val qc = array(q.toSeq.map(lit): _*) // unit query → dot IS cosine on unit vectors
    val emb = df.select(col(idCol).cast("long").as(idCol),
      ExactAnn.normalized(col(vecCol)).as("_u"))
    emb.join(broadcast(cand), Seq(idCol))
      .select(col(idCol),
        aggregate(zip_with(col("_u"), qc, (x, y) => x * y),
          lit(0.0), (a, x) => a + x).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
