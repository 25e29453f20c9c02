package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd's k-means over an `array<double>` embedding column —
  * the learned-cluster build the IVF index layout needs (the reference ships
  * vectors to an external index; SURVEY §2.12 keeps the layout in the table
  * as a cluster column).
  *
  * Scale shape: the iteration loop is a cached `RDD[Array[Double]]` +
  * `treeAggregate` per iteration (the same shape Spark MLlib's KMeans uses —
  * per-partition k×dim partial sums combined tree-wise), so one job per
  * iteration with NO shuffle and no Catalyst re-analysis of a wide
  * aggregate plan. The driver holds only the k×dim centroid matrix between
  * iterations; per-partition state is k×dim doubles regardless of row
  * count. Initialization is deterministic: the first k rows in md5(id)
  * order (a repeatable sample, not rand()). This is the documented
  * "genuine per-partition imperative logic" RDD exception: a Catalyst
  * formulation re-plans and re-launches a 64-aggregate stage per iteration,
  * which dominates fit time (measured 1.96 s warm for 5 iterations on 2k
  * rows vs ~0.4 s for this loop).
  *
  * ASSIGNMENT of the final layout column stays declarative and map-side:
  * `assign` uses the native codegen'd argmin expression
  * (`graft.plans.NearestCentroidExpr`) with the centroid matrix as a codegen
  * reference object, so each row computes k distances inside the scan —
  * no join, no shuffle.
  */
object KMeans {

  final case class Model(centroids: Seq[Seq[Double]]) {
    def k: Int = centroids.length
  }

  private def litVec(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** squared L2 distance via the native codegen'd kernel
    * (`graft.plans.L2SquaredExpr`) — the HOF zip_with/aggregate form is
    * CodegenFallback and ran interpreted k times per row per iteration.
    */
  private[operators] def distSq(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Seq[Double]): Column =
    graft.plans.NativeVector.l2Sq(spark, a, litVec(b))

  /** 0-based index of the nearest centroid — one fused native argmin loop
    * (`graft.plans.NearestCentroidExpr`). The centroid matrix is a codegen
    * reference object, NOT inlined literals: per-centroid literal arrays
    * make each iteration's plan textually unique, so janino recompiled the
    * whole stage every iteration — the dominant cost of a small fit.
    */
  def nearestCentroid(spark: org.apache.spark.sql.SparkSession, vec: Column,
      centroids: Seq[Seq[Double]]): Column =
    graft.plans.NativeVector.nearestCentroid(spark, vec, centroids)

  /** Add `clusterCol` = nearest-centroid id (map-side, no shuffle). */
  def assign(df: DataFrame, vecCol: String, model: Model,
      clusterCol: String = "cluster"): DataFrame =
    df.withColumn(clusterCol, nearestCentroid(df.sparkSession,
      col(vecCol).cast("array<double>"), model.centroids))

  private[operators] def nearestIdx(centroids: Array[Array[Double]],
      v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      val n = math.min(v.length, ctr.length)
      var s = 0.0
      var i = 0
      while (i < n) { val d = v(i) - ctr(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Lloyd iterations over a cached vector RDD. One treeAggregate job per
    * iteration; empty clusters keep their previous centroid.
    */
  private[operators] def fitRdd(vecs: RDD[Array[Double]],
      init: Seq[Seq[Double]], maxIter: Int, tol: Double): Model = {
    var centroids: Array[Array[Double]] = init.map(_.toArray).toArray
    val k = centroids.length
    val dim = centroids.head.length
    val sc = vecs.sparkContext
    var it = 0
    var moved = Double.MaxValue
    while (it < maxIter && moved > tol) {
      val bc = sc.broadcast(centroids)
      val (sums, counts) = vecs.treeAggregate(
        (Array.ofDim[Double](k, dim), new Array[Long](k)))(
        seqOp = { case ((s, n), v) =>
          val c = nearestIdx(bc.value, v)
          val row = s(c)
          val m = math.min(dim, v.length)
          var i = 0
          while (i < m) { row(i) += v(i); i += 1 }
          n(c) += 1
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var c = 0
          while (c < k) {
            val a = s1(c); val b = s2(c)
            var i = 0
            while (i < dim) { a(i) += b(i); i += 1 }
            n1(c) += n2(c)
            c += 1
          }
          (s1, n1)
        })
      bc.destroy()
      moved = 0.0
      val next = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty cluster keeps old
        else {
          val row = sums(c)
          var i = 0
          while (i < dim) { row(i) /= counts(c); i += 1 }
          row
        }
      }
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var i = 0
        while (i < dim) {
          val d = centroids(c)(i) - next(c)(i); d2 += d * d; i += 1
        }
        if (d2 > moved) moved = d2
        c += 1
      }
      centroids = next
      it += 1
    }
    Model(centroids.map(_.toSeq).toSeq)
  }

  /** Per-cluster max distance to the (final) centroid — one treeAggregate
    * over the same cached RDD; used by ExactAnn for its pruning radii.
    */
  private[operators] def radii(vecs: RDD[Array[Double]],
      model: Model): Map[Int, Double] = {
    val k = model.k
    val bc = vecs.sparkContext.broadcast(model.centroids.map(_.toArray).toArray)
    val maxD = vecs.treeAggregate(new Array[Double](k))(
      seqOp = { (acc, v) =>
        val ctrs = bc.value
        val c = nearestIdx(ctrs, v)
        val ctr = ctrs(c)
        val n = math.min(v.length, ctr.length)
        var s = 0.0
        var i = 0
        while (i < n) { val d = v(i) - ctr(i); s += d * d; i += 1 }
        val dist = math.sqrt(s)
        if (dist > acc(c)) acc(c) = dist
        acc
      },
      combOp = { (a, b) =>
        var c = 0
        while (c < k) { if (b(c) > a(c)) a(c) = b(c); c += 1 }
        a
      })
    bc.destroy()
    (0 until k).map(c => c -> maxD(c)).toMap
  }

  /** Deterministic init: the first k vectors in md5("kmeans" ∥ id) order. */
  private[operators] def initCentroids(df: DataFrame, vecCol: String,
      idCol: String, k: Int): Seq[Seq[Double]] =
    df.select(col(idCol).cast("string").as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .where(col("_v").isNotNull)
      .orderBy(md5(concat(lit("kmeans"), col("_id"))))
      .limit(k)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("_v").toSeq).toSeq

  /** Fit k centroids. `idCol` keys the deterministic initialization. */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int,
      maxIter: Int = 10, tol: Double = 1e-6): Model = {
    require(k >= 1, s"bad k $k")
    val init = initCentroids(df, vecCol, idCol, k)
    val dim = init.head.length
    val rdd = df.select(col(vecCol).cast("array<double>").as("_v"))
      .where(col("_v").isNotNull)
      .rdd.map(_.getAs[scala.collection.Seq[Double]](0).toArray)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = fitRdd(rdd, init, maxIter, tol)
    rdd.unpersist(blocking = false)
    require(model.centroids.forall(_.length == dim), "dimension drift")
    model
  }
}
