package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an `array<double>` embedding column —
  * the learned-cluster build the IVF index layout needs (the reference ships
  * vectors to an external index; SURVEY §2.12 keeps the layout in the table
  * as a cluster column).
  *
  * Scale shape: the ASSIGNMENT step is map-side only — the k centroids are
  * inlined into the plan as literals, so each row computes k distances and
  * an argmin inside the scan, no join, no shuffle. The UPDATE step reduces
  * to k·dim partial averages (posexplode → groupBy(cluster, dim)), so the
  * per-iteration shuffle is k·dim rows per partition — independent of row
  * count. The driver holds only the k×dim centroid matrix between
  * iterations. Initialization is deterministic: the first k rows in
  * md5(id) order (a repeatable sample, not rand()).
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

  /** Fit k centroids. `idCol` keys the deterministic initialization. */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int,
      maxIter: Int = 10, tol: Double = 1e-6): Model = {
    require(k >= 1, s"bad k $k")
    val vecs = df.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v")).persist()
    var centroids: Seq[Seq[Double]] = vecs
      .orderBy(md5(concat(lit("kmeans"), col("_id").cast("string"))))
      .limit(k)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("_v").toSeq).toSeq
    val dim = centroids.head.length
    var it = 0
    var moved = Double.MaxValue
    while (it < maxIter && moved > tol) {
      val assigned = vecs.withColumn("_c",
        nearestCentroid(df.sparkSession, col("_v"), centroids))
      // k·dim partial sums — the only shuffle of the iteration. One sum
      // aggregate per dimension (codegen'd, k rows out) instead of
      // posexplode: exploding multiplies the row count by dim through the
      // partial-aggregation machinery for zero benefit.
      val dimSums = (0 until dim).map(d =>
        sum(element_at(col("_v"), d + 1)).as(s"_s$d"))
      val sums = assigned
        .groupBy(col("_c"))
        .agg(count(lit(1)).as("_n"), dimSums: _*)
        .collect()
      val next = Array.tabulate(k)(i => centroids(i).toArray) // empty cluster keeps old
      sums.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(1)
        if (n > 0)
          (0 until dim).foreach(d => next(c)(d) = r.getDouble(d + 2) / n)
      }
      moved = centroids.zip(next).map { case (a, b) =>
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      }.max
      centroids = next.map(_.toSeq).toSeq
      it += 1
    }
    vecs.unpersist()
    require(centroids.forall(_.length == dim), "dimension drift")
    Model(centroids)
  }
}
