package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT cosine top-k over a learned IVF layout: cluster-level
  * triangle-inequality pruning that never loses a result.
  *
  * Cosine ranking is L2 ranking on unit vectors (d² = 2 − 2·cos), so:
  * fit k-means on normalized embeddings, record each cluster's RADIUS
  * (max member distance to centroid). For query q, any member x of
  * cluster c satisfies d(q,x) ≥ d(q,centroid_c) − radius_c. Probe the
  * nearest cluster to get a kth-best bound τ, then scan only clusters
  * whose lower bound ≤ τ — the result equals brute force EXACTLY, with
  * data-dependent pruning (tight clusters → most of the table skipped;
  * pathological data degrades to a full scan, never to a wrong answer).
  * With the table partitioned by cluster id the probe is a
  * partition-pruned scan — the 100 TB layout.
  *
  * Build shape: ONE cached RDD of unit vectors feeds the k-means
  * iterations and the radii pass (treeAggregate each — no shuffle, no
  * per-iteration Catalyst planning; see KMeans.fitRdd). The search-side
  * assignment stays a declarative map-side projection via the native
  * argmin expression, because at scale the cluster id is a materialized
  * layout column, not recomputed per query (q30).
  */
object ExactAnn {

  final case class Ivf(model: KMeans.Model, radii: Map[Int, Double])

  private[graft] def normalized(vec: Column): Column = {
    val d = vec.cast("array<double>")
    val n = sqrt(aggregate(zip_with(d, d, (x, y) => x * y), lit(0.0), (a, x) => a + x))
    transform(d, x => x / n)
  }

  private def unitQuery(q: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(q.map(x => x * x).sum)
    q.map(_ / n)
  }

  private def unit(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) / n; i += 1 }
    out
  }

  /** Fit the layout: k-means on unit vectors + per-cluster radii, off one
    * cached unit-vector RDD (normalization runs once, in a plain loop —
    * the HOF transform/aggregate form is CodegenFallback and interpreted).
    */
  def build(df: DataFrame, vecCol: String, idCol: String, k: Int,
      maxIter: Int = 10): Ivf = {
    val init = KMeans.initCentroids(df, vecCol, idCol, k)
      .map(c => unit(c.toArray).toSeq)
    val rdd = df.select(col(vecCol).cast("array<double>").as("_v"))
      .where(col("_v").isNotNull)
      .rdd.map(r => unit(r.getAs[scala.collection.Seq[Double]](0).toArray))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = KMeans.fitRdd(rdd, init, maxIter, tol = 1e-6)
    val radii = KMeans.radii(rdd, model)
    rdd.unpersist(blocking = false)
    Ivf(model, radii)
  }

  /** Exact cosine top-k: probe the nearest cluster for a bound, then every
    * cluster the bound cannot exclude. Returns (idCol, cos_sim) rows.
    */
  def search(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      vecCol: String, idCol: String, query: Seq[Double], k: Int,
      ivf: Ivf): DataFrame = {
    val qn = unitQuery(query)
    val dCent = ivf.model.centroids.zipWithIndex.map { case (c, i) =>
      i -> math.sqrt(c.zip(qn).map { case (x, y) => (x - y) * (x - y) }.sum)
    }.toMap
    // one narrow persisted projection (id, cluster, cos_sim) feeds BOTH
    // probe passes: the similarity is computed once, and the probes are
    // filter + TakeOrderedAndProject over three scalar columns.
    val cos = graft.plans.NativeVector.cosine(spark,
      col(vecCol).cast("array<double>"), array(query.map(lit): _*))
    val assigned = KMeans.assign(
      df.withColumn("_nv", normalized(col(vecCol))), "_nv", ivf.model)
      .select(col(idCol), col("cluster"), cos.as("cos_sim"))
      .persist()
    def topIn(clusters: Seq[Int]): Array[org.apache.spark.sql.Row] =
      assigned.filter(col("cluster").isin(clusters: _*))
        .select(col(idCol), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col(idCol))
        .limit(k).collect()
    // pass 1: nearest cluster → kth-best similarity → distance bound τ
    val nearest = dCent.minBy(_._2)._1
    val seed = topIn(Seq(nearest))
    val tau =
      if (seed.length < k) Double.MaxValue
      else math.sqrt(math.max(2.0 - 2.0 * seed.last.getDouble(1), 0.0))
    // pass 2: every cluster whose lower bound could beat τ (fp-safe slack)
    val probe = ivf.model.centroids.indices.filter { c =>
      dCent(c) - ivf.radii.getOrElse(c, 0.0) <= tau + 1e-9
    }
    val rows = topIn(probe)
    assigned.unpersist()
    // k rows — a driver-local frame is the honest shape for a top-k probe
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol,
          df.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("cos_sim",
          org.apache.spark.sql.types.DoubleType))))
  }
}
