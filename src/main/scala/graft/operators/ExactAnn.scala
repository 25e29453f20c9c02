package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  */
object ExactAnn {

  final case class Ivf(model: KMeans.Model, radii: Map[Int, Double])

  private def normalized(vec: Column): Column = {
    val d = vec.cast("array<double>")
    val n = sqrt(aggregate(zip_with(d, d, (x, y) => x * y), lit(0.0), (a, x) => a + x))
    transform(d, x => x / n)
  }

  private def unitQuery(q: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(q.map(x => x * x).sum)
    q.map(_ / n)
  }

  /** Fit the layout: k-means on unit vectors + per-cluster radii. */
  def build(df: DataFrame, vecCol: String, idCol: String, k: Int,
      maxIter: Int = 10): Ivf = {
    val spark = df.sparkSession
    val norm = df.withColumn("_nv", normalized(col(vecCol)))
    val model = KMeans.fit(norm, "_nv", idCol, k, maxIter)
    val dists = array(model.centroids.map(c =>
      KMeans.distSq(spark, col("_nv"), c)): _*)
    val radii = KMeans.assign(norm, "_nv", model)
      .withColumn("_dc", sqrt(array_min(dists)))
      .groupBy("cluster").agg(max("_dc").as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
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
    // the normalized+assigned projection feeds BOTH probe passes: persist
    // it once (the HOF normalize would otherwise re-run interpreted per pass)
    val assigned = KMeans.assign(
      df.withColumn("_nv", normalized(col(vecCol))), "_nv", ivf.model)
      .select(col(idCol), col("cluster"), col(vecCol))
      .persist()
    val cos = graft.plans.NativeVector.cosine(spark,
      col(vecCol).cast("array<double>"), array(query.map(lit): _*))
    def topIn(clusters: Seq[Int]): Array[org.apache.spark.sql.Row] =
      assigned.filter(col("cluster").isin(clusters: _*))
        .select(col(idCol), cos.as("cos_sim"))
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
