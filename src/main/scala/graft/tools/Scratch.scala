package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for q81 (delete freely). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{ExactAnn, KMeans}

    val emb = graft.Tables(spark, sfDir, "embeddings")
    println(s"[scratch] rows=${emb.count()}")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    emb.count()
    val queryVec: Seq[Double] = (0 until 64).map(i => ((i % 7) - 3) * 0.125)
    val ivf = t("build (kmeans+radii)")(ExactAnn.build(emb, "embedding", "vec_id", k = 8, maxIter = 5))
    val res = t("search")(ExactAnn.search(spark, emb, "embedding", "vec_id", queryVec, 10, ivf).collect())
    // decompose build
    val norm = emb.withColumn("_nv", org.apache.spark.sql.functions.expr("transform(cast(embedding as array<double>), x -> x)"))
    val ivf2 = t("build again")(ExactAnn.build(emb, "embedding", "vec_id", k = 8, maxIter = 5))
    val m = t("kmeans.fit only")(KMeans.fit(emb.withColumn("_nv", col("embedding").cast("array<double>")), "_nv", "vec_id", 8, 5))
    println(res.take(2).mkString(","))
    spark.stop()
  }
}
