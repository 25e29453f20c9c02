package graft.operators.tools

import graft.operators.{ExactAnn, KMeans}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown for the semantic-dedup operator (q100). */
object ProfileSem {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SEM_COALESCE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sem] $label%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val df = graft.Tables(spark, sfDir, "embeddings")
    time("warm scan")(df.count())
    val times = (1 to 4).map { round =>
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.semanticNearDupPairs(df, "embedding",
        "vec_id", tau = 0.4, k = 8, maxIter = 4).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sem] r$round pairs=$pairs ${dt}%.2f s")
      dt
    }
    println(f"[sem] min ${times.drop(1).min}%.2f s")
    spark.stop()
  }
}
