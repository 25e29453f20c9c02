package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: fresh-plan wall time for named registry queries (or the
  * N slowest if none named). Every run constructs the DataFrame FRESH —
  * re-running an action on a reused instance silently reuses its shuffle
  * output and hides all upstream cost (and `count()` on an aggregate can
  * prune the aggregate expressions entirely — time real output actions).
  */
object ProfileQ {
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
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).collect() // warm codegen/scan caches
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).collect().length
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    spark.stop()
  }
}
