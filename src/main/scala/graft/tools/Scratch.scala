package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway q46 plan experiment (delete freely): one agg with two
  * distinct groups (Expand x3) vs two single-distinct aggs cross-joined.
  */
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

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def T(name: String) = graft.Tables(spark, sfDir, name)

    def current() = T("lineitem").agg(
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      countDistinct(col("l_orderkey")).as("exact_orders"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      countDistinct(col("l_partkey")).as("exact_parts"),
    ).select(
      col("exact_orders"), col("exact_parts"),
      (abs(col("approx_orders") - col("exact_orders")) <=
        col("exact_orders") * 0.05 &&
      abs(col("approx_parts") - col("exact_parts")) <=
        col("exact_parts") * 0.05).as("within_tol"))

    def variant() = {
      val a = T("lineitem").agg(
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      val b = T("lineitem").agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      a.crossJoin(b).select(
        col("exact_orders"), col("exact_parts"),
        (abs(col("approx_orders") - col("exact_orders")) <=
          col("exact_orders") * 0.05 &&
        abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("within_tol"))
    }

    // warmup both
    current().collect(); variant().collect()
    (1 to 3).foreach { i =>
      time(s"q46 current #$i") {
        current().write.format("noop").mode("overwrite").save() }
      time(s"q46 variant #$i") {
        variant().write.format("noop").mode("overwrite").save() }
    }
    println("[scratch] rows equal: " +
      (current().collect().toSeq == variant().collect().toSeq))
    spark.stop()
  }
}
