package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Skew, ZOrder}

/** Throwaway z-order layout probe (delete freely). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1L to 200000L).map(i => (i, (i * 48271L) % 200003L, s"p$i"))
      .toDF("x", "y", "v")
    val dir = "/tmp/zprobe"
    ZOrder.cluster(df.repartition(64), Seq("x", "y"), numBuckets = 256,
        partitions = 64)
      .write.mode("overwrite").parquet(s"$dir/zorder")
    Skew.clusterForPruning(df.repartition(64), "x")
      .write.mode("overwrite").parquet(s"$dir/xonly")
    // report per-file x/y min-max for the first few z files
    val zfiles = new java.io.File(s"$dir/zorder").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).take(6)
    zfiles.foreach { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("x"), max("x"), min("y"), max("y")).collect().head
      println(s"[scratch] ${f.getName.take(12)} x=[${r.get(0)},${r.get(1)}] y=[${r.get(2)},${r.get(3)}]")
    }
    def filesRead(path: String, c: String, v: Long): Long = {
      val scan = spark.read.parquet(path).filter(col(c) === v)
      scan.collect()
      val leaf = scan.queryExecution.executedPlan.collectLeaves().head
      leaf.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    }
    println(s"[scratch] zorder x-filter files=${filesRead(s"$dir/zorder", "x", 123456L)}")
    println(s"[scratch] zorder y-filter files=${filesRead(s"$dir/zorder", "y", 123456L)}")
    println(s"[scratch] xonly x-filter files=${filesRead(s"$dir/xonly", "x", 123456L)}")
    println(s"[scratch] xonly y-filter files=${filesRead(s"$dir/xonly", "y", 123456L)}")
    spark.stop()
  }
}
