package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway q109 (stratified-fraction sample) profiler: per-stage wall
  * breakdown + plan-shape counters (md5 evaluations, exchanges) at a
  * chosen input scale (delete freely).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val df =
      if (scale == 1) base
      else if (scale == -1) // pre-built replica dir (real file scan)
        spark.read.parquet("/tmp/graft_scale_100x/lineitem.parquet")
      else (0 until scale).map(i => base.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 100000000L)))
        .reduce(_.union(_))
    println(s"[scratch] rows = ${df.count()} (scale $scale)")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val q = graft.api.Query(df, Seq("l_orderkey", "l_linenumber"))
      .sampleStratifiedFraction(0.1, Seq(col("l_returnflag")), seed = 7).df
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    time("full sample (run 1)")(noop(q))
    time("full sample (run 2)")(noop(q))
    time("full sample (run 3)")(noop(q))
    val plan = q.queryExecution.executedPlan.toString
    println(s"[scratch] reused exchanges: " +
      "ReusedExchange".r.findAllIn(plan).length)
    println(s"[scratch] plan:\n" + plan.linesIterator.map(l =>
      "[scratch]   " + l.take(110)).mkString("\n"))
    println(s"[scratch] md5 mentions in plan: " +
      "md5".r.findAllIn(plan).length)
    println(s"[scratch] exchanges: " +
      "Exchange".r.findAllIn(plan).length)
    println(s"[scratch] scans: " +
      "Scan parquet".r.findAllIn(plan).length)
    // stage isolation
    val key = md5(concat_ws("___", lit("7"), col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string")))
    val keyed = df.withColumn("_sk", key)
      .withColumn("_sb", conv(substring(col("_sk"), 1, 2), 16, 10).cast("int"))
    time("scan+md5 only")(keyed.select(max("_sb")).collect())
    time("counts agg only")(
      keyed.groupBy(col("l_returnflag"), col("_sb"))
        .agg(count(lit(1))).collect())
    import org.apache.spark.sql.expressions.Window
    val wLocal = Window.partitionBy(col("l_returnflag"), col("_sb"))
      .orderBy(col("_sk"))
    time("window rank only")(
      keyed.withColumn("_lr", row_number().over(wLocal))
        .select(max("_lr")).collect())
    spark.stop()
  }
}
