package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. A warmup action runs first so the first
  * measured query doesn't absorb JVM/codegen/session startup, and queries
  * run in name order so timings are comparable across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: a small real query through the full stack (scan+agg+codegen)
    try SparkEntry.queries.head._2(spark, sfDir).collect()
    catch { case _: Throwable => () }
    // warmup run + three timed runs per query, report the MIN: steady-state
    // throughput (the warmup pays per-query codegen compilation; min-of-3
    // is robust to host-level stalls and GC pauses, which showed 2-30x
    // one-off inflation on this VM).
    // noop sink, NOT count(): count() lets Catalyst prune computed columns
    // and aggregate expressions wholesale (a minhash/UDAF query times
    // near-zero while computing nothing); the noop sink forces every
    // output row to be fully produced without driver materialization.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      once()
      name -> Seq(once(), once(), once()).min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
