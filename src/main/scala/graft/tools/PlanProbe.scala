package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Print the executed physical plan of selected registry queries —
  * `sbt "runMain graft.tools.PlanProbe <sfDir> <name> [name...]"`.
  * Companion to ExplainCheck (which prints one summary line per query);
  * this one is for eyeballing specific operator shapes (TakeOrdered,
  * Window partitioning, exchange placement).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
