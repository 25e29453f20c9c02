package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clustered layout prunes row groups on the cluster key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val df = (1L to 200000L).map(i => (i, s"payload-$i")).toDF("k", "v")
    // clustered: range-partitioned + sorted → tight per-file min/max on k
    Skew.clusterForPruning(df.repartition(8), "k")
      .write.mode("overwrite").parquet(s"$dir/clustered")
    // shuffled: k spread over every file → no file can be skipped
    df.repartition(8).write.mode("overwrite").parquet(s"$dir/shuffled")

    def filesRead(path: String): Long = {
      val scan = spark.read.parquet(path).filter(col("k") === 123456L)
      assert(scan.collect().length == 1) // execute THIS plan so metrics fill
      val leaf = scan.queryExecution.executedPlan.collectLeaves().head
      leaf.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    }
    val clustered = filesRead(s"$dir/clustered")
    val shuffled = filesRead(s"$dir/shuffled")
    info(s"files read: clustered=$clustered shuffled=$shuffled")
    assert(clustered < shuffled, s"clustering did not prune: $clustered vs $shuffled")
  }
}
