package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stats-pruning proofs. The honest metric is the SCAN node's
  * numOutputRows — rows the parquet reader actually materialized after
  * row-group/page skipping via pushed min/max filters. `numFiles` is NOT
  * a pruning signal in vanilla Spark: the planner never reads footers, so
  * it only reflects how many files the layout produced (and AQE coalesces
  * a small clustered shuffle into very few files, which once made a
  * numFiles-based "proof" here pass for the wrong reason).
  */
class PruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** rows the parquet scan materialized for a point filter on `c` */
  private def scanRows(path: String, c: String, v: Long): Long = {
    val scan = spark.read.parquet(path).filter(col(c) === v)
    assert(scan.collect().length == 1) // execute THIS plan so metrics fill
    val leaf = scan.queryExecution.executedPlan.collectLeaves().head
    leaf.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
  }

  test("clustered layout prunes row groups on the cluster key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val df = (1L to 200000L).map(i => (i, s"payload-$i")).toDF("k", "v")
    // clustered: range-partitioned + sorted → tight per-row-group stats on k
    Skew.clusterForPruningN(df.repartition(8), 8, "k")
      .write.mode("overwrite").parquet(s"$dir/clustered")
    // shuffled: k spread over every row group → nothing skippable
    df.repartition(8).write.mode("overwrite").parquet(s"$dir/shuffled")

    val clustered = scanRows(s"$dir/clustered", "k", 123456L)
    val shuffled = scanRows(s"$dir/shuffled", "k", 123456L)
    info(s"scan rows: clustered=$clustered shuffled=$shuffled of 200000")
    assert(clustered * 4 <= shuffled,
      s"clustering did not prune: $clustered vs $shuffled")
  }

  test("zvalue interleaves quantile-bucket bits column-major") {
    // 2 buckets / 1 bit per column, cuts at 5.0: bucket = (v > 5)
    def z(cuts: Seq[Seq[Double]], vals: Double*): Long =
      Seq(vals).toDF("v")
        .select(graft.plans.ZOrderNative.zvalue(spark, col("v"), cuts))
        .collect().head.getLong(0)
    val one = Seq(Seq(5.0), Seq(5.0))
    assert(z(one, 3.0, 3.0) == 0L)
    assert(z(one, 7.0, 3.0) == 1L) // x bit at position 0
    assert(z(one, 3.0, 7.0) == 2L) // y bit at position 1
    assert(z(one, 7.0, 7.0) == 3L)
    // 4 buckets / 2 bits: x=5 → bucket 2 (binary 10) → bit 1 lands at
    // interleaved position 1*2+0 = 2 → z = 4
    val two = Seq(Seq(2.0, 4.0, 6.0), Seq(2.0, 4.0, 6.0))
    assert(z(two, 5.0, 1.0) == 4L)
    assert(z(two, 1.0, 5.0) == 8L)
    assert(z(two, 7.0, 7.0) == 15L)
  }

  test("z-order layout prunes scans on EVERY z-column, not just a prefix") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // two INDEPENDENT keys (y = deterministic pseudo-random permutation of
    // x's range): sorting by x leaves y uniform within every file
    val df = (1L to 200000L).map(i => (i, (i * 48271L) % 200003L, s"p$i"))
      .toDF("x", "y", "v")
    Skew.clusterForPruningN(df.repartition(64), 64, "x")
      .write.mode("overwrite").parquet(s"$dir/xonly")
    ZOrder.cluster(df.repartition(64), Seq("x", "y"), numBuckets = 256,
        partitions = 64)
      .write.mode("overwrite").parquet(s"$dir/zorder")

    val total = 200000L
    val zX = scanRows(s"$dir/zorder", "x", 123456L)
    val zY = scanRows(s"$dir/zorder", "y", 123456L)
    val xonlyX = scanRows(s"$dir/xonly", "x", 123456L)
    val xonlyY = scanRows(s"$dir/xonly", "y", 123456L)
    info(s"scan rows of $total: zorder x=$zX y=$zY; x-clustered x=$xonlyX y=$xonlyY")
    // z-order: BOTH columns prune (each file covers ~1/8 of each domain;
    // row-group boundary slop keeps the measured read above the ideal)
    assert(zX * 3 <= total, s"z-order did not prune on x: $zX of $total")
    assert(zY * 3 <= total, s"z-order did not prune on y: $zY of $total")
    // single-column clustering cannot prune the second column at all
    assert(zY * 2 <= xonlyY, s"z-order y=$zY not better than x-only y=$xonlyY")
  }
}
