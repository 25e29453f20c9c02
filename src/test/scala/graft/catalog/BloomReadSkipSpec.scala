package graft.catalog

import graft.TestSpark
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** END-TO-END bloom pruning proof: a point lookup for an absent digest on
  * a bloom-compacted table must READ (almost) no rows — parquet-mr's
  * BLOOMFILTER row-group level rejects every group, which task
  * InputMetrics.recordsRead makes observable. The control table (same
  * data, compacted WITHOUT blooms) reads everything: the digests are
  * unique random hex, so min/max statistics span the probe and cannot
  * prune, and plain encoding leaves no dictionary filter. This is the
  * read-side half of q161's write-side contract.
  */
class BloomReadSkipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recordsRead(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          acc.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // the listener bus is async (and private); poll until the counter
      // stabilizes instead of waiting on it directly
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 15000) {
        Thread.sleep(200); waited += 200
        val cur = acc.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.get()
  }

  private def mkTable(name: String, bloom: Boolean): GraftTable = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory(s"graft-$name").toString)
    val t = GraftTable.create(spark, cat, name, Seq(
      ColumnDef("k", "bigint"), ColumnDef("h", "string")))
    t.insert((0L until 4096L).map(i => (i,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"present-$i")))
      .toDF("k", "h").repartition(4))
    if (bloom)
      t.compact(targetFiles = 4, bloomFilterCols = Seq("h"),
        bloomFilterNdv = 2048)
    else t.compact(targetFiles = 4)
    t
  }

  test("absent-digest lookup reads ~0 rows with blooms, everything without") {
    val withBloom = mkTable("brs1", bloom = true)
    val control = mkTable("brs2", bloom = false)
    // absent probes INSIDE the hex range — md5 of keys never inserted —
    // so min/max statistics cannot reject them on either table
    val absent = (0 until 4).map(i =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"absent-$i"))

    def lookupRows(t: GraftTable): Long = recordsRead {
      absent.foreach { h =>
        assert(t.read().filter(col("h") === h).count() == 0)
      }
    }
    val readBloom = lookupRows(withBloom)
    val readControl = lookupRows(control)
    // the control scans every row group for every probe (stats span the
    // probes); the bloom table rejects all groups at the footer
    assert(readControl >= 4096L * absent.size,
      s"control read $readControl rows — fixture no longer stats-opaque?")
    assert(readBloom <= readControl / 10,
      s"bloom table read $readBloom rows vs control $readControl — " +
        "row-group bloom pruning is not engaging")
    // present key still found (no false negatives end-to-end)
    val h77 = org.apache.commons.codec.digest.DigestUtils.md5Hex("present-77")
    assert(withBloom.read().filter(col("h") === h77)
      .select("k").as[Long].head() == 77L)
  }
}
