package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit for the change data feed's scale contract: the
  * (fromVersion, toVersion] window filters on `_v_min`/`_v_max` must reach
  * the parquet scan as pushed filters (footer min/max then skip whole
  * files outside the window — versions correlate with files, so a narrow
  * feed window reads few files), and the whole feed must stay UDF-free
  * Column composition. A regression that materializes the images before
  * filtering (e.g. a cache or checkpoint ahead of the window predicate)
  * turns an incremental read into a full-history scan at 100 TB.
  */
class PlanAuditChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("window predicates push to the parquet footers; no UDFs") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-cdfplan").toString)
    val t = GraftTable.create(spark, cat, "plcdf", Seq(
      ColumnDef("id", "bigint"), ColumnDef("v", "double")))
    // several versions → several files, so pushdown has something to skip
    for (i <- 0 until 4)
      t.insert(Seq((i.toLong, i.toDouble)).toDF("id", "v"))
    val vPrev = t.currentVersion
    t.insert(Seq((99L, 99.0)).toDF("id", "v"))
    val feed = t.changeFeed(vPrev)
    val plan = feed.queryExecution.executedPlan.toString
    // both scan legs (opens on _v_min, closes on _v_max) push their
    // window predicate into the parquet source
    assert(plan.contains("GreaterThan(_v_min"),
      s"open-leg _v_min window not pushed:\n$plan")
    assert(plan.contains("GreaterThan(_v_max"),
      s"close-leg _v_max window not pushed:\n$plan")
    assert(plan.contains("PushedFilters"), plan)
    // pure Column composition end to end
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      plan)
    // exactly one shuffle class in the feed: the (_rowid, version)
    // update-pairing window — no extra repartitions snuck in
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"unexpected shuffles ($exchanges):\n$plan")
    // and the narrow window indeed yields just the one insert
    val rows = feed.select(col("id"), col("_change_type"))
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((99L, "insert")))
  }
}
