package graft.plans

import graft.TestSpark
import graft.catalog.{Catalog, ColumnDef, GraftTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql` over graft tables via the injected resolution rule
  * (GraftExtensions / GraftRelationRule): plain names, time travel,
  * snapshots, nested paths, joins with non-graft relations, and clean
  * fall-through for unknown names.
  */
class SqlRelationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshWarehouse(): Catalog = {
    val c = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-sqlwh").toString)
    spark.conf.set("spark.graft.warehouse", c.warehouse)
    c
  }

  private val cols = Seq(ColumnDef("id", "bigint"), ColumnDef("name", "string"))

  test("SELECT over a graft table resolves to the current version") {
    val cat = freshWarehouse()
    val t = GraftTable.create(spark, cat, "people", cols)
    t.insert(Seq((1L, "ada"), (2L, "bob")).toDF("id", "name"))
    val out = spark.sql("SELECT name FROM graft.people ORDER BY id")
      .as[String].collect().toSeq
    assert(out == Seq("ada", "bob"))
  }

  test("time travel via @vN and named snapshots via @name") {
    val cat = freshWarehouse()
    val t = GraftTable.create(spark, cat, "tt", cols)
    val v1 = t.insert(Seq((1L, "one")).toDF("id", "name"))
    t.createSnapshot("first")
    t.insert(Seq((2L, "two")).toDF("id", "name"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.tt").as[Long].head() == 2L)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`tt@v$v1`")
      .as[Long].head() == 1L)
    assert(spark.sql("SELECT name FROM graft.`tt@first`")
      .as[String].collect().toSeq == Seq("one"))
  }

  test("nested directory paths and joins with temp views work in one query") {
    val cat = freshWarehouse()
    cat.createDir("warehouse1")
    val t = GraftTable.create(spark, cat, "warehouse1/stock", cols)
    t.insert(Seq((1L, "bolt"), (2L, "nut")).toDF("id", "name"))
    Seq((1L, 10), (2L, 3)).toDF("id", "qty").createOrReplaceTempView("qty")
    val out = spark.sql(
      """SELECT s.name, q.qty FROM graft.`warehouse1/stock` s
        |JOIN qty q ON s.id = q.id ORDER BY s.id""".stripMargin)
      .as[(String, Int)].collect().toSeq
    assert(out == Seq(("bolt", 10), ("nut", 3)))
  }

  test("@-suffix edge cases: snapshot named vN, huge digits, literal @ in table name") {
    val cat = freshWarehouse()
    val t = GraftTable.create(spark, cat, "edge", cols)
    t.insert(Seq((1L, "one")).toDF("id", "name"))
    // a snapshot literally named "v99": version 99 doesn't exist, so the
    // suffix must fall through to snapshot resolution (r5-ADVICE: the
    // v\d+ pattern used to unconditionally mean time travel)
    t.createSnapshot("v99")
    t.insert(Seq((2L, "two")).toDF("id", "name"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.`edge@v99`")
      .as[Long].head() == 1L)
    // >19-digit version: must be a clean table-not-found, not a
    // NumberFormatException escaping the analyzer
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft.`edge@v99999999999999999999`").collect())
    assert(!e1.isInstanceOf[NumberFormatException])
    // unknown snapshot name: clean analysis error too
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft.`edge@nosuch`").collect())
    assert(e2.getMessage.contains("edge") ||
      e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    // '@' in a table NAME is rejected at creation (Catalog.validatePath),
    // so the resolver's '@' split can never mis-parse a real table; the
    // resolver additionally tries the whole spec as a table name first in
    // case an out-of-band warehouse contains one
    intercept[IllegalArgumentException](GraftTable.create(spark, cat, "a@b", cols))
  }

  test("unknown names fall through to the normal analysis error") {
    freshWarehouse()
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.nope").collect())
    assert(e.getMessage.contains("nope") ||
      e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }

  test("filters over SQL-resolved relations push down to the parquet scan") {
    val cat = freshWarehouse()
    val t = GraftTable.create(spark, cat, "pd",
      Seq(ColumnDef("id", "bigint"), ColumnDef("v", "bigint")))
    t.insert((1L to 100L).map(i => (i, i * 2)).toDF("id", "v"))
    val df = spark.sql("SELECT v FROM graft.pd WHERE id = 7")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("id"),
      s"no pushdown in:\n$scan")
    assert(df.as[Long].collect().toSeq == Seq(14L))
  }
}
