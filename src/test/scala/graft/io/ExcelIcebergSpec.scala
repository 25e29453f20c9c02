package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExcelIcebergSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("xlsx round-trip preserves values and infers column types") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-xlsx")
    val path = tmp.resolve("t.xlsx").toString
    val df = Seq(
      (1L, "alpha", 1.5, true, java.sql.Timestamp.valueOf("2024-03-01 10:30:00")),
      (2L, "beta <&> \"q\"", -2.25, false, java.sql.Timestamp.valueOf("2024-03-02 00:00:00")),
      (3L, "gamma", 0.0, true, java.sql.Timestamp.valueOf("2024-12-31 23:59:59"))
    ).toDF("id", "name", "x", "flag", "ts")
    Excel.exportExcel(df, path)
    assert(Excel.sheetNames(path) == Seq("Sheet1"))
    val back = Excel.importExcel(spark, path)
    assert(back.columns.toSeq == Seq("id", "name", "x", "flag", "ts"))
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("x").dataType.typeName == "double")
    assert(back.schema("flag").dataType.typeName == "boolean")
    assert(back.schema("ts").dataType.typeName == "timestamp")
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getString(1) == "beta <&> \"q\"")
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5, -2.25, 0.0))
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
    assert(rows(0).getTimestamp(4).toString == "2024-03-01 10:30:00.0")
    assert(rows(2).getTimestamp(4).toString == "2024-12-31 23:59:59.0")
  }

  test("xlsx import handles sparse cells and missing header names") {
    // hand-built sheet: a gap cell (B skipped on row 2) must become null
    val tmp = java.nio.file.Files.createTempDirectory("graft-xlsx2")
    val path = tmp.resolve("sparse.xlsx").toString
    val df = Seq(("a", Some(1L), "x"), ("b", None, "y"))
      .toDF("k", "v", "w")
    Excel.exportExcel(df, path)
    val back = Excel.importExcel(spark, path)
    val r = back.orderBy("k").collect()
    assert(r(0).getLong(1) == 1L && r(1).isNullAt(1))
    assert(r.map(_.getString(2)).toSeq == Seq("x", "y"))
  }

  test("iceberg export/import round-trip with append snapshots and time travel") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-iceberg")
    val dir = tmp.resolve("tbl").toString
    val d1 = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    val d2 = Seq((3L, "c", 3.5)).toDF("id", "name", "x")
    val s1 = Iceberg.exportIceberg(d1, dir)
    val s2 = Iceberg.exportIceberg(d2, dir)
    assert(Iceberg.snapshotIds(dir) == Seq(s1, s2))
    // current snapshot sees both appends
    val cur = Iceberg.importIceberg(spark, dir)
    assert(cur.count() == 3)
    assert(cur.agg(sum("id")).as[Long].head() == 6L)
    // time travel to the first snapshot sees only the first append
    val old = Iceberg.importIceberg(spark, dir, snapshotId = Some(s1))
    assert(old.count() == 2)
    assert(old.select("name").as[String].collect().sorted.toSeq == Seq("a", "b"))
    // metadata layer is spec-shaped: manifest list + manifest avro exist
    val mdir = new java.io.File(dir, "metadata")
    assert(mdir.listFiles().exists(_.getName.endsWith("-manifest-list.avro")))
    assert(mdir.listFiles().exists(_.getName.startsWith("manifest-")))
    assert(new java.io.File(mdir, "version-hint.text").exists())
  }

  test("iceberg import prunes columns and pushes filters to the parquet scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-iceberg2")
    val dir = tmp.resolve("tbl").toString
    Iceberg.exportIceberg(
      spark.range(1000).select(col("id"), (col("id") % 7).as("m"),
        concat(lit("r"), col("id")).as("s")), dir)
    val q = Iceberg.importIceberg(spark, dir)
      .filter(col("id") > 500).select("id", "m")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,500)"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("ReadSchema: struct<id:bigint,m:bigint,s:string>"),
      "column pruning failed — full schema read")
    assert(q.count() == 499)
  }
}
