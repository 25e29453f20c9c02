package graft.api

import graft.TestSpark
import graft.catalog.{Catalog, ColumnDef, GraftTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuerySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table(): GraftTable = {
    val cat = new Catalog(java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val t = GraftTable.create(spark, cat, "q", Seq(
      ColumnDef("id", "bigint"), ColumnDef("grp", "string"), ColumnDef("x", "double")))
    t.insert((1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 1.5))
      .toDF("id", "grp", "x"))
    t
  }

  test("where/select/orderBy/limit chain") {
    val rows = Query(table())
      .where("x > 30")
      .select(col("id"), col("x"))
      .orderBy(col("id"))
      .limit(3)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(21L, 22L, 23L))
  }

  test("groupBy/agg") {
    val rows = Query(table())
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), round(avg(col("x")), 2).as("mean_x"))
      .orderBy(col("grp"))
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("even", 50L), ("odd", 50L)))
  }

  test("head and tail follow insertion order") {
    val q = Query(table())
    assert(q.head(3).collect().map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    assert(q.tail(2).collect().map(_.getAs[Long]("id")).toSet == Set(99L, 100L))
  }

  test("samples are repeatable and seed-sensitive") {
    val q = Query(table())
    val s1 = q.sampleFraction(0.3, seed = 42).collect().map(_.getAs[Long]("id")).toSet
    val s2 = q.sampleFraction(0.3, seed = 42).collect().map(_.getAs[Long]("id")).toSet
    val s3 = q.sampleFraction(0.3, seed = 43).collect().map(_.getAs[Long]("id")).toSet
    assert(s1 == s2)        // repeatable
    assert(s1 != s3)        // seed changes the sample
    assert(s1.size > 10 && s1.size < 60) // roughly 30%

    assert(q.sampleN(7, seed = 1).count() == 7)
    val strat = q.sampleStratified(5, Seq(col("grp")), seed = 1)
    assert(strat.count() == 10) // 5 per stratum × 2 strata
  }

  test("stratified fraction sample: exact ceil(f·|stratum|) per stratum, repeatable") {
    val q = Query(table())
    val s1 = q.sampleStratifiedFraction(0.1, Seq(col("grp")), seed = 3)
      .collect().map(_.getAs[Long]("id")).toSet
    val s2 = q.sampleStratifiedFraction(0.1, Seq(col("grp")), seed = 3)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(s1 == s2, "not repeatable")
    // 50 rows per stratum → exactly ceil(0.1·50) = 5 per stratum
    val byGrp = q.sampleStratifiedFraction(0.1, Seq(col("grp")), seed = 3)
      .df.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp == Map("even" -> 5L, "odd" -> 5L), s"got $byGrp")
    // matches the reference's flat per-stratum window rank (the spec the
    // bucketed two-phase rank must reproduce exactly) — same sample key,
    // same source DataFrame
    val key = md5(concat_ws("___", lit("3"),
      col(graft.catalog.GraftTable.RowId).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(key)
    val flat = q.df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == flat, s"bucketed rank diverges from flat rank: ${s1.diff(flat)} / ${flat.diff(s1)}")
    // fraction 1.0 keeps everything; 0.0 keeps ceil(0)=0
    assert(q.sampleStratifiedFraction(1.0, Seq(col("grp"))).count() == 100)
    assert(q.sampleStratifiedFraction(0.0, Seq(col("grp"))).count() == 0)
  }
}
