package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-cdf").toString)

  private def events(df: DataFrame): Set[(Long, Long, String, Long)] =
    df.select(col("id"), col("_rowid"), col("_change_type"),
      col("_commit_version")).as[(Long, Long, String, Long)].collect().toSet

  test("insert/update/delete produce typed events; compaction produces none") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "cdf1", Seq(
      ColumnDef("id", "bigint"), ColumnDef("v", "double")))
    val v0 = t.currentVersion
    t.insert(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val v1 = t.currentVersion
    t.update(Map("v" -> "v * 10"), "id = 1")
    val v2 = t.currentVersion
    t.delete("id = 2")
    val v3 = t.currentVersion

    val feed = t.changeFeed(v0)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 2L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 1L), s"$byType")

    // update keeps _rowid; pre carries the old value, post the new
    val upd = feed.filter(col("_change_type").startsWith("update"))
      .select(col("_change_type"), col("_rowid"), col("v"),
        col("_commit_version")).collect()
    assert(upd.map(_.getLong(1)).distinct.length == 1)
    assert(upd.forall(_.getLong(3) == v2))
    val pre = upd.find(_.getString(0) == "update_preimage").get
    val post = upd.find(_.getString(0) == "update_postimage").get
    assert(pre.getDouble(2) == 1.0 && post.getDouble(2) == 10.0)

    // delete event carries the deleted image at the delete version
    val del = feed.filter(col("_change_type") === "delete").head()
    assert(del.getAs[Long]("id") == 2L &&
      del.getAs[Long]("_commit_version") == v3)

    // compaction (clustered or not) emits nothing
    t.compact(targetFiles = 1, clusterBy = Seq("id"))
    assert(t.changeFeed(v3).count() == 0)
    // and the historical window is unchanged by the rewrite
    assert(events(t.changeFeed(v0)) == events(feed))

    // window slicing: (v1, v2] sees only the update pair
    val mid = t.changeFeed(v1, Some(v2))
    assert(mid.select("_change_type").as[String].collect().sorted.toSeq
      == Seq("update_postimage", "update_preimage"))
  }

  test("replaying the feed reproduces the live table (random DML differential)") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "cdf2", Seq(
      ColumnDef("id", "bigint"), ColumnDef("v", "double")))
    val v0 = t.currentVersion
    val rnd = new scala.util.Random(42)
    var nextId = 0L
    (0 until 12).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 =>
          val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
            nextId += 1; (nextId, rnd.nextInt(100).toDouble)
          }
          t.insert(rows.toDF("id", "v"))
        case 1 if nextId > 0 =>
          t.update(Map("v" -> "v + 1000"), s"id = ${1 + rnd.nextInt(nextId.toInt)}")
        case 2 if nextId > 0 =>
          t.delete(s"id = ${1 + rnd.nextInt(nextId.toInt)}")
        case _ => ()
      }
    }
    val feed = t.changeFeed(v0)
    // replay: the LAST open event per rowid wins iff no later close;
    // i.e. live rows = opens minus (closes at the same or later version)
    val opens = feed.filter(col("_change_type").isin("insert", "update_postimage"))
      .groupBy("_rowid").agg(max(struct(col("_commit_version"), col("id"), col("v"))).as("s"))
      .select(col("_rowid"), col("s._commit_version").as("ov"),
        col("s.id").as("id"), col("s.v").as("v"))
    val closes = feed.filter(col("_change_type").isin("delete", "update_preimage"))
      .groupBy("_rowid").agg(max(col("_commit_version")).as("cv"))
    val replayed = opens.join(closes, Seq("_rowid"), "left")
      .filter(col("cv").isNull || col("cv") <= col("ov"))
      .select(col("id"), col("v"))
    val live = t.read().select(col("id"), col("v"))
    assert(replayed.exceptAll(live).count() == 0 &&
      live.exceptAll(replayed).count() == 0,
      "feed replay diverged from live table")
  }

  test("feed after revert reflects the truncated timeline") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "cdf3", Seq(
      ColumnDef("id", "bigint"), ColumnDef("v", "double")))
    val v0 = t.currentVersion
    t.insert(Seq((1L, 1.0)).toDF("id", "v"))
    val v1 = t.currentVersion
    t.insert(Seq((2L, 2.0)).toDF("id", "v"))
    t.delete("id = 1")
    t.revert(v1)
    val feed = t.changeFeed(v0)
    assert(events(feed).map(e => (e._1, e._3)) == Set((1L, "insert")))
    // post-revert DML reuses version numbers and still feeds correctly
    t.insert(Seq((3L, 3.0)).toDF("id", "v"))
    val after = t.changeFeed(v1)
    assert(after.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("batch upsert splits into an update pair and a plain insert") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "cdf5", Seq(
      ColumnDef("id", "bigint"), ColumnDef("v", "double")))
    val v0 = t.currentVersion
    t.insert(Seq((1L, 1.0)).toDF("id", "v"))
    val v1 = t.currentVersion
    // upsert: id=1 matches (update), id=2 doesn't (insert leg) — the
    // reference commits these as TWO versions (update, then insert)
    t.batchUpdate(Seq((1L, 9.0), (2L, 2.0)).toDF("id", "v"),
      Seq("id"), ifNotExists = "insert")
    val feed = t.changeFeed(v1)
    val got = feed.select(col("id"), col("_change_type"), col("v"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "update_preimage", 1.0),
      (1L, "update_postimage", 9.0), (2L, "insert", 2.0)), s"$got")
    // the two legs land at distinct versions, both inside (v1, current]
    val vs = feed.select("_commit_version").as[Long].collect().toSet
    assert(vs.size == 2 && vs.forall(v => v > v1 && v <= t.currentVersion))
    assert(events(t.changeFeed(v0)).count(_._3 == "insert") == 2)
  }

  test("schema evolution: preimages before add_column carry null for it") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "cdf6", Seq(
      ColumnDef("id", "bigint"), ColumnDef("v", "double")))
    val v0 = t.currentVersion
    t.insert(Seq((1L, 1.0)).toDF("id", "v"))
    t.addColumn(ColumnDef("w", "double"))
    t.update(Map("w" -> "v * 3"), "id = 1")
    val feed = t.changeFeed(v0)
    val byType = feed.select(col("_change_type"), col("w"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // the insert image predates `w` (parquet mergeSchema → null); the
    // update pair straddles it: preimage null, postimage the new value
    assert(byType == Map("insert" -> None, "update_preimage" -> None,
      "update_postimage" -> Some(3.0)), s"$byType")
  }

  test("unstored computed columns are inlined into pre/post images") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "cdf4", Seq(
      ColumnDef("id", "bigint"), ColumnDef("v", "double"),
      ColumnDef("v2", "double", computedExpr = Some("v * 2"), stored = false)))
    val v0 = t.currentVersion
    t.insert(Seq((1L, 5.0)).toDF("id", "v"))
    t.update(Map("v" -> "7.0"), "id = 1")
    val imgs = t.changeFeed(v0)
      .filter(col("_change_type").startsWith("update"))
      .select(col("_change_type"), col("v2")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(imgs == Map("update_preimage" -> 10.0, "update_postimage" -> 14.0))
  }
}
