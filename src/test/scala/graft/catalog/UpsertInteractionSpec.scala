package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit for the round-10 surfaces: the batch_update upsert
  * (if_not_exists='insert') crossed with incremental views and ANN index
  * maintenance, and the re-add-after-drop column mapping crossed with
  * compaction and revert — the features each compose with the catalog
  * machinery that must stay consistent underneath them.
  */
class UpsertInteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-upsx").toString)

  test("upsert × incremental view: both legs (update + insert) sync exactly once") {
    val cat = newCat()
    val base = GraftTable.create(spark, cat, "ub", Seq(
      ColumnDef("id", "bigint"), ColumnDef("text", "string")))
    base.insert(Seq((1L, "a b"), (2L, "c d e")).toDF("id", "text"))
    val view = Views.createComponentView(spark, cat, "utok", base,
      "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
    assert(view.read().count() == 5)

    // upsert: id=2 rewrites (update leg), id=3 inserts (insert leg)
    base.batchUpdateStatus(
      Seq((2L, "x"), (3L, "p q r s")).toDF("id", "text"), Seq("id"),
      ifNotExists = "insert")
    val st = Views.syncComponentViewStatus(view, base,
      "split(text, '\\\\s+')", "token", Seq("id"))
    // update leg: 3 old tokens out, 1 new in; insert leg: 4 in
    assert(st.rowsDeleted == 3 && st.rowsInserted == 5, s"$st")
    val toks = view.read().select("id", "token").as[(Long, String)]
      .collect().toSet
    assert(toks == Set((1L, "a"), (1L, "b"), (2L, "x"),
      (3L, "p"), (3L, "q"), (3L, "r"), (3L, "s")))
    // a second sync is a no-op: both legs were consumed exactly once
    val st2 = Views.syncComponentViewStatus(view, base,
      "split(text, '\\\\s+')", "token", Seq("id"))
    assert(st2.rowsDeleted == 0 && st2.rowsInserted == 0, s"$st2")
  }

  test("upsert × ANN index: updated vector re-ranks, upserted vector searchable") {
    val cat = newCat()
    def vec(a: Double, b: Double): Seq[Double] = Seq(a, b)
    val t = GraftTable.create(spark, cat, "uv", Seq(
      ColumnDef("id", "bigint"), ColumnDef("emb", "array<double>")))
    t.insert(Seq((1L, vec(1, 0)), (2L, vec(0, 1))).toDF("id", "emb"))
    t.createHnswIndex("ux", "emb", "id")
    // upsert: id=2 moves near (1,0), id=3 lands exactly on the query
    t.batchUpdateStatus(
      Seq((2L, vec(0.9, 0.1)), (3L, vec(0.6, 0.8)))
        .toDF("id", "emb"), Seq("id"), ifNotExists = "insert")
    val hits = t.searchIndex("ux", vec(0.6, 0.8), 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits.head == 3L, s"upserted row must rank first: $hits")
    assert(hits.toSet == Set(1L, 2L, 3L))
  }

  test("re-add after drop × compact × revert: every epoch reads its own data") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "rx", Seq(
      ColumnDef("id", "bigint"), ColumnDef("x", "double")))
    t.insert(Seq((1L, 5.0), (2L, 6.0)).toDF("id", "x"))
    val vOld = t.currentVersion
    val vDrop = t.dropColumn("x")
    t.addColumn(ColumnDef("x", "double", Some("id * 100.0")))
    // compaction rewrites the physical layout under the NEW mapping
    t.compact(targetFiles = 1)
    assert(t.read().orderBy("id").select("x").as[Double].collect().toSeq
      == Seq(100.0, 200.0))
    // compaction keeps prior manifests: pre-drop time travel reads old x
    assert(t.read(Some(vOld)).orderBy("id").select("x").as[Double]
      .collect().toSeq == Seq(5.0, 6.0))
    // at the drop version the column does not exist
    assert(!t.read(Some(vDrop)).columns.contains("x"))
    // revert to before the drop: old x live again, the re-added def gone
    t.revert(vOld)
    val m = t.meta
    assert(m.liveColumns.count(_.name == "x") == 1)
    assert(m.liveColumns.find(_.name == "x").get.computedExpr.isEmpty)
    assert(t.read().orderBy("id").select("x").as[Double].collect().toSeq
      == Seq(5.0, 6.0))
    // and the table still takes writes with the restored schema
    t.insert(Seq((3L, 7.0)).toDF("id", "x"))
    assert(t.read().count() == 3)
  }
}
