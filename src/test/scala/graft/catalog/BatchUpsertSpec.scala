package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's full `batch_update` surface (`catalog/table.py:978-1022`,
  * `catalog/table_version.py:1160-1206`) and `recompute_columns(errors_only)`
  * (`catalog/table.py:1031-1040`):
  *
  *  - `if_not_exists='error'` (the default) raises with the unmatched count
  *    and commits nothing for those rows;
  *  - `'ignore'` skips unmatched rows silently;
  *  - `'insert'` upserts them — computed columns evaluate like `insert`,
  *    unprovided stored columns land as typed nulls, and the UpdateStatus
  *    sums the update and insert legs (`result += insert_status`);
  *  - `cascade=False` leaves dependent computed columns stale;
  *  - `return_rows=True` carries the affected rows' new stored values;
  *  - `errors_only=True` recomputes only rows whose named column is in
  *    error state, and refuses multiple columns.
  */
class BatchUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog() =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-ups").toString)

  private val cols = Seq(
    ColumnDef("id", "bigint"),
    ColumnDef("name", "string"),
    ColumnDef("score", "double"),
    ColumnDef("score2", "double", computedExpr = Some("score * 2")))

  private def seeded(name: String): GraftTable = {
    val t = GraftTable.create(spark, freshCatalog(), name, cols)
    t.insert(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "score"))
    t
  }

  test("ifNotExists=error (default): unmatched keys raise with count, nothing committed") {
    val t = seeded("ups_err")
    val v0 = t.currentVersion
    val ex = intercept[NoSuchElementException] {
      t.batchUpdate(Seq((2L, 20.0), (8L, 80.0), (9L, 90.0)).toDF("id", "score"),
        Seq("id"))
    }
    assert(ex.getMessage.contains("2 row(s) not found"))
    assert(t.currentVersion == v0) // probe failed before any rewrite
    assert(t.read().where(col("score") === 20.0).count() == 0)
  }

  test("ifNotExists=ignore: unmatched keys skipped, matched rows update") {
    val t = seeded("ups_ign")
    val st = t.batchUpdateStatus(
      Seq((2L, 20.0), (8L, 80.0)).toDF("id", "score"), Seq("id"),
      ifNotExists = "ignore")
    assert(st.numRows == 1)
    assert(t.read().count() == 3)
    val r2 = t.read().where(col("id") === 2).head()
    assert(r2.getAs[Double]("score") == 20.0 && r2.getAs[Double]("score2") == 40.0)
  }

  test("ifNotExists=insert: upsert — matched update, unmatched insert with computed + null fill") {
    val t = seeded("ups_ins")
    val st = t.batchUpdateStatus(
      Seq((2L, 20.0), (8L, 80.0), (9L, 90.0)).toDF("id", "score"), Seq("id"),
      ifNotExists = "insert")
    // status sums the two legs like the reference's `result += insert_status`
    assert(st.numRows == 3)
    assert(st.numComputedValues == 3) // 1 cascaded + 2 inserted × score2
    assert(st.updatedCols.contains("score") && st.updatedCols.contains("score2"))
    val img = t.read().orderBy("id").collect()
    assert(img.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 8L, 9L))
    val by = img.map(r => r.getAs[Long]("id") -> r).toMap
    assert(by(2L).getAs[Double]("score") == 20.0 && by(2L).getAs[Double]("score2") == 40.0)
    assert(by(8L).getAs[Double]("score") == 80.0 && by(8L).getAs[Double]("score2") == 160.0)
    assert(by(8L).isNullAt(by(8L).fieldIndex("name"))) // unprovided column → null
    // two versions, like the reference's update-then-insert inside one xact:
    // time travel between them sees the update but not the inserts
    val vIns = t.currentVersion
    val mid = t.read(Some(vIns - 1))
    assert(mid.count() == 3 &&
      mid.where(col("id") === 2 && col("score") === 20.0).count() == 1)
  }

  test("upsert on an UNVERSIONED table: insert leg survives the squash-vacuum") {
    // the update leg rewrites touched files and squashIfUnversioned()
    // vacuums the superseded ones BEFORE the insert leg runs — the
    // unmatched rows must be materialized up front, or the insert
    // re-evaluates a plan over deleted files (FileNotFoundException)
    val t = GraftTable.create(spark, freshCatalog(), "ups_unver", cols,
      isVersioned = false)
    t.insert(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "score"))
    val st = t.batchUpdateStatus(
      Seq((2L, 20.0), (8L, 80.0), (9L, 90.0)).toDF("id", "score"), Seq("id"),
      ifNotExists = "insert")
    assert(st.numRows == 3)
    val by = t.read().collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(by.keySet == Set(1L, 2L, 3L, 8L, 9L))
    assert(by(2L).getAs[Double]("score") == 20.0 && by(2L).getAs[Double]("score2") == 40.0)
    assert(by(8L).getAs[Double]("score") == 80.0 && by(8L).getAs[Double]("score2") == 160.0)
    assert(by(9L).getAs[Double]("score") == 90.0)
  }

  test("upsert into an empty table inserts everything") {
    val t = GraftTable.create(spark, freshCatalog(), "ups_empty", cols)
    val st = t.batchUpdateStatus(
      Seq((1L, 1.0)).toDF("id", "score"), Seq("id"), ifNotExists = "insert")
    assert(st.numRows == 1 && t.read().count() == 1)
    assert(t.read().head().getAs[Double]("score2") == 2.0)
  }

  test("upsert respects a primary key (unmatched keys are not live, so insert is legal)") {
    val t = GraftTable.create(spark, freshCatalog(), "ups_pk", cols,
      primaryKey = Seq("id"))
    t.insert(Seq((1L, "a", 1.0)).toDF("id", "name", "score"))
    t.delete("id = 1") // key 1 dead → reusable
    val st = t.batchUpdateStatus(
      Seq((1L, 10.0)).toDF("id", "score"), Seq("id"), ifNotExists = "insert")
    assert(st.numRows == 1)
    assert(t.read().where(col("id") === 1 && col("score") === 10.0).count() == 1)
  }

  test("cascade=false leaves dependent computed columns stale (update and batchUpdate)") {
    val t = seeded("ups_nocasc")
    t.updateStatus(Map("score" -> "100.0"), "id = 1", cascade = false)
    val r1 = t.read().where(col("id") === 1).head()
    assert(r1.getAs[Double]("score") == 100.0 && r1.getAs[Double]("score2") == 2.0)
    val st = t.batchUpdateStatus(Seq((2L, 200.0)).toDF("id", "score"), Seq("id"),
      cascade = false)
    assert(st.numComputedValues == 0 && st.updatedCols == Seq("score"))
    val r2 = t.read().where(col("id") === 2).head()
    assert(r2.getAs[Double]("score") == 200.0 && r2.getAs[Double]("score2") == 4.0)
  }

  test("returnRows=true carries new stored values for updated AND upserted rows") {
    val t = seeded("ups_rows")
    val st = t.batchUpdateStatus(
      Seq((3L, 30.0), (7L, 70.0)).toDF("id", "score"), Seq("id"),
      ifNotExists = "insert", returnRows = true)
    val rows = st.rows.get.map(m => m("id").asInstanceOf[Long] -> m).toMap
    assert(rows.keySet == Set(3L, 7L))
    assert(rows(3L)("score") == 30.0 && rows(3L)("score2") == 60.0)
    assert(rows(7L)("score") == 70.0 && rows(7L)("score2") == 140.0)
    assert(rows(7L)("name") == null)
    // default: no collect, rows stays None
    assert(t.batchUpdateStatus(Seq((1L, 1.5)).toDF("id", "score"), Seq("id"))
      .rows.isEmpty)
  }

  test("insertStatus(returnRows): inserted rows' stored values, computed included") {
    val t = GraftTable.create(spark, freshCatalog(), "ins_rows", cols)
    val st = t.insertStatus(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "score"),
      returnRows = true)
    val rows = st.rows.get.map(m => m("id").asInstanceOf[Long] -> m).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L)("score2") == 2.0 && rows(2L)("name") == "b")
    assert(t.insertStatus(Seq((3L, "c", 3.0)).toDF("id", "name", "score"))
      .rows.isEmpty)
  }

  test("updating a computed column directly raises (update and batchUpdate)") {
    val t = seeded("ups_comp")
    intercept[IllegalArgumentException] {
      t.update(Map("score2" -> "1.0"), "id = 1")
    }
    intercept[IllegalArgumentException] {
      t.batchUpdate(Seq((1L, 1.0)).toDF("id", "score2"), Seq("id"))
    }
  }

  test("batch update by _rowid pseudo-column: addressed rows update, identity stable") {
    val t = seeded("ups_rowid")
    val byId = t.readWithSystem().select(col("id"), col("_rowid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val st = t.batchUpdateStatus(
      Seq((byId(2L), 22.0)).toDF("_rowid", "score"), Seq("_rowid"),
      returnRows = true)
    assert(st.numRows == 1)
    val r2 = t.read().where(col("id") === 2).head()
    assert(r2.getAs[Double]("score") == 22.0 && r2.getAs[Double]("score2") == 44.0)
    // the returned row carries the SAME _rowid (update preserves identity)
    assert(st.rows.get.head("_rowid") == byId(2L))
    // a missing rowid raises under the default error mode...
    intercept[NoSuchElementException] {
      t.batchUpdate(Seq((999999L, 1.0)).toDF("_rowid", "score"), Seq("_rowid"))
    }
    // ...and insert mode refuses rowid keys outright
    intercept[IllegalArgumentException] {
      t.batchUpdateStatus(Seq((999999L, 1.0)).toDF("_rowid", "score"),
        Seq("_rowid"), ifNotExists = "insert")
    }
  }

  test("recomputeColumns(errorsOnly): only error-state rows rewrite; multi-column refused") {
    val t = GraftTable.create(spark, freshCatalog(), "ups_errs", Seq(
      ColumnDef("id", "bigint"),
      ColumnDef("x", "double"),
      // cellmd-style computed struct: errortype set when x <= 0
      ColumnDef("res", "struct<val:double,errortype:string>", computedExpr =
        Some("named_struct('val', CASE WHEN x > 0 THEN 10 / x END, " +
          "'errortype', CASE WHEN x <= 0 THEN 'ValueError' END)")),
      ColumnDef("y", "double", computedExpr = Some("x * 2"))))
    t.insert(Seq((1L, 2.0), (2L, 0.0), (3L, 4.0)).toDF("id", "x"))
    // fix the bad input WITHOUT cascading: res stays stale (errortype set)
    t.updateStatus(Map("x" -> "5.0"), "id = 2", cascade = false)
    // make a NON-error row stale too — errorsOnly must not touch it
    t.updateStatus(Map("x" -> "1.0"), "id = 3", cascade = false)
    t.recomputeColumns(Seq("res"), errorsOnly = true)
    val by = t.read().collect().map(r => r.getAs[Long]("id") -> r).toMap
    val res2 = by(2L).getStruct(by(2L).fieldIndex("res"))
    assert(res2.getAs[Double]("val") == 2.0 && res2.isNullAt(1)) // healed
    val res3 = by(3L).getStruct(by(3L).fieldIndex("res"))
    assert(res3.getAs[Double]("val") == 2.5) // still stale: 10/4, not 10/1
    intercept[IllegalArgumentException] {
      t.recomputeColumns(Seq("res", "x"), errorsOnly = true)
    }
    // a computed column with no error surface refuses errorsOnly
    intercept[IllegalArgumentException] {
      t.recomputeColumns(Seq("y"), errorsOnly = true)
    }
  }
}
