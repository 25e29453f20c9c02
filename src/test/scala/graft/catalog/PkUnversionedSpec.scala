package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Primary-key unique constraint (reference tests/test_primary_key_index
  * .py: the partial unique B-tree over LIVE rows) and unversioned tables
  * (reference tests/test_unversioned_table.py: `_is_versioned=False` —
  * no history retained, time travel / revert / snapshots refuse).
  */
class PkUnversionedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-pk").toString)

  test("single PK: rejects duplicates, re-insert after delete, survives reload") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "pk1", Seq(
      ColumnDef("id", "bigint"), ColumnDef("name", "string")),
      primaryKey = Seq("id"))
    t.insert(Seq((1L, "alice"), (2L, "bob")).toDF("id", "name"))
    // duplicate vs live rows
    val e1 = intercept[IllegalArgumentException] {
      t.insert(Seq((1L, "charlie")).toDF("id", "name"))
    }
    assert(e1.getMessage.contains("Duplicate primary key"))
    assert(t.read().count() == 2)
    assert(t.read().where("id = 1").select("name").head().getString(0) == "alice")
    // intra-batch duplicate
    val e2 = intercept[IllegalArgumentException] {
      t.insert(Seq((7L, "x"), (7L, "y")).toDF("id", "name"))
    }
    assert(e2.getMessage.contains("Duplicate primary key"))
    // partial-index semantics: a deleted key is immediately reusable
    t.delete("id = 1")
    t.insert(Seq((1L, "charlie")).toDF("id", "name"))
    assert(t.read().orderBy("id").select("name").as[String].collect().toSeq
      == Seq("charlie", "bob"))
    // enforcement survives reopen (constraint lives in persisted meta)
    val t2 = GraftTable.open(spark, cat, "pk1")
    val e3 = intercept[IllegalArgumentException] {
      t2.insert(Seq((1L, "dupe")).toDF("id", "name"))
    }
    assert(e3.getMessage.contains("Duplicate primary key"))
    t2.insert(Seq((3L, "dave")).toDF("id", "name"))
    assert(t2.read().count() == 3)
    assert(t2.tableMetadata.primaryKey == Seq("id"))
  }

  test("composite PK: partial matches fine, exact matches rejected") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "pk2", Seq(
      ColumnDef("a", "bigint"), ColumnDef("b", "string"),
      ColumnDef("v", "double")), primaryKey = Seq("a", "b"))
    t.insert(Seq((1L, "x", 0.5), (1L, "y", 0.6), (2L, "x", 0.7))
      .toDF("a", "b", "v"))
    val e = intercept[IllegalArgumentException] {
      t.insert(Seq((1L, "x", 9.9)).toDF("a", "b", "v"))
    }
    assert(e.getMessage.contains("Duplicate primary key"))
    assert(t.read().count() == 3)
    // updating VALUES through the pk is fine; updating the pk itself isn't
    t.batchUpdate(Seq((1L, "x", 1.5)).toDF("a", "b", "v"), Seq("a", "b"))
    assert(t.read().where("a = 1 AND b = 'x'").select("v").head().getDouble(0) == 1.5)
    val e2 = intercept[IllegalArgumentException] {
      t.update(Map("a" -> "a + 10"), "b = 'x'")
    }
    assert(e2.getMessage.contains("primary key"))
  }

  test("pk validation at create: missing and computed columns refuse") {
    val cat = newCat()
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, cat, "bad1", Seq(ColumnDef("x", "bigint")),
        primaryKey = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, cat, "bad2", Seq(
        ColumnDef("x", "bigint"), ColumnDef("y", "bigint", Some("x + 1"))),
        primaryKey = Seq("y"))
    }
  }

  test("unversioned table: DML works, history squashes, time ops refuse") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "uv", Seq(
      ColumnDef("c0", "bigint"), ColumnDef("c1", "string")),
      isVersioned = false)
    assert(!t.tableMetadata.isVersioned)
    t.insert(Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("c0", "c1"))
    assert(t.read().count() == 3)
    t.delete("c0 = 0")
    assert(t.read().orderBy(col("c0").desc).select("c1").as[String]
      .collect().toSeq == Seq("c", "b"))
    // the version log holds ONLY the live image
    assert(t.history().count() == 1)
    // time travel, revert, snapshots all refuse with a clear message
    val v = t.currentVersion
    assert(intercept[IllegalArgumentException] { t.read(Some(v - 1)).count() }
      .getMessage.contains("unversioned"))
    assert(intercept[IllegalArgumentException] { t.revert(v - 1) }
      .getMessage.contains("unversioned"))
    assert(intercept[IllegalArgumentException] { t.createSnapshot("s") }
      .getMessage.contains("unversioned"))
    // reading the CURRENT version explicitly stays allowed
    assert(t.read(Some(t.currentVersion)).count() == 2)
    // superseded files are vacuumed: all on-disk part files are reachable
    assert(t.vacuum().isEmpty)
    // survives reopen
    val t2 = GraftTable.open(spark, cat, "uv")
    assert(!t2.tableMetadata.isVersioned && t2.read().count() == 2)
  }

  test("concurrent inserts: disjoint keys all land; duplicate key loses exactly once") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "pkc", Seq(
      ColumnDef("id", "bigint"), ColumnDef("w", "string")),
      primaryKey = Seq("id"), isVersioned = false)
    // 4 writers, disjoint key ranges — the writer lock serializes the
    // check+write windows, so every batch lands
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map(i => new Thread(() =>
      try t.insert(Seq((i * 10L, s"a$i"), (i * 10L + 1, s"b$i")).toDF("id", "w"))
      catch { case e: Throwable => errs.add(e) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"disjoint inserts failed: $errs")
    assert(t.read().count() == 8)
    // 3 writers racing on the SAME key — exactly one wins, the rest see
    // the constraint against committed state inside the lock
    val dupErrs = new java.util.concurrent.atomic.AtomicInteger()
    val racers = (0 until 3).map(i => new Thread(() =>
      try t.insert(Seq((999L, s"racer$i")).toDF("id", "w"))
      catch { case e: IllegalArgumentException
        if e.getMessage.contains("Duplicate primary key") =>
          dupErrs.incrementAndGet() }))
    racers.foreach(_.start()); racers.foreach(_.join())
    assert(dupErrs.get() == 2)
    assert(t.read().where("id = 999").count() == 1)
    assert(t.history().count() == 1) // squash held throughout
  }

  test("unversioned + primary key compose; computed columns still flow") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "uvpk", Seq(
      ColumnDef("id", "bigint"), ColumnDef("x", "double"),
      ColumnDef("x2", "double", Some("x * 2"))),
      primaryKey = Seq("id"), isVersioned = false)
    t.insert(Seq((1L, 1.5), (2L, 2.5)).toDF("id", "x"))
    intercept[IllegalArgumentException] {
      t.insert(Seq((2L, 9.9)).toDF("id", "x"))
    }
    t.batchUpdate(Seq((2L, 4.0)).toDF("id", "x"), Seq("id"))
    val r = t.read().orderBy("id").select("x2").as[Double].collect().toSeq
    assert(r == Seq(3.0, 8.0))
    assert(t.history().count() == 1)
  }
}
