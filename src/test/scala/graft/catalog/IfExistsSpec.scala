package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's `if_exists` collision directives (`catalog/catalog.py:
  * 2872-2958` `_handle_path_collision`, `catalog/table.py:363-368` for
  * add_column): error / ignore / replace / replace_force on create_table,
  * create_view and add_column — plus the re-add-after-drop column-mapping
  * machinery the replace path depends on.
  */
class IfExistsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog() =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-ifex").toString)

  private val cols = Seq(
    ColumnDef("id", "bigint"),
    ColumnDef("x", "double"),
    ColumnDef("x2", "double", computedExpr = Some("x * 2")))

  test("create_table if_exists: error/ignore/replace/replace_force") {
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "t", cols)
    t.insert(Seq((1L, 1.0)).toDF("id", "x"))
    // error (default)
    intercept[IllegalArgumentException] { GraftTable.create(spark, cat, "t", cols) }
    // ignore: the EXISTING handle, data intact, schema not compared
    val same = GraftTable.create(spark, cat, "t",
      Seq(ColumnDef("other", "string")), ifExists = "ignore")
    assert(same.read().count() == 1 && same.read().columns.contains("x2"))
    // replace: fresh empty table
    val fresh = GraftTable.create(spark, cat, "t", cols, ifExists = "replace")
    assert(fresh.read().count() == 0)
    fresh.insert(Seq((7L, 7.0)).toDF("id", "x"))
    // replace with a dependent view raises; replace_force drops it too
    Views.createMaterializedView(spark, cat, "tv", fresh, Some("x > 0"),
      Seq(("id", "id")))
    intercept[Exception] {
      GraftTable.create(spark, cat, "t", cols, ifExists = "replace")
    }
    val forced = GraftTable.create(spark, cat, "t", cols,
      ifExists = "replace_force")
    assert(forced.read().count() == 0 && !cat.exists("tv"))
  }

  test("create_table ignore refuses when the path holds a view") {
    val cat = freshCatalog()
    val base = GraftTable.create(spark, cat, "base", cols)
    base.insert(Seq((1L, 1.0)).toDF("id", "x"))
    Views.createMaterializedView(spark, cat, "v", base, None, Seq(("id", "id")))
    val ex = intercept[IllegalArgumentException] {
      GraftTable.create(spark, cat, "v", cols, ifExists = "ignore")
    }
    assert(ex.getMessage.contains("not a table"))
  }

  test("create_view if_exists: ignore same-base / wrong-base / replace") {
    val cat = freshCatalog()
    val base = GraftTable.create(spark, cat, "b1", cols)
    base.insert(Seq((1L, 2.0), (2L, -1.0)).toDF("id", "x"))
    val other = GraftTable.create(spark, cat, "b2", cols)
    other.insert(Seq((9L, 9.0)).toDF("id", "x"))
    val v = Views.createMaterializedView(spark, cat, "mv", base,
      Some("x > 0"), Seq(("id", "id"), ("x2", "x2")))
    assert(v.read().count() == 1)
    // ignore + same base: existing handle (stale select list NOT applied)
    val again = Views.createMaterializedView(spark, cat, "mv", base,
      Some("x < -100"), Seq(("id", "id")), ifExists = "ignore")
    assert(again.read().count() == 1 && again.read().columns.contains("x2"))
    // ignore + different base: raises, like the reference's base check
    intercept[IllegalArgumentException] {
      Views.createMaterializedView(spark, cat, "mv", other, None,
        Seq(("id", "id")), ifExists = "ignore")
    }
    // a plain table at the path is "not a view of <base>"
    intercept[IllegalArgumentException] {
      Views.createMaterializedView(spark, cat, "b2", base, None,
        Seq(("id", "id")), ifExists = "ignore")
    }
    // replace: the view rebuilds with the new definition
    val swapped = Views.createComponentView(spark, cat, "mv", base,
      "split('a b', ' ')", "tok", "string", Seq.empty, ifExists = "replace")
    assert(swapped.read().count() == 4) // 2 base rows × 2 tokens
  }

  test("add_column if_exists: ignore no-ops, replace swaps, dependents raise") {
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "tc", cols)
    t.insert(Seq((1L, 3.0)).toDF("id", "x"))
    val v0 = t.currentVersion
    // ignore: version unchanged, definition unchanged
    assert(t.addColumn(ColumnDef("x2", "double", Some("x * 99")),
      ifExists = "ignore") == v0)
    assert(t.read().head().getAs[Double]("x2") == 6.0)
    // replace: new definition backfills
    t.addColumn(ColumnDef("x2", "double", Some("x * 10")), ifExists = "replace")
    assert(t.read().head().getAs[Double]("x2") == 30.0)
    // replace of a column with dependents raises (reference: iff no dependents)
    t.addColumn(ColumnDef("x4", "double", Some("x2 * 2")))
    intercept[IllegalArgumentException] {
      t.addColumn(ColumnDef("x2", "double", Some("x")), ifExists = "replace")
    }
    // default stays error
    intercept[IllegalArgumentException] { t.addColumn(ColumnDef("x", "double")) }
  }

  test("get_table if_not_exists=ignore: openOption is None when absent") {
    val cat = freshCatalog()
    assert(GraftTable.openOption(spark, cat, "nope").isEmpty)
    GraftTable.create(spark, cat, "yes", cols)
    assert(GraftTable.openOption(spark, cat, "yes").exists(_.read().count() == 0))
    intercept[IllegalArgumentException] { GraftTable.open(spark, cat, "nope") }
  }

  test("add_embedding_index if_exists: ignore keeps, replace swaps params") {
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "ti", Seq(
      ColumnDef("id", "bigint"), ColumnDef("emb", "array<double>"),
      ColumnDef("body", "string")))
    t.insert((0L until 8L).map(i => (i, Seq(i.toDouble, 1.0), s"doc body $i"))
      .toDF("id", "emb", "body"))
    t.createHnswIndex("e", "emb", "id", shards = 2)
    intercept[IllegalArgumentException] { t.createHnswIndex("e", "emb", "id") }
    t.createHnswIndex("e", "emb", "id", shards = 4, ifExists = "ignore")
    assert(t.meta.indexes.find(_.name == "e").get.shards == 2) // kept
    t.createHnswIndex("e", "emb", "id", shards = 3, ifExists = "replace")
    assert(t.meta.indexes.find(_.name == "e").get.shards == 3) // swapped
    assert(t.searchIndex("e", Seq(3.0, 1.0), 2).count() == 2)
    // replace can change the KIND too (drop + create)
    t.createMinhashIndex("e", "body", "id", ifExists = "replace_force")
    assert(t.meta.indexes.find(_.name == "e").get.kind == "minhash")
  }

  test("drop_column / drop_index if_not_exists=ignore no-op; error raises") {
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "td", cols)
    t.insert(Seq((1L, 1.0)).toDF("id", "x"))
    val v0 = t.currentVersion
    assert(t.dropColumn("nope", ifNotExists = "ignore") == v0)
    intercept[IllegalArgumentException] { t.dropColumn("nope") }
    t.dropIndex("noidx", ifNotExists = "ignore") // no-op
    intercept[IllegalArgumentException] { t.dropIndex("noidx") }
  }

  test("re-add after drop: fresh physical name, time travel reads the old data") {
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "tr", Seq(
      ColumnDef("id", "bigint"), ColumnDef("x", "double")))
    t.insert(Seq((1L, 5.0)).toDF("id", "x"))
    val vWithOld = t.currentVersion
    t.dropColumn("x")
    t.addColumn(ColumnDef("x", "double", Some("id * 100.0")))
    // current reads the NEW definition
    assert(t.read().head().getAs[Double]("x") == 100.0)
    // time travel before the drop reads the ORIGINAL stored values
    assert(t.read(Some(vWithOld)).head().getAs[Double]("x") == 5.0)
    // the new column maps to a fresh store name (old files keep theirs)
    val phys = t.meta.liveColumns.find(_.name == "x").get.storeName
    assert(phys != "x")
    // a later update leaves both epochs intact
    t.update(Map("id" -> "id + 1"), "id = 1")
    assert(t.read().head().getAs[Double]("x") == 200.0)
    assert(t.read(Some(vWithOld)).head().getAs[Double]("x") == 5.0)
  }
}
