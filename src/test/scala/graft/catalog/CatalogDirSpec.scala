package graft.catalog

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Directory-namespace surface (reference `pxt.create_dir` / `drop_dir` /
  * `move` / `list_dirs` / `list_tables`, `globals.py`): slash-separated
  * paths over warehouse subdirectories, `.dir` markers for empty dirs,
  * manifest URI rewrite on move.
  */
class CatalogDirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog() =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-dir").toString)

  private val cols = Seq(ColumnDef("id", "bigint"), ColumnDef("s", "string"))

  test("createDir: nesting, parents, ifExists modes") {
    val cat = freshCatalog()
    cat.createDir("d1")
    assert(cat.isDir("d1"))
    // parent must exist without parents=true
    intercept[IllegalArgumentException](cat.createDir("dx/sub"))
    cat.createDir("d1/sub")
    cat.createDir("a/b/c", parents = true)
    assert(cat.isDir("a/b") && cat.isDir("a/b/c"))
    // error / ignore / replace
    intercept[IllegalArgumentException](cat.createDir("d1"))
    cat.createDir("d1", ifExists = "ignore")
    intercept[IllegalArgumentException](cat.createDir("d1", ifExists = "replace")) // not empty
    cat.createDir("d1/sub", ifExists = "replace") // empty: ok
    cat.createDir("d1", ifExists = "replace_force")
    assert(cat.isDir("d1") && !cat.isDir("d1/sub"))
    // invalid segments rejected
    intercept[IllegalArgumentException](cat.createDir(".hidden"))
    intercept[IllegalArgumentException](cat.createDir("a//b"))
  }

  test("tables live inside dirs; listing sees the tree") {
    val cat = freshCatalog()
    cat.createDir("corp/raw", parents = true)
    val t = GraftTable.create(spark, cat, "corp/raw/events", cols)
    t.insert(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    assert(t.read().count() == 2)
    // parent must be a dir
    intercept[IllegalArgumentException](
      GraftTable.create(spark, cat, "nosuch/t", cols))
    // a table path can't be shadowed by a dir and vice versa
    intercept[IllegalArgumentException](cat.createDir("corp/raw/events"))
    assert(cat.listDirs() == Seq("corp", "corp/raw"))
    assert(cat.listDirs("corp", recursive = false) == Seq("corp/raw"))
    assert(cat.listTablesUnder() == Seq("corp/raw/events"))
    assert(cat.listTablesUnder("corp") == Seq("corp/raw/events"))
    // ls(): immediate children with kind + version
    val ls = cat.ls(spark, "corp/raw").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(ls == Seq(("events", "table", Some(1L))))
    assert(cat.ls(spark).collect().map(_.getString(1)).toSeq == Seq("dir"))
  }

  test("move table rewrites manifest URIs; history and DML survive") {
    val cat = freshCatalog()
    cat.createDir("src")
    cat.createDir("dst")
    val t = GraftTable.create(spark, cat, "src/t", cols)
    t.insert(Seq((1L, "a")).toDF("id", "s"))
    t.insert(Seq((2L, "b")).toDF("id", "s"))
    cat.move("src/t", "dst/t2")
    assert(!cat.isTable("src/t") && cat.isTable("dst/t2"))
    val m = GraftTable.open(spark, cat, "dst/t2")
    // reads (manifest URIs must point at the moved files)
    assert(m.read().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // time travel across the move
    assert(m.read(Some(1L)).count() == 1)
    // post-move DML lands under the new path
    m.insert(Seq((3L, "c")).toDF("id", "s"))
    assert(m.read().count() == 3)
    assert(m.meta.versions.flatMap(_.added).forall(_.contains("dst/t2")))
    // old handle is invalidated
    intercept[Exception](t.read().count())
  }

  test("move directory carries nested tables; move guards hold") {
    val cat = freshCatalog()
    cat.createDir("a/b", parents = true)
    val t = GraftTable.create(spark, cat, "a/b/t", cols)
    t.insert(Seq((7L, "x")).toDF("id", "s"))
    cat.createDir("elsewhere")
    cat.move("a", "elsewhere/a2")
    assert(cat.listTablesUnder() == Seq("elsewhere/a2/b/t"))
    val m = GraftTable.open(spark, cat, "elsewhere/a2/b/t")
    assert(m.read().as[(Long, String)].collect().toSeq == Seq((7L, "x")))
    // guards
    intercept[IllegalArgumentException](cat.move("elsewhere", "elsewhere/a2/x"))
    intercept[IllegalArgumentException](cat.move("nope", "other"))
    cat.move("nope", "other", ifNotExists = "ignore") // no-op
    cat.createDir("d3")
    intercept[IllegalArgumentException](cat.move("d3", "elsewhere/a2"))
    cat.move("d3", "elsewhere/a2", ifExists = "ignore") // no-op
    assert(cat.isDir("d3"))
  }

  test("tableMetadata reflects schema, computed deps, snapshots and indexes") {
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "meta_t", cols :+
      ColumnDef("s_up", "string", computedExpr = Some("upper(s)")))
    t.insert(Seq((1L, "a")).toDF("id", "s"))
    t.createSnapshot("first")
    val md = t.tableMetadata
    assert(md.name == "meta_t" && md.version == t.currentVersion)
    assert(md.snapshots == Map("first" -> 1L))
    val byName = md.columns.map(c => c.name -> c).toMap
    assert(byName("id").isStored && !byName("id").isComputed)
    assert(byName("s_up").isComputed &&
      byName("s_up").computedWith.contains("upper(s)") &&
      byName("s_up").dependsOn == Seq("s"))
    assert(md.indices.isEmpty && md.nextRowId == 1L)
    // physicalName survives rename (s itself is pinned by the computed col)
    t.renameColumn("id", "id2")
    val md2 = t.tableMetadata
    assert(md2.columns.exists(c => c.name == "id2" && c.physicalName == "id"))
  }

  test("move blocks behind an in-flight writer, then lands intact") {
    val cat = freshCatalog()
    cat.createDir("m1"); cat.createDir("m2")
    val t = GraftTable.create(spark, cat, "m1/t", cols)
    t.insert(Seq((1L, "a")).toDF("id", "s"))
    @volatile var moved = false
    // hold the table's writer lock (as any in-flight mutation does) and
    // launch the move: it must WAIT, not relocate files under the writer
    val mover = new Thread(() => { cat.move("m1/t", "m2/t"); moved = true })
    cat.withWriterLock("m1/t") {
      mover.start()
      Thread.sleep(300)
      assert(!moved, "move proceeded while the writer lock was held")
      assert(cat.isTable("m1/t"))
    }
    mover.join(30000)
    assert(moved && cat.isTable("m2/t") && !cat.isTable("m1/t"))
    val m = GraftTable.open(spark, cat, "m2/t")
    assert(m.read().as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    m.insert(Seq((2L, "b")).toDF("id", "s"))
    assert(m.read().count() == 2)
  }

  test("dropDir: empty-only unless force; force drops nested tables") {
    val cat = freshCatalog()
    cat.createDir("p/q", parents = true)
    GraftTable.create(spark, cat, "p/q/t", cols)
    intercept[IllegalArgumentException](cat.dropDir("p"))
    cat.dropDir("p", force = true)
    assert(!cat.isDir("p") && !cat.isTable("p/q/t"))
    intercept[IllegalArgumentException](cat.dropDir("p"))
    cat.dropDir("p", ifNotExists = "ignore")
  }

  test("moving a base table keeps view lineage: refresh stays incremental, no duplicates") {
    val cat = freshCatalog()
    val base = GraftTable.create(spark, cat, "vb", Seq(
      ColumnDef("id", "bigint"), ColumnDef("text", "string")))
    base.insert(Seq((1L, "a b")).toDF("id", "text"))
    val view = Views.createComponentView(spark, cat, "vtokens", base,
      "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
    assert(view.read().count() == 2)
    cat.createDir("inner")
    cat.move("vb", "inner/vb")
    val moved = GraftTable.open(spark, cat, "inner/vb")
    // lineage survived the move — both directions
    assert(Views.listViews(cat, moved) == Seq("vtokens"))
    assert(Views.baseOf(cat, view).contains("inner/vb"))
    // refresh against the MOVED base must process only NEW rows — a stale
    // lineage key would default lastSeen to 0 and duplicate row 1's tokens
    moved.insert(Seq((2L, "c")).toDF("id", "text"))
    Views.refreshComponentView(view, moved, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().count() == 3, "stale lineage re-expanded old rows")
    // dir move of the base keeps lineage too
    cat.move("inner", "outer")
    val moved2 = GraftTable.open(spark, cat, "outer/vb")
    assert(Views.baseOf(cat, view).contains("outer/vb"))
    moved2.insert(Seq((3L, "d e")).toDF("id", "text"))
    Views.refreshComponentView(view, moved2, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().count() == 5)
  }
}
