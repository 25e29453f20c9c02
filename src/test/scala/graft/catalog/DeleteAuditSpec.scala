package graft.catalog

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DeleteAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multi-file delete removes matches from every touched file") {
    val cat = new Catalog(java.nio.file.Files.createTempDirectory("graft-da").toString)
    val t = GraftTable.create(spark, cat, "audit", Seq(
      ColumnDef("id", "bigint"), ColumnDef("x", "double")))
    t.insert((1L to 10000L).map(i => (i, i * 1.0)).toDF("id", "x").repartition(4))
    val m = t.meta
    assert(m.activeFiles(t.currentVersion).length == 4)
    t.delete("id % 100 = 0")
    assert(t.read().filter("id % 100 = 0").count() == 0, "matching rows survived!")
    assert(t.read().count() == 10000 - 100)
    val entry = t.meta.versions.last
    assert(entry.removed.length == 4, s"expected all 4 files touched, got ${entry.removed.length}")
  }

  test("delete after add_column rewrite: no duplicates, no survivors") {
    val cat = new Catalog(java.nio.file.Files.createTempDirectory("graft-da2").toString)
    val t = GraftTable.create(spark, cat, "audit2", Seq(
      ColumnDef("id", "bigint"), ColumnDef("x", "double")))
    t.insert((1L to 10000L).map(i => (i, i * 1.0)).toDF("id", "x").repartition(4))
    t.addColumn(ColumnDef("x2", "double", Some("x * 2")))
    val filesBefore = t.meta.activeFiles(t.currentVersion).length
    t.delete("id % 100 = 0")
    val survivors = t.read().filter("id % 100 = 0").count()
    val total = t.read().count()
    val distinctIds = t.read().select("id").distinct().count()
    val entry = t.meta.versions.last
    assert(survivors == 0, s"$survivors matching rows survived")
    assert(total == 9900, s"expected 9900 rows, got $total (duplicates?)")
    assert(total == distinctIds, "duplicate ids present")
    info(s"filesBefore=$filesBefore removed=${entry.removed.length} added=${entry.added.length}")
  }
}
