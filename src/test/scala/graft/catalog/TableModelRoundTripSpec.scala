package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's table-model surface (`tests/test_table_model.py` /
  * `test_table_model_2.py`): a table declared in one shot and a table built
  * by incremental construction must end up with EQUAL metadata and equal
  * query behavior, every metadata field (columns with special properties,
  * computed lineage, primary key, indices, snapshots) must round-trip
  * byte-for-byte through catalog reload, and pre-upgrade meta.json files
  * (without the new column-property fields) must load with clean defaults.
  */
class TableModelRoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-tm").toString)

  /** the reference's schema_from_tbl_md: the construction-order-independent
    * projection of column metadata (versionAdded legitimately differs
    * between one-shot and incremental construction)
    */
  private def schemaOf(t: GraftTable) =
    t.tableMetadata.columns.map(c => (c.name, c.dataType, c.isStored,
      c.isComputed, c.computedWith, c.dependsOn, c.comment, c.customMetadata,
      c.mediaValidation))

  test("declarative vs incremental construction: equal schemas, equal results") {
    val cat = newCat()
    val special = ColumnDef("clip", "binary",
      comment = Some("This is a column with special properties"),
      customMetadata = Map("chicken" -> "eggs"),
      mediaValidation = Some("on_read"))
    // one-shot declaration (the model-class path)
    val t1 = GraftTable.create(spark, cat, "model_tbl", Seq(
      ColumnDef("id", "bigint"), ColumnDef("name", "string"),
      ColumnDef("value", "double"),
      ColumnDef("incr", "double", Some("value + 1")),
      ColumnDef("descr", "string", Some("concat('Name: ', name)")),
      special,
      ColumnDef("third", "double", Some("value / 3"), stored = false)),
      primaryKey = Seq("id"))
    // incremental construction (the direct path)
    val t2 = GraftTable.create(spark, cat, "model_tbl_2", Seq(
      ColumnDef("id", "bigint"), ColumnDef("name", "string"),
      ColumnDef("value", "double")), primaryKey = Seq("id"))
    t2.addColumn(ColumnDef("incr", "double", Some("value + 1")))
    t2.addColumn(ColumnDef("descr", "string", Some("concat('Name: ', name)")))
    t2.addColumn(special)
    t2.addColumn(ColumnDef("third", "double", Some("value / 3"), stored = false))

    assert(schemaOf(t1) == schemaOf(t2))
    assert(t1.tableMetadata.primaryKey == t2.tableMetadata.primaryKey)

    // same inserts → same visible rows through both construction routes
    val rows = Seq((1L, "Alice", 3.14)).toDF("id", "name", "value")
      .withColumn("clip", lit(null).cast("binary"))
    t1.insert(rows); t2.insert(rows)
    val sel = Seq("id", "name", "value", "incr", "descr", "third")
    assert(t1.read().select(sel.map(col): _*).collect().toSeq ==
      t2.read().select(sel.map(col): _*).collect().toSeq)
    // the special-property fields surfaced identically
    val c1 = t1.tableMetadata.columns.find(_.name == "clip").get
    assert(c1.comment.contains("This is a column with special properties"))
    assert(c1.customMetadata == Map("chicken" -> "eggs"))
    assert(c1.mediaValidation.contains("on_read"))
  }

  test("every tableMetadata field round-trips through catalog reload") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tm2").toString
    val cat = new Catalog(dir)
    val t = GraftTable.create(spark, cat, "rt", Seq(
      ColumnDef("id", "bigint"), ColumnDef("txt", "string"),
      ColumnDef("tag", "string"),
      ColumnDef("vec", "array<float>",
        Some("array(cast(id as float), cast(length(txt) as float))")),
      ColumnDef("n", "bigint", Some("length(txt)"),
        comment = Some("char count"), customMetadata = Map("unit" -> "chars"))),
      primaryKey = Seq("id"))
    t.insert(Seq((1L, "alpha", "t1"), (2L, "beta", "t2")).toDF("id", "txt", "tag"))
    t.renameColumn("tag", "label") // physicalName mapping in play
    t.createHnswIndex("vec_idx", "vec", "id", shards = 2)
    t.createSnapshot("s1")
    t.insert(Seq((3L, "gamma", "t3")).toDF("id", "txt", "label"))

    val before = t.tableMetadata
    // a FRESH Catalog over the same warehouse: nothing cached in-process
    val t2 = GraftTable.open(spark, new Catalog(dir), "rt")
    val after = t2.tableMetadata
    assert(after == before) // full structural equality, every field
    // and the reloaded handle behaves identically
    assert(t2.read().count() == 3)
    assert(t2.read(Some(after.snapshots("s1"))).count() == 2)
    assert(t2.tableMetadata.columns.find(_.name == "label").get.physicalName == "tag")
    assert(t2.tableMetadata.columns.find(_.name == "n").get.comment.contains("char count"))
  }

  test("insertStatus reports reference UpdateStatus counts from footers") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "status_tbl", Seq(
      ColumnDef("id", "bigint"), ColumnDef("x", "double"),
      ColumnDef("x2", "double", Some("x * 2")),
      ColumnDef("x3", "double", Some("x2 + 1"))))
    val st = t.insertStatus(
      (1 to 7).map(i => (i.toLong, i * 0.5)).toDF("id", "x"))
    assert(st.numRows == 7)
    assert(st.numComputedValues == 14) // 7 rows × 2 stored computed cols
    assert(st.updatedCols == Seq("x2", "x3")) // dependency order
    assert(st.colsWithExcs.isEmpty)
    assert(st.version == t.currentVersion)
    // Long-returning insert still works and agrees
    assert(t.insert(Seq((8L, 4.0)).toDF("id", "x")) == t.currentVersion)
    // unversioned squash does not break the footer-count path
    val u = GraftTable.create(spark, cat, "status_uv", Seq(
      ColumnDef("id", "bigint")), isVersioned = false)
    assert(u.insertStatus(Seq(Tuple1(1L), Tuple1(2L)).toDF("id")).numRows == 2)
  }

  test("delete/update/batchUpdate statuses: exact counts via Observation, no extra job") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "status_dml", Seq(
      ColumnDef("id", "bigint"), ColumnDef("x", "double"),
      ColumnDef("x2", "double", Some("x * 2")),
      ColumnDef("y", "string")))
    t.insert((1 to 10).map(i => (i.toLong, i * 1.0, s"r$i")).toDF("id", "x", "y"))

    val up = t.updateStatus(Map("x" -> "x + 100"), "id <= 3")
    assert(up.numRows == 3)
    assert(up.updatedCols == Seq("x", "x2")) // set col + cascaded computed
    assert(up.numComputedValues == 3) // 3 rows × 1 recomputed column
    // updating a column nothing depends on cascades nothing
    val up2 = t.updateStatus(Map("y" -> "concat(y, '!')"), "id = 1")
    assert(up2.numRows == 1 && up2.updatedCols == Seq("y") &&
      up2.numComputedValues == 0)

    val bu = t.batchUpdateStatus(
      Seq((5L, 500.0), (6L, 600.0), (99L, 1.0)).toDF("id", "x"), Seq("id"),
      ifNotExists = "ignore")
    assert(bu.numRows == 2) // key 99 matches nothing (skipped under ignore)
    assert(bu.updatedCols == Seq("x", "x2"))
    assert(bu.numComputedValues == 2)
    // no-match batch is a no-op status
    assert(t.batchUpdateStatus(Seq((77L, 1.0)).toDF("id", "x"), Seq("id"),
        ifNotExists = "ignore")
      .numRows == 0)

    val del = t.deleteStatus("id > 8")
    assert(del.numRows == 2 && del.version == t.currentVersion)
    assert(t.deleteStatus("id > 800").numRows == 0) // predicate misses
    assert(t.read().count() == 8)
    // values actually landed (the statuses weren't just counted)
    assert(t.read().where("id = 5").select("x2").as[Double].head() == 1000.0)
  }

  test("pre-upgrade meta.json (no column-property fields) loads with defaults") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tm3").toString
    val cat = new Catalog(dir)
    val t = GraftTable.create(spark, cat, "old", Seq(
      ColumnDef("id", "bigint"),
      ColumnDef("c", "string", comment = Some("will be stripped"))))
    t.insert(Seq(Tuple1(1L)).toDF("id").withColumn("c", lit("x")))
    // simulate a meta file written before the fields existed
    val metaPath = java.nio.file.Paths.get(dir, "old", "meta.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readAllBytes(metaPath))
    root.get("columns").elements().forEachRemaining { c =>
      val o = c.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      o.remove("comment"); o.remove("customMetadata"); o.remove("mediaValidation")
    }
    java.nio.file.Files.write(metaPath, mapper.writeValueAsBytes(root))
    val t2 = GraftTable.open(spark, new Catalog(dir), "old")
    val cols = t2.tableMetadata.columns
    assert(cols.forall(c => c.comment.isEmpty && c.customMetadata.isEmpty &&
      c.mediaValidation.isEmpty))
    // DML still works against the migrated meta, and re-save persists defaults
    t2.insert(Seq((2L, "y")).toDF("id", "c"))
    assert(t2.read().count() == 2)
  }
}
