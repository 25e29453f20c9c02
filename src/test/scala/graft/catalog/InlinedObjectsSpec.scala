package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's inlined-objects surface (`tests/test_inlined_objects.py`:
  * `LocalStore` inlining of arrays/small media into the store vs offload).
  * SURVEY maps CellMaterialization to identity — parquet stores arrays and
  * binary natively, so there is no inline/offload threshold to manage — but
  * the TEST surface still applies: varied shapes/dtypes round-trip
  * losslessly through reload, null cells filter correctly, and a failed
  * insert leaves no partial state behind.
  */
class InlinedObjectsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null arrays: insert, filter by null-ness, reload round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inl").toString
    val cat = new Catalog(dir)
    val t = GraftTable.create(spark, cat, "arrs", Seq(
      ColumnDef("i", "bigint"), ColumnDef("data", "array<double>")))
    val rows = (0 until 10).map(i =>
      (i.toLong, if (i % 2 == 0) Seq.tabulate(64)(j => i + j * 0.5) else null))
    t.insert(rows.toDF("i", "data"))
    // where(data == None) / != None semantics
    val nulls = t.read().where(col("data").isNull).select("i").as[Long].collect()
    assert(nulls.forall(_ % 2 == 1) && nulls.length == 5)
    val notNulls = t.read().where(col("data").isNotNull).select("i").as[Long].collect()
    assert(notNulls.forall(_ % 2 == 0) && notNulls.length == 5)
    // reload via a fresh catalog: values byte-identical
    val t2 = GraftTable.open(spark, new Catalog(dir), "arrs")
    val back = t2.read().orderBy("i").select("data")
      .as[Seq[Double]].collect().toSeq
    assert(back == rows.map(r => Option(r._2).orNull).toSeq)
  }

  test("varied shapes and element types round-trip losslessly (inline storage is parquet-native)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inl2").toString
    val cat = new Catalog(dir)
    val t = GraftTable.create(spark, cat, "shapes", Seq(
      ColumnDef("id", "bigint"),
      ColumnDef("f32", "array<float>"),   // 1-d float
      ColumnDef("i64", "array<bigint>"),  // 1-d int64
      ColumnDef("bool", "array<boolean>"),
      ColumnDef("mat", "array<array<float>>"), // 2-d (the (n, m) shapes)
      ColumnDef("blob", "binary")))       // inlined media bytes
    // sizes cycle like the reference's inf_array_iterator: small → large
    val sizes = Seq(4, 40, 500, 2000)
    val rows = (0 until 8).map { i =>
      val n = sizes(i % sizes.length)
      (i.toLong,
        Seq.tabulate(n)(j => (i * 1000 + j).toFloat),
        Seq.tabulate(n)(j => (i.toLong << 32) + j),
        Seq.tabulate(n)(j => (j + i) % 3 == 0),
        Seq.tabulate(math.min(n, 40))(r => Seq.tabulate(8)(c => (r * 8 + c + i).toFloat)),
        Array.tabulate(n)(j => ((i * 31 + j) % 251).toByte))
    }
    t.insert(rows.toDF("id", "f32", "i64", "bool", "mat", "blob"))
    val t2 = GraftTable.open(spark, new Catalog(dir), "shapes")
    val back = t2.read().orderBy("id")
      .select("id", "f32", "i64", "bool", "mat", "blob")
      .as[(Long, Seq[Float], Seq[Long], Seq[Boolean], Seq[Seq[Float]], Array[Byte])]
      .collect()
    rows.zip(back).foreach { case (exp, got) =>
      assert(got._1 == exp._1 && got._2 == exp._2 && got._3 == exp._3 &&
        got._4 == exp._4 && got._5 == exp._5)
      assert(java.util.Arrays.equals(got._6, exp._6))
    }
    // time travel keeps the inlined values of past versions readable
    val v1 = t.currentVersion
    t.delete("id < 4")
    assert(t.read().count() == 4 && t.read(Some(v1)).count() == 8)
  }

  test("partial failure leaves no orphan rows or files (reference cleanup surface)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inl3").toString
    val cat = new Catalog(dir)
    val t = GraftTable.create(spark, cat, "clean", Seq(
      ColumnDef("id", "bigint"), ColumnDef("data", "array<double>")),
      primaryKey = Seq("id"))
    t.insert(Seq((1L, Seq(1.0, 2.0))).toDF("id", "data"))
    val filesBefore = t.tableMetadata.version
    // duplicate PK: the whole batch must be rejected atomically
    intercept[IllegalArgumentException] {
      t.insert(Seq((2L, Seq(3.0)), (1L, Seq(9.9))).toDF("id", "data"))
    }
    assert(t.read().count() == 1)
    assert(t.tableMetadata.version == filesBefore) // no version minted
    // no unreachable files linger for vacuum to find
    assert(t.vacuum().isEmpty)
    // the good row is still intact after the failed batch
    assert(t.read().select("data").as[Seq[Double]].head() == Seq(1.0, 2.0))
  }
}
