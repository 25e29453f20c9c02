package graft.tools

import graft.Tables
import graft.catalog._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Versioned-table DML benchmark on the real corpus: load lineitem into a
  * GraftTable with computed columns, then time insert / add_computed_column
  * backfill / file-pruned delete / batchUpdate / time-travel read.
  * Run: `sbt "runMain graft.tools.CatalogBench [sfDir]"`.
  */
object CatalogBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[catalog-bench] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cat = new Catalog(java.nio.file.Files.createTempDirectory("graft-cb").toString)
    val li = Tables(spark, sfDir, "lineitem")
    val t = GraftTable.create(spark, cat, "lineitem_v", Seq(
      ColumnDef("l_orderkey", "bigint"), ColumnDef("l_linenumber", "int"),
      ColumnDef("l_quantity", "double"), ColumnDef("l_extendedprice", "double"),
      ColumnDef("l_discount", "double"),
      ColumnDef("net_price", "double",
        Some("l_extendedprice * (1.0 - l_discount)")),
    ))
    val src = li.select("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount")
    val n = src.count()
    println(s"[catalog-bench] rows: $n at $sfDir")

    timed("insert (computed col)") { t.insert(src) }
    timed("read count") { assert(t.read().count() == n) }
    timed("add_computed_column") {
      t.addColumn(ColumnDef("price_band", "bigint",
        Some("cast(l_extendedprice / 1000 as bigint)")))
    }
    val v = t.currentVersion
    timed("delete 1% (file-pruned)") { t.delete("l_orderkey % 100 = 0") }
    timed("batchUpdate 100 keys") {
      import spark.implicits._
      t.batchUpdate((1L to 100L).map(k => (k, 99.0)).toDF("l_orderkey", "l_discount"),
        Seq("l_orderkey"), ifNotExists = "ignore") // orderkeys are sparse
    }
    timed("time-travel read") { assert(t.read(Some(v)).count() == n) }
    timed("current read") { t.read().count() }
    println("[catalog-bench] history:")
    t.history().show(false)
    spark.stop()
  }
}
