package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Clustered compaction (OPTIMIZE ... CLUSTER BY, linear form): the
  * rewrite range-partitions + sorts on the cluster columns, so output
  * files cover disjoint value ranges and parquet footer min/max stats
  * become selective — the data-skipping contract verified here directly
  * from the footers.
  */
class ClusteredCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def footerRange(file: String, colName: String): (Long, Long) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val stats = r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala
        .filter(_.getPath.toDotString == colName).map(_.getStatistics))
      (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue()).min,
        stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue()).max)
    } finally r.close()
  }

  test("clusterBy compaction: disjoint per-file ranges, data and history intact") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-clc").toString)
    val t = GraftTable.create(spark, cat, "clust", Seq(
      ColumnDef("id", "bigint"), ColumnDef("v", "double")))
    // 4 interleaved inserts so ids are scattered across files
    for (r <- 0 until 4)
      t.insert((0 until 100).map(i => ((i * 4 + r).toLong, i * 0.5))
        .toDF("id", "v").repartition(3))
    val before = t.read().orderBy("id").collect()
    val vPre = t.currentVersion

    t.compact(targetFiles = 4, clusterBy = Seq("id"))

    // contents and time travel byte-identical
    assert(t.read().orderBy("id").collect().toSeq == before.toSeq)
    assert(t.read(Some(vPre)).count() == 400)

    // the data-skipping contract: per-file id ranges are pairwise disjoint
    val files = t.meta.activeFiles(t.currentVersion)
    assert(files.size == 4)
    val ranges = files.map(footerRange(_, "id")).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, max1), (min2, _)) =>
        assert(max1 < min2, s"overlapping clustered ranges: $ranges")
      case _ => ()
    }
    // a point predicate matches exactly ONE file's [min,max] envelope
    val hit = ranges.count { case (lo, hi) => lo <= 123L && 123L <= hi }
    assert(hit == 1)
  }

  test("clusterBy follows renames (logical name → physical storeName)") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-clc2").toString)
    val t = GraftTable.create(spark, cat, "clust2", Seq(
      ColumnDef("k", "bigint"), ColumnDef("v", "string")))
    t.insert((0 until 50).map(i => ((i * 7 % 50).toLong, s"r$i")).toDF("k", "v"))
    t.insert((50 until 100).map(i => ((i * 7 % 50 + 50).toLong, s"r$i")).toDF("k", "v"))
    t.renameColumn("k", "key")
    t.compact(targetFiles = 2, clusterBy = Seq("key"))
    val files = t.meta.activeFiles(t.currentVersion)
    val ranges = files.map(footerRange(_, "k")).sortBy(_._1) // physical name
    assert(ranges.size == 2 && ranges(0)._2 < ranges(1)._1)
    assert(t.read().count() == 100)
    // unknown cluster column refuses with a clear message
    val e = intercept[IllegalArgumentException](t.compact(2, Seq("nope")))
    assert(e.getMessage.contains("no such column"))
  }

  test("compact with clusterBy on a table with no active files is a noop version") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-clc3").toString)
    val t = GraftTable.create(spark, cat, "clust3", Seq(
      ColumnDef("k", "bigint"), ColumnDef("v", "string")))
    // never inserted: zero active files; clusterBy used to bypass the
    // noop guard and hit spark.read.parquet() with no paths
    val v1 = t.compact(targetFiles = 1, clusterBy = Seq("k"))
    assert(t.read().count() == 0)
    // same after insert-then-delete-everything (files exist in history,
    // none active at the current version)
    t.insert((0 until 10).map(i => (i.toLong, s"r$i")).toDF("k", "v"))
    t.delete("true")
    if (t.meta.activeFiles(t.currentVersion).isEmpty) {
      t.compact(targetFiles = 1, clusterBy = Seq("k"))
      assert(t.read().count() == 0)
    }
    assert(v1 >= 1)
  }
}
