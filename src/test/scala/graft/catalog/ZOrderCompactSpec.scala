package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustered compaction: every output file must cover a small
  * hyper-rectangle of the (a, b) value space, so parquet footer min/max
  * prune files for predicates on EITHER column — the property the linear
  * CLUSTER BY form structurally cannot give on the trailing column. The
  * assertions read the ranges straight from the parquet footers, like
  * ClusteredCompactSpec.
  */
class ZOrderCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def footerRanges(t: GraftTable, column: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    t.meta.activeFiles(t.currentVersion).map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val st = scala.jdk.CollectionConverters
          .ListHasAsScala(r.getFooter.getBlocks).asScala
          .flatMap(b => scala.jdk.CollectionConverters
            .ListHasAsScala(b.getColumns).asScala
            .filter(_.getPath.toDotString == column).map(_.getStatistics))
        (st.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue()).min,
          st.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue()).max)
      } finally r.close()
    }
  }

  private def pruned(ranges: Seq[(Long, Long)], lo: Long, hi: Long): Int =
    ranges.count { case (mn, mx) => mx < lo || mn >= hi } // skippable files

  /** 4096 rows over a decorrelated (a, b) grid, inserted scattered. */
  private def mkTable(name: String): GraftTable = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory(s"graft-$name").toString)
    val t = GraftTable.create(spark, cat, name, Seq(
      ColumnDef("a", "bigint"), ColumnDef("b", "bigint")))
    val rows = (0L until 4096L).map(i => (i, i * 37 % 4096))
    for (r <- 0 until 4)
      t.insert(rows.filter(_._1 % 4 == r).toDF("a", "b").repartition(3))
    t
  }

  test("z-order files prune on BOTH dimensions; linear only on the leading one") {
    val tz = mkTable("zc1")
    val preCompact = tz.currentVersion
    tz.compact(targetFiles = 16, clusterBy = Seq("a", "b"), zOrder = true)
    val za = footerRanges(tz, "a"); val zb = footerRanges(tz, "b")
    assert(za.size <= 16)
    // an eighth-of-space window on either column skips at least a quarter
    // of the files (a 4x4-ish z-grid leaves ~4 of 16 intersecting)
    assert(pruned(za, 0L, 512L) >= 4, s"a-ranges: $za")
    assert(pruned(zb, 0L, 512L) >= 4, s"b-ranges: $zb")
    // content preserved through the rewrite, history intact
    assert(tz.read().count() == 4096L)
    assert(tz.read().agg(sum(col("a") + col("b"))).head.getLong(0)
      == 2L * (0L until 4096L).sum)
    assert(tz.read(Some(preCompact)).count() == 4096L)

    // the linear form on the same data: selective on `a`, blind on `b`
    val tl = mkTable("zc2")
    tl.compact(targetFiles = 16, clusterBy = Seq("a", "b"))
    assert(pruned(footerRanges(tl, "a"), 0L, 512L) >= 4)
    assert(pruned(footerRanges(tl, "b"), 0L, 512L) == 0,
      "lexicographic clustering should not prune the trailing column — " +
        "if this starts passing, the fixture stopped being decorrelated")
  }

  test("z-order compaction interop: view sync noop, change-feed silence, DML after") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-zc5").toString)
    val t = GraftTable.create(spark, cat, "zc5", Seq(
      ColumnDef("a", "bigint"), ColumnDef("b", "bigint"),
      ColumnDef("text", "string")))
    t.insert((0L until 512L).map(i => (i, i * 37 % 512, s"w$i x"))
      .toDF("a", "b", "text").repartition(4))
    val view = Views.createComponentView(spark, cat, "zc5v", t,
      "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("a", "bigint")))
    assert(view.read().count() == 1024)
    val vBefore = t.currentVersion

    // the z-order rewrite is a physical re-layout only: the change feed
    // stays silent across it and the view sync sees nothing new
    t.compact(targetFiles = 8, clusterBy = Seq("a", "b"), zOrder = true)
    assert(t.changeFeed(vBefore).count() == 0,
      "z-order compaction must emit no change events")
    val st = Views.syncComponentViewStatus(view, t,
      "split(text, '\\\\s+')", "token", Seq("a"))
    assert(st.rowsDeleted == 0 && st.rowsInserted == 0, s"$st")

    // DML after the rewrite: delete prunes into the clustered files,
    // feed reports exactly the deleted keys, view cascades
    val vPreDel = t.currentVersion
    t.delete("a < 32")
    assert(t.read().count() == 480)
    val ev = t.changeFeed(vPreDel)
    assert(ev.filter(col("_change_type") === "delete").count() == 32)
    val st2 = Views.syncComponentViewStatus(view, t,
      "split(text, '\\\\s+')", "token", Seq("a"))
    assert(st2.rowsDeleted == 64 && st2.rowsInserted == 0, s"$st2")
    assert(view.read().count() == 960)
  }

  test("z-order refuses unordered domains and single columns") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-zc3").toString)
    val t = GraftTable.create(spark, cat, "zc3", Seq(
      ColumnDef("a", "bigint"), ColumnDef("b", "binary")))
    t.insert(Seq((1L, Array[Byte](1)), (2L, Array[Byte](2))).toDF("a", "b"))
    intercept[IllegalArgumentException] {
      t.compact(targetFiles = 2, clusterBy = Seq("a"), zOrder = true)
    }
    intercept[IllegalArgumentException] {
      t.compact(targetFiles = 2, clusterBy = Seq("a", "b"), zOrder = true)
    }
  }

  test("z-order on a STRING column: domain windows prune on either dimension") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-zc6").toString)
    val t = GraftTable.create(spark, cat, "zc6", Seq(
      ColumnDef("dom", "string"), ColumnDef("k", "bigint")))
    // 64 domains × 64 keys, decorrelated, inserted scattered — the 100 TB
    // curation case: cluster by (domain, numeric key)
    val rows = (0L until 4096L).map { i =>
      (f"d${i % 64}%03d.example.com", i * 37 % 4096)
    }
    for (r <- 0 until 4)
      t.insert(rows.zipWithIndex.filter(_._2 % 4 == r).map(_._1)
        .toDF("dom", "k").repartition(3))
    t.compact(targetFiles = 16, clusterBy = Seq("dom", "k"), zOrder = true)
    assert(t.read().count() == 4096)
    // string footer ranges: an eighth-of-space domain window must leave
    // at least a quarter of the files skippable
    val conf = spark.sessionState.newHadoopConf()
    val domRanges: Seq[(String, String)] =
      t.meta.activeFiles(t.currentVersion).map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val st = scala.jdk.CollectionConverters
            .ListHasAsScala(r.getFooter.getBlocks).asScala
            .flatMap(b => scala.jdk.CollectionConverters
              .ListHasAsScala(b.getColumns).asScala
              .filter(_.getPath.toDotString == "dom").map(_.getStatistics))
          (st.map(_.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
            .toStringUsingUTF8).min,
            st.map(_.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
              .toStringUsingUTF8).max)
        } finally r.close()
      }
    val nf = domRanges.size
    assert(nf <= 16)
    val skippableDom = domRanges.count { case (mn, mx) =>
      mx < "d000" || mn >= "d008" // first 8 of 64 domains
    }
    assert(skippableDom * 4 >= nf, s"dom ranges: $domRanges")
    // and the numeric dimension prunes too (z-property, not lexicographic)
    val kRanges = footerRanges(t, "k")
    assert(pruned(kRanges, 0L, 512L) * 4 >= nf, s"k ranges: $kRanges")
    // correctness of a domain-window query over the clustered layout
    assert(t.read().filter(col("dom") < "d008").count() == 8 * 64)
  }

  test("string z-order stays UDF-free: bucket HOF + native kernel only") {
    val df = (0L until 256L).map(i => (f"d${i % 16}%02d", i))
      .toDF("dom", "k")
    val dir = java.nio.file.Files.createTempDirectory("graft-zc7").toString
    df.write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val clustered = graft.operators.ZOrder.cluster(src, Seq("dom", "k"),
      numBuckets = 16, partitions = 4)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"string bucketing must stay codegen Column composition:\n$plan")
    assert(clustered.count() == 256)
  }

  test("z-value is a native codegen plan: no UDF, map-side only") {
    val df = (0L until 256L).map(i => (i, i * 7 % 256)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zc4").toString
    df.write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val cuts = graft.operators.ZOrder.boundariesFor(src, Seq("x", "y"), numBuckets = 16)
    val z = src.withColumn("z",
      graft.operators.ZOrder.zvalue(src, Seq("x", "y"), cuts))
    val plan = z.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
    assert(!plan.contains("Exchange"), s"z-value must not shuffle:\n$plan")
    // interleave sanity against a driver-side reference on tiny exact data:
    // 4-bit ranks of 0..255 in 16 equi-depth buckets ~ value / 16
    val got = z.select("x", "y", "z").as[(Long, Long, Long)].collect()
    def interleave(ra: Long, rb: Long): Long =
      (0 until 4).map(i => (((ra >> i) & 1L) << (2 * i)) | (((rb >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val mism = got.count { case (x, y, zz) =>
      // boundaries are approximate; allow rank off-by-one per dimension
      val ra = x / 16; val rb = y / 16
      val cands = for {
        da <- -1 to 1; db <- -1 to 1
        a = (ra + da).max(0).min(15); b = (rb + db).max(0).min(15)
      } yield interleave(a, b)
      !cands.contains(zz)
    }
    assert(mism == 0, s"$mism rows off the Morton curve")
  }
}
