package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Bloom-filter compaction: `compact(bloomFilterCols = ...)` writes
  * parquet bloom filters, the data-skipping leg min/max cannot provide —
  * equality lookups on hash-like columns whose ranges overlap every file.
  * The assertions read the filters straight from the parquet footers:
  * presence per row group, no false negatives on present values, and a
  * high rejection rate on absent probes (the skipping contract).
  */
class BloomCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (present?, membership test) per row group of each active file. */
  private def bloomProbes(t: GraftTable, column: String,
      values: Seq[String]): Seq[(Boolean, Seq[Boolean])] = {
    val conf = spark.sessionState.newHadoopConf()
    t.meta.activeFiles(t.currentVersion).flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        r.getFooter.getBlocks.asScala.map { b =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == column).get
          val bf = Option(r.getBloomFilterDataReader(b).readBloomFilter(cc))
          (bf.isDefined, bf.map { filter =>
            values.map(v => filter.findHash(
              filter.hash(org.apache.parquet.io.api.Binary.fromString(v))))
          }.getOrElse(values.map(_ => true)))
        }.toSeq
      } finally r.close()
    }
  }

  private def mkTable(name: String): GraftTable = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory(s"graft-$name").toString)
    val t = GraftTable.create(spark, cat, name, Seq(
      ColumnDef("k", "bigint"), ColumnDef("k2", "bigint"),
      ColumnDef("h", "string")))
    val rows = (0L until 512L).map(i =>
      (i, i * 37 % 512, java.util.UUID.nameUUIDFromBytes(
        s"row-$i".getBytes).toString))
    for (r <- 0 until 4)
      t.insert(rows.filter(_._1 % 4 == r).toDF("k", "k2", "h").repartition(3))
    t
  }

  test("bloom filters land in every row group; membership contract holds") {
    val t = mkTable("bl1")
    t.compact(targetFiles = 4, bloomFilterCols = Seq("h"), bloomFilterNdv = 256)
    val present = (0 until 16).map(i => java.util.UUID.nameUUIDFromBytes(
      s"row-${i * 31}".getBytes).toString)
    val absent = (0 until 50).map(i => s"absent-value-$i")
    val pres = bloomProbes(t, "h", present)
    assert(pres.nonEmpty && pres.forall(_._1), "every row group carries a bloom")
    // no false negatives: each present value is maybe-contained somewhere
    present.indices.foreach { i =>
      assert(pres.exists(_._2(i)), s"present value $i rejected everywhere")
    }
    // absent probes: the overwhelming majority of (group, value) pairs reject
    val abs = bloomProbes(t, "h", absent)
    val pairs = abs.map(_._2.count(identity)).sum
    val total = abs.size * absent.size
    assert(pairs <= total / 20, s"bloom rejected too little: $pairs/$total hits")
    // data intact; point lookup correct
    assert(t.read().count() == 512)
    val probe = java.util.UUID.nameUUIDFromBytes("row-77".getBytes).toString
    assert(t.read().filter(col("h") === probe).select("k").as[Long].head() == 77L)
  }

  test("bloom composes with clustering (linear and z-order); revert intact") {
    val t = mkTable("bl2")
    val vPre = t.currentVersion
    t.compact(targetFiles = 4, clusterBy = Seq("k", "k2"), zOrder = true,
      bloomFilterCols = Seq("h"), bloomFilterNdv = 256)
    assert(bloomProbes(t, "h", Seq("x")).forall(_._1))
    assert(t.read().count() == 512)
    t.revert(vPre)
    assert(t.currentVersion == vPre)
    assert(t.read().count() == 512)
    // linear form too
    t.compact(targetFiles = 4, clusterBy = Seq("k"),
      bloomFilterCols = Seq("h"), bloomFilterNdv = 256)
    assert(bloomProbes(t, "h", Seq("x")).forall(_._1))
  }

  test("bloom request forces a rewrite even when the file count already fits") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-bl4").toString)
    val t = GraftTable.create(spark, cat, "bl4", Seq(
      ColumnDef("k", "bigint"), ColumnDef("h", "string")))
    t.insert((0L until 256L).map(i => (i, java.util.UUID.nameUUIDFromBytes(
      s"r$i".getBytes).toString)).toDF("k", "h").repartition(3))
    // 3 files <= 8 would noop a plain compact — with blooms requested it
    // must rewrite anyway, or the request silently does nothing
    t.compact(targetFiles = 8, bloomFilterCols = Seq("h"), bloomFilterNdv = 256)
    val probes = bloomProbes(t, "h", Seq("x"))
    assert(probes.nonEmpty && probes.forall(_._1),
      "bloom-requesting compact must not noop on a small file count")
  }

  test("fully dictionary-encoded chunks carry no bloom (dictionary is exact)") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-bl5").toString)
    val t = GraftTable.create(spark, cat, "bl5", Seq(
      ColumnDef("k", "bigint"), ColumnDef("h", "string")))
    // 8 distinct values over 512 rows: dictionary encoding never falls
    // back, and parquet-mr intentionally omits the bloom — the dictionary
    // page already gives exact membership skipping
    t.insert((0L until 512L).map(i => (i, s"cat-${i % 8}"))
      .toDF("k", "h").repartition(3))
    t.compact(targetFiles = 2, bloomFilterCols = Seq("h"), bloomFilterNdv = 8)
    assert(bloomProbes(t, "h", Seq("x")).forall(!_._1),
      "low-cardinality dictionary chunks should omit the bloom")
    assert(t.read().count() == 512)
  }

  test("unknown bloom column raises; uncompacted files carry no blooms") {
    val t = mkTable("bl3")
    intercept[IllegalArgumentException] {
      t.compact(targetFiles = 2, bloomFilterCols = Seq("nope"))
    }
    assert(bloomProbes(t, "h", Seq("x")).forall(!_._1),
      "plain insert files should not have bloom filters")
  }
}
