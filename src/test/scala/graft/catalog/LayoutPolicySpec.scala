package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Persisted layout policy + size-targeted optimize(): the policy
  * survives a catalog reload, optimize derives the file count from live
  * data volume (not a caller-supplied constant), and the rewrite carries
  * the policy's clustering and bloom filters.
  */
class LayoutPolicySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkTable(name: String): (Catalog, GraftTable) = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory(s"graft-$name").toString)
    val t = GraftTable.create(spark, cat, name, Seq(
      ColumnDef("a", "bigint"), ColumnDef("b", "bigint"),
      ColumnDef("h", "string")))
    val rows = (0L until 2048L).map(i => (i, i * 37 % 2048, s"h-${i * 13}"))
    for (r <- 0 until 4)
      t.insert(rows.filter(_._1 % 4 == r).toDF("a", "b", "h").repartition(3))
    (cat, t)
  }

  test("policy persists across reload; optimize applies cluster + bloom + size") {
    val (cat, t) = mkTable("lp1")
    val policy = LayoutPolicy(clusterBy = Seq("a", "b"), zOrder = true,
      bloomFilterCols = Seq("h"), bloomFilterNdv = 2048,
      targetFileBytes = 16 * 1024)
    t.setLayoutPolicy(policy)

    // reload through the catalog: the persisted meta carries the policy
    val t2 = GraftTable.open(spark, cat, "lp1")
    assert(t2.layoutPolicy.contains(policy))

    val preBytes = t2.meta.activeFiles(t2.currentVersion).map { f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(f).toUri.getPath))
    }.sum
    val expectedFiles = math.max(1L,
      (preBytes + policy.targetFileBytes - 1) / policy.targetFileBytes)

    t2.optimize()
    val files = t2.meta.activeFiles(t2.currentVersion)
    // sizes shift under the rewrite (sorting improves encoding), so the
    // count tracks the PRE-rewrite estimate, with slack for that drift
    assert(files.size <= expectedFiles * 2 && files.size >= 1,
      s"${files.size} files vs expected ~$expectedFiles")
    assert(files.size > 1, "fixture should be big enough to split")
    assert(t2.read().count() == 2048)

    // the rewrite carried the policy: blooms present + z-prunable footers
    val conf = spark.sessionState.newHadoopConf()
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.foreach { blk =>
        val cc = blk.getColumns.asScala.find(_.getPath.toDotString == "h").get
        assert(r.getBloomFilterDataReader(blk).readBloomFilter(cc) != null,
          s"missing bloom in $f")
      } finally r.close()
    }
    def spans(colName: String): Seq[(Long, Long)] = files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val st = r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala
          .filter(_.getPath.toDotString == colName).map(_.getStatistics))
        (st.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue()).min,
          st.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue()).max)
      } finally r.close()
    }
    // z-order: a narrow window on either column leaves skippable files
    if (files.size >= 4) {
      assert(spans("a").count { case (mn, mx) => mx < 0 || mn >= 512 } > 0)
      assert(spans("b").count { case (mn, mx) => mx < 0 || mn >= 512 } > 0)
    }
  }

  test("optimize without a policy refuses; bad policy columns refuse") {
    val (_, t) = mkTable("lp2")
    intercept[IllegalStateException](t.optimize())
    intercept[IllegalArgumentException](
      t.setLayoutPolicy(LayoutPolicy(clusterBy = Seq("nope"))))
    intercept[IllegalArgumentException](
      t.setLayoutPolicy(LayoutPolicy(bloomFilterCols = Seq("nope"))))
    intercept[IllegalArgumentException](
      t.setLayoutPolicy(LayoutPolicy(clusterBy = Seq("a"), zOrder = true)))
    intercept[IllegalArgumentException](
      t.setLayoutPolicy(LayoutPolicy(targetFileBytes = 0)))
  }

  test("huge target size collapses to one file; policy survives optimize + DML") {
    val (_, t) = mkTable("lp3")
    t.setLayoutPolicy(LayoutPolicy(clusterBy = Seq("a"),
      targetFileBytes = 1L << 40))
    t.optimize()
    assert(t.meta.activeFiles(t.currentVersion).size == 1)
    t.delete("a < 100")
    assert(t.layoutPolicy.isDefined, "policy must survive later DML")
    t.optimize()
    assert(t.read().count() == 1948)
  }

  test("optimize races concurrent inserts: serialized, content exact, layout applied") {
    val (_, t) = mkTable("lp4")
    t.setLayoutPolicy(LayoutPolicy(clusterBy = Seq("a", "b"), zOrder = true,
      bloomFilterCols = Seq("h"), bloomFilterNdv = 4096,
      targetFileBytes = 64 * 1024))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val inserter = new Thread(() =>
      try {
        for (i <- 0 until 6) {
          val base = 10000L + i * 100
          t.insert((base until base + 100)
            .map(j => (j, j % 97, s"x-$j")).toDF("a", "b", "h"))
        }
      } catch { case e: Throwable => errs.add(e) })
    val optimizer = new Thread(() =>
      try { for (_ <- 0 until 3) t.optimize() }
      catch { case e: Throwable => errs.add(e) })
    inserter.start(); optimizer.start()
    inserter.join(120000); optimizer.join(120000)
    assert(errs.isEmpty, s"concurrent failure: ${errs.peek()}")
    // every row exactly once: the 2048 originals + 600 raced inserts
    assert(t.read().count() == 2048 + 600)
    assert(t.read().select("a").distinct().count() == 2048 + 600)
    // a final optimize on the quiesced table applies the full policy
    t.optimize()
    assert(t.read().count() == 2648)
  }
}
