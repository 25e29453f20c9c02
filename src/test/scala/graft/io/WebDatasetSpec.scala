package graft.io

import java.nio.charset.StandardCharsets.UTF_8

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebDatasetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tar codec: ustar round-trip, block padding, system-tar readability") {
    val entries = Seq(
      "a.txt" -> "hello".getBytes(UTF_8),
      "b.bin" -> Array.tabulate(1000)(_.toByte), // crosses a block boundary
      "c.json" -> """{"k":1}""".getBytes(UTF_8),
      "empty.txt" -> Array.emptyByteArray)
    val bos = new java.io.ByteArrayOutputStream()
    WebDataset.writeTar(entries.iterator, bos)
    val tar = bos.toByteArray
    assert(tar.length % 512 == 0)
    val back = WebDataset.readTar(tar)
    assert(back.map(_._1) == entries.map(_._1))
    assert(back.zip(entries).forall { case ((_, a), (_, b)) =>
      java.util.Arrays.equals(a, b) })
    // cross-check with the system tar(1): the format claim is ustar, so an
    // external reader must list the same entries
    val tmp = java.nio.file.Files.createTempFile("graft-wds", ".tar")
    java.nio.file.Files.write(tmp, tar)
    val listed = scala.sys.process.Process(Seq("tar", "-tf", tmp.toString))
      .!!.trim.split("\n").toSeq
    assert(listed == entries.map(_._1))
  }

  test("tar reader terminates on garbage, truncations, and corrupt sizes") {
    val rnd = new java.util.Random(7)
    for (_ <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      WebDataset.readTar(b) // must return, never throw or loop
    }
    // corrupt octal size field in an otherwise valid tar
    val bos = new java.io.ByteArrayOutputStream()
    WebDataset.writeTar(Iterator("a.txt" -> "hello".getBytes("UTF-8")), bos)
    val tar = bos.toByteArray
    for (junk <- Seq("77777777777", "99999999999", "           ")) {
      val c = tar.clone()
      System.arraycopy(junk.getBytes("UTF-8"), 0, c, 124, junk.length)
      WebDataset.readTar(c)
    }
    for (len <- 0 until tar.length by 13) WebDataset.readTar(tar.take(len))
  }

  test("export/import round-trip: samples, binary + text entries, nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wds").toString
    val df = Seq(
      ("s001", Array[Byte](1, 2, 3), Some("caption one"), Some(7L)),
      ("s002", Array[Byte](4, 5), None, Some(9L)), // null txt → entry skipped
      ("s003", Array[Byte](6), Some("three"), None))
      .toDF("key", "img", "txt", "label")
    val shards = WebDataset.exportWebDataset(df, dir, "key", numShards = 2)
    assert(shards >= 1 && shards <= 2)
    val long = WebDataset.importWebDataset(spark, dir)
    assert(long.columns.toSeq == Seq("shard", "key", "ext", "content"))
    // 3 img + 2 txt + 2 label entries
    assert(long.count() == 7)
    val imgs = long.filter($"ext" === "img").orderBy("key")
      .select("key", "content").as[(String, Array[Byte])].collect()
    assert(imgs.map(_._1).toSeq == Seq("s001", "s002", "s003"))
    assert(imgs(0)._2.toSeq == Seq[Byte](1, 2, 3))
    val wide = WebDataset.importWebDatasetWide(spark, dir).orderBy("key")
    assert(wide.columns.toSeq == Seq("key", "img", "label", "txt"))
    val r = wide.collect()
    assert(new String(r(0).getAs[Array[Byte]]("txt"), UTF_8) == "caption one")
    assert(new String(r(1).getAs[Array[Byte]]("label"), UTF_8) == "9")
    assert(r(1).isNullAt(3) && r(2).isNullAt(1) == false)
    // a sample's entries are adjacent within one shard (loader contract)
    val byShard = long.select("shard", "key").as[(String, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).distinct.length)
    assert(byShard.values.forall(_ == 1), "sample split across shards")
    // the shard manifest (executor-computed stats, driver-assembled)
    // matches reality: entry counts per shard sum to the long-form rows
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of(dir, "_shards.json")), UTF_8)
    val counts = """"entries":(\d+)""".r.findAllMatchIn(manifest)
      .map(_.group(1).toLong).toSeq
    assert(counts.sum == 7, s"manifest entries diverged: $manifest")
    assert(""""shard":"shard-\d{5}\.tar"""".r
      .findAllIn(manifest).size == shards)
  }
}
