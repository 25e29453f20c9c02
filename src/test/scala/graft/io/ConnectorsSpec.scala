package graft.io

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ConnectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv and json round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    Connectors.exportCsv(df, s"$tmp/csv")
    val csv = Connectors.importCsv(spark, s"$tmp/csv")
    assert(csv.count() == 2 && csv.columns.toSeq == Seq("id", "name", "x"))
    Connectors.exportJson(df, s"$tmp/json")
    val json = Connectors.importJson(spark, s"$tmp/json")
    assert(json.count() == 2)
    assert(json.select("name").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("jsonl import reads one record per line") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl")
    java.nio.file.Files.write(tmp.resolve("data.jsonl"),
      "{\"id\":1,\"v\":\"x\"}\n{\"id\":2,\"v\":\"y\"}\n".getBytes("UTF-8"))
    val df = Connectors.importJsonl(spark, tmp.toString)
    assert(df.count() == 2)
    assert(df.select("v").as[String].collect().sorted.toSeq == Seq("x", "y"))
    // whole-document variant parses a single multi-line JSON array
    java.nio.file.Files.write(tmp.resolve("doc.json"),
      "[\n{\"id\":3,\"v\":\"z\"}\n]\n".getBytes("UTF-8"))
    val doc = Connectors.importJsonDocument(spark, tmp.resolve("doc.json").toString)
    assert(doc.count() == 1 && doc.select("v").as[String].head() == "z")
  }

  test("media-dir import loads binary files with metadata, distributed") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-media")
    val png = graft.functions.Images.solidPng(8, 4, 0x123456)
    java.nio.file.Files.write(tmp.resolve("a.png"), png)
    java.nio.file.Files.write(tmp.resolve("b.png"),
      graft.functions.Images.solidPng(2, 2, 0))
    java.nio.file.Files.write(tmp.resolve("skip.txt"), "not media".getBytes)
    val df = Connectors.importMediaDir(spark, tmp.toString, "*.png")
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("path", "modification_time", "size", "data"))
    val row = df.filter(org.apache.spark.sql.functions.col("path").endsWith("a.png")).head()
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("data"), png))
    assert(row.getAs[Long]("size") == png.length.toLong)
  }

  test("huggingface split-directory layout imports with a split column") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-hf").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "text").write.parquet(s"$tmp/train")
    Seq((3L, "c")).toDF("id", "text").write.parquet(s"$tmp/test")
    val df = Connectors.importHuggingFaceLayout(spark, tmp)
    assert(df.count() == 3)
    assert(df.filter("split = 'train'").count() == 2)
    assert(df.filter("split = 'test'").select("id").as[Long].head() == 3L)
  }

  test("sharded export writes bounded shards plus a manifest") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = spark.range(100).toDF("id").repartition(2)
    val shards = Connectors.exportShards(df, s"$tmp/ds", rowsPerShard = 30)
    assert(shards.nonEmpty)
    val back = Connectors.importParquet(spark, s"$tmp/ds")
    assert(back.count() == 100)
    // every shard respects the bound
    val counts = back
      .groupBy(org.apache.spark.sql.functions.input_file_name()).count()
      .select("count").as[Long].collect()
    assert(counts.forall(_ <= 30))
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/ds/_manifest.json")), "UTF-8")
    shards.foreach(s => assert(manifest.contains(s)))
    assert(manifest.contains("\"rows\":"))
  }

  test("jdbc import/export round-trip over embedded Derby with pushdown") {
    // SqlDataNode path (reference io/sql.py) against the Derby that ships
    // on Spark's own classpath — in-memory db, shared by local executors
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -1.0))
      .toDF("id", "name", "x")
    Connectors.exportJdbc(df, url, "t_round", props)
    val back = Connectors.importJdbc(spark, url, "t_round", props)
    assert(back.count() == 3)
    assert(back.orderBy("id").select("name").as[String].collect().toSeq ==
      Seq("a", "b", "c"))
    // filter pushdown reaches the JDBC scan
    val q = back.filter(org.apache.spark.sql.functions.col("x") > 0)
    assert(q.count() == 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"jdbc pushdown missing:\n$plan")
    // query-shaped import (import_sql semantics)
    // Derby folds unquoted identifiers to UPPER; Spark wrote them quoted
    val agg = Connectors.importJdbc(spark, url,
      """(SELECT "name", "x" * 2 AS x2 FROM t_round WHERE "id" <= 2) q""", props)
    assert(agg.count() == 2)
    assert(agg.orderBy("name").select("x2").as[Double].collect().toSeq ==
      Seq(3.0, 5.0))
  }

  test("labeled-media export writes media files plus a jsonl sample manifest") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fo").toString
    val df = Seq(
      (graft.functions.Images.solidPng(4, 4, 0xFF0000), "cat", 0.9,
        Seq(0.1, 0.2, 0.5, 0.6)),
      (graft.functions.Images.solidPng(6, 4, 0x00FF00), "dog", 0.7,
        Seq(0.3, 0.3, 0.9, 0.8)),
    ).toDF("img", "label", "confidence", "bbox")
    Connectors.exportLabeledMedia(df, "img", Seq("label", "confidence", "bbox"), tmp)
    // media files content-addressed under data/
    val media = new java.io.File(tmp, "data").listFiles()
      .filter(_.getName.endsWith(".bin"))
    assert(media.length == 2)
    // manifest: one JSON sample per line, filepath resolves to a real file
    val samples = Connectors.importJsonl(spark, s"$tmp/samples")
    assert(samples.count() == 2)
    val cat = samples.filter($"label" === "cat").head()
    assert(cat.getAs[String]("filepath").startsWith("data/"))
    assert(new java.io.File(tmp, cat.getAs[String]("filepath")).exists())
    assert(cat.getAs[Double]("confidence") == 0.9)
    assert(cat.getAs[scala.collection.Seq[Double]]("bbox").head == 0.1)
  }
}
