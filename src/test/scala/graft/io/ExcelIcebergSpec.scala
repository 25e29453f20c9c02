package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExcelIcebergSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("xlsx round-trip preserves values and infers column types") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-xlsx")
    val path = tmp.resolve("t.xlsx").toString
    val df = Seq(
      (1L, "alpha", 1.5, true, java.sql.Timestamp.valueOf("2024-03-01 10:30:00")),
      (2L, "beta <&> \"q\"", -2.25, false, java.sql.Timestamp.valueOf("2024-03-02 00:00:00")),
      (3L, "gamma", 0.0, true, java.sql.Timestamp.valueOf("2024-12-31 23:59:59"))
    ).toDF("id", "name", "x", "flag", "ts")
    Excel.exportExcel(df, path)
    assert(Excel.sheetNames(path) == Seq("Sheet1"))
    val back = Excel.importExcel(spark, path)
    assert(back.columns.toSeq == Seq("id", "name", "x", "flag", "ts"))
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("x").dataType.typeName == "double")
    assert(back.schema("flag").dataType.typeName == "boolean")
    assert(back.schema("ts").dataType.typeName == "timestamp")
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getString(1) == "beta <&> \"q\"")
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5, -2.25, 0.0))
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
    assert(rows(0).getTimestamp(4).toString == "2024-03-01 10:30:00.0")
    assert(rows(2).getTimestamp(4).toString == "2024-12-31 23:59:59.0")
  }

  test("xlsx import handles sparse cells and missing header names") {
    // hand-built sheet: a gap cell (B skipped on row 2) must become null
    val tmp = java.nio.file.Files.createTempDirectory("graft-xlsx2")
    val path = tmp.resolve("sparse.xlsx").toString
    val df = Seq(("a", Some(1L), "x"), ("b", None, "y"))
      .toDF("k", "v", "w")
    Excel.exportExcel(df, path)
    val back = Excel.importExcel(spark, path)
    val r = back.orderBy("k").collect()
    assert(r(0).getLong(1) == 1L && r(1).isNullAt(1))
    assert(r.map(_.getString(2)).toSeq == Seq("x", "y"))
  }

  test("iceberg export/import round-trip with append snapshots and time travel") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-iceberg")
    val dir = tmp.resolve("tbl").toString
    val d1 = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    val d2 = Seq((3L, "c", 3.5)).toDF("id", "name", "x")
    val s1 = Iceberg.exportIceberg(d1, dir)
    val s2 = Iceberg.exportIceberg(d2, dir)
    assert(Iceberg.snapshotIds(dir) == Seq(s1, s2))
    // current snapshot sees both appends
    val cur = Iceberg.importIceberg(spark, dir)
    assert(cur.count() == 3)
    assert(cur.agg(sum("id")).as[Long].head() == 6L)
    // time travel to the first snapshot sees only the first append
    val old = Iceberg.importIceberg(spark, dir, snapshotId = Some(s1))
    assert(old.count() == 2)
    assert(old.select("name").as[String].collect().sorted.toSeq == Seq("a", "b"))
    // metadata layer is spec-shaped: manifest list + manifest avro exist
    val mdir = new java.io.File(dir, "metadata")
    assert(mdir.listFiles().exists(_.getName.endsWith("-manifest-list.avro")))
    assert(mdir.listFiles().exists(_.getName.startsWith("manifest-")))
    assert(new java.io.File(mdir, "version-hint.text").exists())
  }

  test("iceberg v2 position + equality deletes apply with sequence-number rules") {
    // Hand-built v2 table (the metadata a Flink/Spark v2 writer produces):
    //   data A (seq 1): (1,x)(2,y)(3,x)(4,z)(5,null)   — pos = row order
    //   data B (seq 3): (6,x)(7,y)(8,x)(9,z)(10,y)
    //   position delete P (seq 2): (A,1),(B,0)
    //       → removes id2 (2>=1) but NOT id6 (2>=3 false: B is newer)
    //   equality delete E (seq 3) on cat ∈ {x, null}
    //       → removes A's 1,3 (x) and 5 (null<=>null) but NOT B's x rows
    //         (equality needs delete.seq STRICTLY > data.seq; 3 > 3 false)
    // Survivors: {4, 6, 7, 8, 9, 10}
    import org.apache.avro.Schema
    import org.apache.avro.generic.GenericData
    val tmp = java.nio.file.Files.createTempDirectory("graft-iceberg-v2")
    val dir = tmp.resolve("tbl").toString
    new java.io.File(dir, "metadata").mkdirs()
    def onePartParquet(df: org.apache.spark.sql.DataFrame, sub: String): String = {
      df.coalesce(1).write.parquet(s"$dir/$sub")
      new java.io.File(s"$dir/$sub").listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .get.getAbsolutePath
    }
    val fileA = onePartParquet(Seq((1L, Some("x")), (2L, Some("y")),
      (3L, Some("x")), (4L, Some("z")), (5L, None)).toDF("id", "cat"), "dataA")
    val fileB = onePartParquet(Seq((6L, Some("x")), (7L, Some("y")),
      (8L, Some("x")), (9L, Some("z")), (10L, Some("y"))).toDF("id", "cat"), "dataB")
    val fileP = onePartParquet(Seq((fileA, 1L), (fileB, 0L))
      .toDF("file_path", "pos"), "delP")
    val fileE = onePartParquet(Seq(Some("x"), Option.empty[String])
      .toDF("cat"), "delE")

    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
        |]}}]}""".stripMargin)
    def entry(path: String, seq: Long, content: Int,
        eqIds: Seq[Int] = Nil): GenericData.Record = {
      val d = new GenericData.Record(entrySchema.getField("data_file").schema())
      d.put("content", content)
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("record_count", 5L)
      if (eqIds.nonEmpty)
        d.put("equality_ids", java.util.Arrays.asList(eqIds.map(Int.box): _*))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("sequence_number", seq); e.put("data_file", d)
      e
    }
    Iceberg.writeAvro(s"$dir/metadata/m-data.avro", entrySchema,
      Seq(entry(fileA, 1L, 0), entry(fileB, 3L, 0)))
    Iceberg.writeAvro(s"$dir/metadata/m-del.avro", entrySchema,
      Seq(entry(fileP, 2L, 1), entry(fileE, 3L, 2, eqIds = Seq(2))))
    val listSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"content","type":"int"},
        |{"name":"sequence_number","type":"long"}]}""".stripMargin)
    def mf(path: String, content: Int, seq: Long): GenericData.Record = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", path); r.put("content", content)
      r.put("sequence_number", seq)
      r
    }
    Iceberg.writeAvro(s"$dir/metadata/snap-99.avro", listSchema,
      Seq(mf("metadata/m-data.avro", 0, 3L), mf("metadata/m-del.avro", 1, 3L)))
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "metadata/v1.metadata.json"),
      s"""{"format-version":2,"location":"$dir","last-sequence-number":3,
         |"current-schema-id":0,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |  {"id":1,"name":"id","required":false,"type":"long"},
         |  {"id":2,"name":"cat","required":false,"type":"string"}]}],
         |"current-snapshot-id":99,
         |"snapshots":[{"snapshot-id":99,"sequence-number":3,
         |  "manifest-list":"metadata/snap-99.avro",
         |  "summary":{"operation":"overwrite"}}]}""".stripMargin)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "metadata/version-hint.text"), "1")

    val got = Iceberg.importIceberg(spark, dir)
    assert(got.columns.toSeq == Seq("id", "cat"),
      "delete helpers leaked into the schema")
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      Seq(4L, 6L, 7L, 8L, 9L, 10L))
    // scale shape: the delete side broadcasts — the base scan must not
    // shuffle through a sort-merge join
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"delete application shuffled the base scan:\n$plan")
    // equality-only sanity at a later data seq: nothing from B is touched
    assert(got.filter($"id" >= 6).count() == 5)

    // interaction: time travel × deletes — a pre-delete snapshot reading
    // only data manifest A must see A's rows UNDELETED
    val meta2 = java.nio.file.Files.readString(
      java.nio.file.Path.of(dir, "metadata/v1.metadata.json"))
    Iceberg.writeAvro(s"$dir/metadata/snap-98.avro", listSchema,
      Seq(mf("metadata/m-data.avro", 0, 1L)))
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "metadata/v1.metadata.json"),
      meta2.replace("\"snapshots\":[",
        """"snapshots":[{"snapshot-id":98,"sequence-number":1,
          |"manifest-list":"metadata/snap-98.avro",
          |"summary":{"operation":"append"}},""".stripMargin))
    val old = Iceberg.importIceberg(spark, dir, snapshotId = Some(98L))
    assert(old.count() == 10,
      "pre-delete snapshot must not apply later delete files")
    assert(Iceberg.importIceberg(spark, dir).count() == 6,
      "current snapshot must still apply deletes after the metadata edit")
  }

  test("iceberg import prunes columns and pushes filters to the parquet scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-iceberg2")
    val dir = tmp.resolve("tbl").toString
    Iceberg.exportIceberg(
      spark.range(1000).select(col("id"), (col("id") % 7).as("m"),
        concat(lit("r"), col("id")).as("s")), dir)
    val q = Iceberg.importIceberg(spark, dir)
      .filter(col("id") > 500).select("id", "m")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,500)"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("ReadSchema: struct<id:bigint,m:bigint,s:string>"),
      "column pruning failed — full schema read")
    assert(q.count() == 499)
  }
}
