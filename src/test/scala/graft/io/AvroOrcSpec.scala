package graft.io

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroOrcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("orc round-trip preserves schema and values") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, "a", 1.5, true), (2L, "b", 2.5, false), (3L, null, 0.0, true))
      .toDF("id", "name", "x", "flag")
    Connectors.exportOrc(df, s"$tmp/orc")
    val back = Connectors.importOrc(spark, s"$tmp/orc")
    // ORC reads back with relaxed nullability; names+types must match exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("avro round-trip: primitives, bytes, nullable") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-avro").toString
    val df = Seq(
      (1L, "alpha", 1.5f, 2.5, true, Array[Byte](1, 2, 3)),
      (2L, null.asInstanceOf[String], -0.5f, 0.0, false, Array[Byte]())
    ).toDF("id", "name", "f", "d", "flag", "payload")
    val nFiles = Avro.exportAvro(df.repartition(2), s"$tmp/av")
    assert(nFiles >= 1 && nFiles <= 2)
    val back = Avro.importAvro(spark, s"$tmp/av").orderBy("id")
    assert(back.columns.toSeq == df.columns.toSeq)
    val rows = back.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("name") == "alpha")
    assert(rows(1).getAs[String]("name") == null)
    assert(rows(0).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2, 3))
    assert(rows(0).getAs[Float]("f") == 1.5f && rows(1).getAs[Double]("d") == 0.0)
    assert(rows(0).getAs[Boolean]("flag"))
  }

  test("avro round-trip: date/timestamp carry logicalType annotations") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-avrots").toString
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-03-15"),
        java.sql.Timestamp.valueOf("2024-03-15 12:34:56.789123")),
      (2L, java.sql.Date.valueOf("1969-07-20"),
        java.sql.Timestamp.valueOf("1969-07-20 20:17:40.0"))
    ).toDF("id", "d", "ts")
    Avro.exportAvro(df, s"$tmp/av")
    // the written schema must carry the logical types (external readers)
    val avroSchema = Avro.toAvroSchema(df.schema, "row")
    def lt(field: String) = { // unwrap the nullable union
      import scala.jdk.CollectionConverters._
      val s = avroSchema.getField(field).schema()
      val base = if (s.getType == org.apache.avro.Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL).get
      else s
      base.getLogicalType
    }
    assert(lt("d").getName == "date")
    assert(lt("ts").getName == "timestamp-micros")
    // and the import maps them back to DateType/TimestampType with values
    val back = Avro.importAvro(spark, s"$tmp/av").orderBy("id")
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("avro round-trip: arrays, maps, nested structs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-avro2").toString
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false)),
      StructField("scores", MapType(StringType, DoubleType, valueContainsNull = false)),
      StructField("meta", StructType(Seq(
        StructField("k", StringType), StructField("v", IntegerType))))
    ))
    val data = Seq(
      Row(1L, Seq("x", "y"), Map("a" -> 1.0, "b" -> 2.0), Row("kk", 7)),
      Row(2L, Seq.empty[String], Map.empty[String, Double], null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
    Avro.exportAvro(df, s"$tmp/av", codec = "deflate")
    val back = Avro.importAvro(spark, s"$tmp/av").orderBy("id").collect()
    assert(back(0).getSeq[String](1).toList == List("x", "y"))
    assert(back(0).getMap[String, Double](2).toMap == Map("a" -> 1.0, "b" -> 2.0))
    assert(back(0).getAs[Row]("meta") == Row("kk", 7))
    assert(back(1).getSeq[String](1).isEmpty)
    assert(back(1).getAs[Row]("meta") == null)
  }

  test("avro import decodes shards task-side across multiple files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-avro3").toString
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("s", org.apache.spark.sql.functions.expr("cast(id as string)"))
    val n = Avro.exportAvro(df.repartition(4), s"$tmp/av")
    assert(n == 4)
    val back = Avro.importAvro(spark, s"$tmp/av")
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == (0L until 1000L).sum)
    // more than one input task when files > 1
    assert(back.rdd.getNumPartitions >= 1)
  }

  test("avro schema mapping rejects multi-branch unions, maps spark types") {
    val u = org.apache.avro.SchemaBuilder.unionOf()
      .intType().and().stringType().endUnion()
    intercept[IllegalArgumentException](Avro.toSparkType(u))
    val st = Avro.toAvroSchema(StructType(Seq(
      StructField("d", DateType), StructField("t", TimestampType))), "r")
    assert(st.getField("d").schema().getTypes.get(1).getType
      == org.apache.avro.Schema.Type.INT)
    assert(st.getField("t").schema().getTypes.get(1).getType
      == org.apache.avro.Schema.Type.LONG)
  }
}
