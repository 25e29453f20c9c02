package graft.io

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container-file source/sink (the reference imports arbitrary
  * tabular formats through pandas/`datasets`; Avro is the row-oriented
  * sibling of the parquet path — public container format, avro-1.12 core
  * library, no external connector).
  *
  * Scale shape mirrors `WebDataset`: import reads whole container files as
  * `binaryFile` rows — each task decodes its own shards with
  * `DataFileStream`, so bytes never route through the driver (only one
  * header read on the driver resolves the schema); export writes ONE
  * container file per partition from the executors via the Hadoop FS API.
  * Shard sizing = partition sizing, exactly like parquet.
  *
  * Type mapping (both directions): boolean/int/long/float/double/string/
  * bytes, fixed→bytes, enum→string, union-with-null→nullable, array→array,
  * map→map(string,*), nested record→struct. Unsupported shapes fail fast
  * with the offending field named.
  */
object Avro {

  // ---------------------------------------------------------------- schema

  private[io] def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date")
        (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros")
        (TimestampType, false)
      else (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.FIXED   => (BinaryType, false)
    case Schema.Type.ENUM    => (StringType, false)
    case Schema.Type.NULL    => (NullType, true)
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toSparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.toSeq.map { f =>
        val (t, n) = toSparkType(f.schema())
        StructField(f.name(), t, nullable = n)
      }), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"unsupported avro union with ${branches.size} non-null branches: $s")
      val (t, _) = toSparkType(branches.head)
      (t, true)
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  private[io] def toAvroSchema(st: StructType, recordName: String): Schema = {
    def field(t: DataType, nullable: Boolean, path: String): Schema = {
      val base = t match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
        case LongType    => Schema.create(Schema.Type.LONG)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case DateType => // days since epoch, annotated for external readers
          org.apache.avro.LogicalTypes.date()
            .addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType => // micros since epoch
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case ArrayType(et, en) => Schema.createArray(field(et, en, s"$path.item"))
        case MapType(StringType, vt, vn) => Schema.createMap(field(vt, vn, s"$path.value"))
        case s: StructType => record(s, path.replace('.', '_'))
        case other => throw new IllegalArgumentException(
          s"unsupported spark type $other at $path for avro export")
      }
      if (nullable && base.getType != Schema.Type.NULL)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
    }
    def record(s: StructType, name: String): Schema = {
      val fields = s.fields.map { f =>
        new Schema.Field(f.name, field(f.dataType, f.nullable, s"$name.${f.name}"),
          null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
    }
    record(st, recordName)
  }

  // ---------------------------------------------------------------- values

  private def fromAvro(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (u: Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (b: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (days: Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue))
    case (micros: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      a.asScala.toSeq.map(fromAvro(_, et))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> fromAvro(mv, vt) }.toMap
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(f => fromAvro(r.get(f.name), f.dataType)))
    case (other, _) => other
  }

  private def toAvro(v: Any, t: DataType, s: Schema): Any = {
    val target = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
    (v, t) match {
      case (null, _) => null
      case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
      case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
      case (ts: java.sql.Timestamp, TimestampType) =>
        ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
      case (sq: scala.collection.Seq[_], ArrayType(et, _)) =>
        sq.map(toAvro(_, et, target.getElementType)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        m.map { case (k, mv) => k.toString -> toAvro(mv, vt, target.getValueType) }
          .toMap.asJava
      case (r: Row, st: StructType) =>
        val rec = new GenericData.Record(target)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(r.get(i), f.dataType, target.getField(f.name).schema()))
        }
        rec
      case (other, _) => other
    }
  }

  // ---------------------------------------------------------------- import

  /** Read a directory of `.avro` container files into a DataFrame. One
    * driver-side header read resolves the schema; the data decode runs
    * task-side over `binaryFile` rows.
    */
  def importAvro(spark: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.globStatus(new org.apache.hadoop.fs.Path(dir, "*.avro"))
    require(files != null && files.nonEmpty, s"no .avro files under $dir")
    val avroSchema = {
      val in = fs.open(files.head.getPath)
      try {
        val s = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
        try s.getSchema finally s.close()
      } finally in.close()
    }
    require(avroSchema.getType == Schema.Type.RECORD,
      s"top-level avro schema must be a record, got ${avroSchema.getType}")
    val sparkSchema = toSparkType(avroSchema)._1.asInstanceOf[StructType]
    val schemaJson = avroSchema.toString

    val bytes = spark.read.format("binaryFile").load(s"$dir/*.avro")
      .select("content")
    implicit val rowEnc = org.apache.spark.sql.Encoders.row(sparkSchema)
    bytes.mapPartitions { it =>
      val reader = new GenericDatumReader[GenericRecord](
        new Schema.Parser().parse(schemaJson))
      it.flatMap { fileRow =>
        val content = fileRow.getAs[Array[Byte]](0)
        val s = new DataFileStream(new ByteArrayInputStream(content), reader)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          while (s.hasNext) {
            val rec = s.next()
            out += fromAvro(rec, sparkSchema).asInstanceOf[Row]
          }
        } finally s.close()
        out
      }
    }
  }

  // ---------------------------------------------------------------- export

  /** Write a DataFrame as one `.avro` container file per partition under
    * `dir` (executor-side streaming writes through the Hadoop FS API; the
    * driver only creates the directory). Returns the number of files.
    */
  def exportAvro(df: DataFrame, dir: String,
      codec: String = "snappy"): Int = {
    val spark = df.sparkSession
    val schema = df.schema
    val avroSchema = toAvroSchema(schema, "graft_export")
    val schemaJson = avroSchema.toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(dir)
    val fsDriver = root.getFileSystem(conf.value)
    fsDriver.delete(root, true)
    fsDriver.mkdirs(root)
    val written = spark.sparkContext.longAccumulator("avro_files")
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val sch = new Schema.Parser().parse(schemaJson)
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.avro")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
        w.setCodec(codec match {
          case "null" | "none" => org.apache.avro.file.CodecFactory.nullCodec()
          case "deflate" => org.apache.avro.file.CodecFactory.deflateCodec(6)
          case _ => org.apache.avro.file.CodecFactory.snappyCodec()
        })
        w.create(sch, out)
        try it.foreach { row =>
          w.append(toAvro(row, schema, sch).asInstanceOf[GenericRecord])
        } finally w.close()
        written.add(1L)
      }
      Iterator.empty[Int]
    }.count()
    written.value.toInt
  }
}
