package graft.io

import java.io.File

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Apache Iceberg table import/export (reference `io/iceberg.py:21-205`
  * `export_iceberg`/`import_iceberg` via pyiceberg). Here: a pure-JVM
  * HadoopCatalog-style directory layout — metadata JSON, avro manifest
  * list, avro manifests, parquet data files — parsed with Jackson + Avro
  * (both on Spark's own classpath; no Iceberg runtime).
  *
  * Scale shape: only the METADATA passes through the driver (one JSON +
  * a few KB of avro per snapshot — that is Iceberg's design point); the
  * data files feed a normal distributed parquet scan, so pushdown/pruning
  * apply as with any `spark.read.parquet`.
  *
  * Supported: format v1/v2 read (current or named snapshot) INCLUDING
  * v2 row-level deletes — position deletes (file_path, pos) and equality
  * deletes (equality_ids), applied with Iceberg's sequence-number rules
  * (position: delete.seq >= data.seq; equality: delete.seq > data.seq,
  * spec §"Scan Planning"; entries missing a sequence number inherit the
  * manifest's) — and unpartitioned v1 write with snapshot history.
  *
  * Delete application is distributed anti-joins keyed on
  * (`_metadata.file_path`, `_metadata.row_index`) for position deletes
  * and on the equality columns for equality deletes. Delete files are
  * tiny relative to data (that is their design point), so AQE broadcasts
  * the delete side and the base scan stays map-only — no data shuffle.
  */
object Iceberg {

  private val mapper = new ObjectMapper()

  // ---- import -----------------------------------------------------------

  /** Read an Iceberg table directory as a DataFrame (current snapshot, or
    * `snapshotId` for time travel — the same surface as the reference's
    * snapshot-based reads).
    */
  def importIceberg(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val meta = readLatestMetadata(tableDir)
    val snaps = meta.path("snapshots").elements().asScala.toSeq
    require(snaps.nonEmpty, s"no snapshots in $tableDir")
    val current = snapshotId match {
      case Some(id) => snaps.find(_.path("snapshot-id").asLong == id)
        .getOrElse(throw new IllegalArgumentException(s"no snapshot $id"))
      case None =>
        val cur = meta.path("current-snapshot-id").asLong
        snaps.find(_.path("snapshot-id").asLong == cur).getOrElse(snaps.last)
    }
    val entries = listFiles(tableDir, current)
    val dataFiles = entries.filter(_.content == 0)
    require(dataFiles.nonEmpty, s"snapshot has no data files in $tableDir")
    val base = spark.read.parquet(
      dataFiles.map(e => resolvePath(tableDir, e.path)): _*)
    val deletes = entries.filter(_.content != 0)
    if (deletes.isEmpty) base
    else applyDeletes(spark, tableDir, base, dataFiles, deletes, meta)
  }

  /** Snapshot ids in the table's history, oldest first. */
  def snapshotIds(tableDir: String): Seq[Long] =
    readLatestMetadata(tableDir).path("snapshots").elements().asScala
      .map(_.path("snapshot-id").asLong).toSeq

  private def readLatestMetadata(tableDir: String): JsonNode = {
    val mdir = new File(tableDir, "metadata")
    require(mdir.isDirectory, s"no metadata/ under $tableDir")
    val hint = new File(mdir, "version-hint.text")
    val metaFile =
      if (hint.isFile) {
        val v = java.nio.file.Files.readString(hint.toPath).trim
        val f = new File(mdir, s"v$v.metadata.json")
        if (f.isFile) f else new File(mdir, s"$v.metadata.json")
      } else {
        // no hint: lexically-largest metadata file is the newest for both
        // vN.metadata.json and 00000N-uuid.metadata.json naming schemes
        mdir.listFiles().filter(_.getName.endsWith(".metadata.json"))
          .sortBy(_.getName).lastOption.getOrElse(
            throw new IllegalArgumentException(s"no *.metadata.json in $mdir"))
      }
    mapper.readTree(java.nio.file.Files.readString(metaFile.toPath))
  }

  /** One live file reachable from a snapshot: `content` 0 = data,
    * 1 = position deletes, 2 = equality deletes (iceberg spec manifest
    * `data_file.content`); `seq` is the entry's data sequence number
    * (inherited from the manifest when the entry carries none — the
    * spec's inheritance rule for ADDED entries).
    */
  private final case class FileEntry(path: String, seq: Long, content: Int,
      equalityIds: Seq[Int])

  /** Walk snapshot → manifest list → manifests → live file entries. */
  private def listFiles(tableDir: String, snap: JsonNode): Seq[FileEntry] = {
    val manifests: Seq[(String, Int, Long)] = // (path, content, seq)
      if (snap.has("manifest-list")) {
        readAvro(resolvePath(tableDir, snap.path("manifest-list").asText()))
          .map { r =>
            (r.get("manifest_path").toString,
              field(r, "content").map(_.toString.toInt).getOrElse(0),
              field(r, "sequence_number").map(_.toString.toLong).getOrElse(0L))
          }
      } else { // v1 inline manifest array
        snap.path("manifests").elements().asScala
          .map(m => (m.asText(), 0, 0L)).toSeq
      }
    manifests.flatMap { case (mp, mContent, mSeq) =>
      readAvro(resolvePath(tableDir, mp)).flatMap { entry =>
        val status = field(entry, "status").map(_.toString.toInt).getOrElse(1)
        if (status == 2) None // DELETED entry
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val fmt = String.valueOf(df.get("file_format")).toUpperCase
          require(fmt == "PARQUET", s"unsupported data file format $fmt")
          val seq = field(entry, "sequence_number")
            .map(_.toString.toLong).getOrElse(mSeq)
          val content = field(df, "content")
            .map(_.toString.toInt).getOrElse(mContent)
          val eqIds = field(df, "equality_ids").toSeq.flatMap {
            case l: java.util.List[_] => l.asScala.map(_.toString.toInt).toSeq
            case _ => Seq.empty[Int]
          }
          Some(FileEntry(df.get("file_path").toString, seq, content, eqIds))
        }
      }
    }
  }

  /** Apply v2 position + equality deletes to the base scan as anti-joins.
    * The delete side is small by construction (compaction folds deletes
    * into data files), so these joins broadcast under AQE; the base scan
    * itself never shuffles.
    */
  private def applyDeletes(spark: SparkSession, tableDir: String,
      base: DataFrame, dataFiles: Seq[FileEntry], deletes: Seq[FileEntry],
      meta: JsonNode): DataFrame = {
    import org.apache.spark.sql.functions._
    val pathCol = "_ib_file"; val posCol = "_ib_pos"; val seqCol = "_ib_seq"
    Seq(pathCol, posCol, seqCol).foreach(c => require(!base.columns.contains(c),
      s"column name $c collides with the delete-application helpers"))
    def normExpr(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^file:(//)?", "")
    // data sequence numbers: a tiny (path, seq) side broadcast onto rows
    val seqDf = spark.createDataFrame(
      dataFiles.map(e => (resolvePath(tableDir, e.path), e.seq)))
      .toDF(pathCol, seqCol)
    var cur = base
      .withColumn(pathCol, normExpr(col("_metadata.file_path")))
      .withColumn(posCol, col("_metadata.row_index"))
      .join(broadcast(seqDf), Seq(pathCol), "left")
    val posDeletes = deletes.filter(_.content == 1)
    if (posDeletes.nonEmpty) {
      val pd = posDeletes.map { e =>
        spark.read.parquet(resolvePath(tableDir, e.path)).select(
          normExpr(col("file_path")).as("_del_file"),
          col("pos").cast("long").as("_del_pos"),
          lit(e.seq).as("_del_seq"))
      }.reduce(_ unionByName _)
      cur = cur.join(pd,
        cur(pathCol) === pd("_del_file") && cur(posCol) === pd("_del_pos") &&
          pd("_del_seq") >= cur(seqCol), "left_anti")
    }
    val idToName: Map[Int, String] = schemaFields(meta)
    deletes.filter(_.content == 2).groupBy(_.equalityIds).foreach {
      case (ids, files) =>
        require(ids.nonEmpty, "equality delete file carries no equality_ids")
        val names = ids.map(id => idToName.getOrElse(id,
          throw new IllegalArgumentException(s"unknown equality field id $id")))
        val del = files.map { e =>
          spark.read.parquet(resolvePath(tableDir, e.path)).select(
            names.map(n => col(n).as(s"_del_$n")) :+ lit(e.seq).as("_del_seq"): _*)
        }.reduce(_ unionByName _)
        // Iceberg equality matches null-to-null → null-safe compare
        val cond = names.map(n => cur(n) <=> del(s"_del_$n"))
          .reduce(_ && _) && del("_del_seq") > cur(seqCol)
        cur = cur.join(del, cond, "left_anti")
    }
    cur.drop(pathCol, posCol, seqCol)
  }

  /** field-id → name from the metadata schema (single `schema` or the
    * newer `schemas` + `current-schema-id` layout).
    */
  private def schemaFields(meta: JsonNode): Map[Int, String] = {
    val schema =
      if (meta.has("schema")) meta.path("schema")
      else {
        val cur = meta.path("current-schema-id").asInt
        meta.path("schemas").elements().asScala
          .find(_.path("schema-id").asInt == cur)
          .getOrElse(meta.path("schemas").elements().asScala.toSeq.head)
      }
    schema.path("fields").elements().asScala
      .map(f => f.path("id").asInt -> f.path("name").asText()).toMap
  }

  /** Null-safe field access: avro's Record.get THROWS on absent fields
    * (schema evolution across iceberg versions makes absence normal).
    */
  private def field(r: GenericRecord, name: String): Option[AnyRef] =
    Option(r.getSchema.getField(name)).flatMap(f => Option(r.get(f.pos())))

  private def readAvro(path: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new File(path), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toVector finally reader.close()
  }

  /** Iceberg file paths may be absolute URIs (file:///…) or
    * location-relative; normalize both to local paths.
    */
  private def resolvePath(tableDir: String, p: String): String =
    if (p.startsWith("file:")) p.replaceFirst("^file:(//)?", "")
    else if (p.startsWith("/")) p
    else s"$tableDir/$p"

  // ---- export -----------------------------------------------------------

  private val ManifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104}
      |]},"field-id":2}]}""".stripMargin)

  private val ManifestFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503}
      |]}""".stripMargin)

  /** Create or append to an unpartitioned Iceberg v1 table directory
    * (reference `export_iceberg` `if_exists='append'`/create path). The
    * parquet write is fully distributed; the driver writes only the
    * manifest avro + metadata JSON (KBs), which is exactly the Iceberg
    * commit protocol's driver-side footprint.
    */
  def exportIceberg(df: DataFrame, tableDir: String): Long = {
    val spark = df.sparkSession
    val dir = new File(tableDir)
    new File(dir, "metadata").mkdirs()
    val existing: Option[JsonNode] =
      if (new File(dir, "metadata/version-hint.text").isFile)
        Some(readLatestMetadata(tableDir)) else None
    val version = existing.map { m =>
      m.path("snapshots").size() + 1
    }.getOrElse(1)
    val snapshotId = version.toLong // deterministic commit ids

    // 1. distributed parquet write of this snapshot's data files
    val dataSubdir = s"data/snap-$snapshotId"
    df.write.parquet(s"$tableDir/$dataSubdir")
    val files = new File(dir, dataSubdir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val counts = spark.read.parquet(s"$tableDir/$dataSubdir")
      .groupBy(org.apache.spark.sql.functions.input_file_name().as("f"))
      .count().collect().map(r => new File(new java.net.URI(
        r.getString(0)).getPath).getName -> r.getLong(1)).toMap

    // 2. manifest (one per snapshot) + manifest list
    val manifestPath = s"$tableDir/metadata/manifest-$snapshotId.avro"
    writeAvro(manifestPath, ManifestEntrySchema, files.toIndexedSeq.map { f =>
      val d = new GenericData.Record(ManifestEntrySchema.getField("data_file").schema())
      d.put("file_path", s"$dataSubdir/${f.getName}")
      d.put("file_format", "PARQUET")
      d.put("partition", new GenericData.Record(
        d.getSchema.getField("partition").schema()))
      d.put("record_count", counts.getOrElse(f.getName, 0L))
      d.put("file_size_in_bytes", f.length())
      val e = new GenericData.Record(ManifestEntrySchema)
      e.put("status", 1); e.put("snapshot_id", snapshotId); e.put("data_file", d)
      e
    })
    // append-mode manifest list = this snapshot's manifest + all priors'
    val priorManifests: Seq[String] = existing.toSeq.flatMap { m =>
      val cur = m.path("current-snapshot-id").asLong
      m.path("snapshots").elements().asScala
        .find(_.path("snapshot-id").asLong == cur).toSeq
        .flatMap(s => readAvro(resolvePath(tableDir,
          s.path("manifest-list").asText()))
          .map(_.get("manifest_path").toString))
    }
    val listPath = s"$tableDir/metadata/snap-$snapshotId-manifest-list.avro"
    val allManifests = priorManifests :+ s"metadata/manifest-$snapshotId.avro"
    writeAvro(listPath, ManifestFileSchema, allManifests.map { mp =>
      val r = new GenericData.Record(ManifestFileSchema)
      r.put("manifest_path", mp)
      r.put("manifest_length",
        new File(dir, mp.stripPrefix("metadata/")).length() max 0L)
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", snapshotId)
      r
    })

    // 3. metadata json (schema from the DataFrame; snapshot log append)
    val fields = df.schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id":${i + 1},"name":${jsonQ(f.name)},"required":false,"type":${jsonQ(icebergType(f.dataType))}}"""
    }.mkString(",")
    val priorSnaps = existing.map { m =>
      m.path("snapshots").elements().asScala.map(_.toString).mkString(",") + ","
    }.getOrElse("")
    val snapJson =
      s"""{"snapshot-id":$snapshotId,"timestamp-ms":$snapshotId,"manifest-list":${jsonQ(s"metadata/snap-$snapshotId-manifest-list.avro")},"summary":{"operation":"append"}}"""
    val metaJson =
      s"""{"format-version":1,"table-uuid":"00000000-0000-0000-0000-000000000000",
         |"location":${jsonQ(tableDir)},"last-updated-ms":$snapshotId,
         |"last-column-id":${df.schema.size},
         |"schema":{"type":"struct","schema-id":0,"fields":[$fields]},
         |"partition-spec":[],"properties":{},
         |"current-snapshot-id":$snapshotId,
         |"snapshots":[$priorSnaps$snapJson]}""".stripMargin
    java.nio.file.Files.writeString(
      new File(dir, s"metadata/v$version.metadata.json").toPath, metaJson)
    java.nio.file.Files.writeString(
      new File(dir, "metadata/version-hint.text").toPath, version.toString)
    snapshotId
  }

  private[io] def writeAvro(path: String, schema: Schema,
      records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(path))
    try records.foreach(w.append) finally w.close()
  }

  private def icebergType(t: DataType): String = t match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case StringType => "string"
    case BooleanType => "boolean"
    case DateType => "date"
    case _: TimestampType => "timestamptz"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"no Iceberg primitive for $other — project to a supported type first")
  }

  private def jsonQ(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
