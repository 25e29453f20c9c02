package graft.io

import graft.catalog.GraftTable
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Import/export connectors (reference `pixeltable/io/`: `import_csv/json/
  * parquet/pandas/sql`, `export_parquet/csv/json`, `io/__init__.py:4-13`).
  * Spark's readers/writers cover the matrix natively; these wrappers pin the
  * options that match the reference's semantics (header CSV, line-delimited
  * JSON) and bridge into versioned tables.
  */
object Connectors {

  def importCsv(spark: SparkSession, path: String,
      header: Boolean = true, inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  def importJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** JSON-lines import (reference `import_json` on .jsonl sources): one
    * record per line — Spark's native json reader semantics, named
    * explicitly; `multiLine=false` keeps the scan splittable (a whole-file
    * JSON document would serialize one file per task).
    */
  def importJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "false").json(path)

  /** Whole-document JSON import (one JSON value spanning the file). */
  def importJsonDocument(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** Directory-of-media import (the reference's media-dir import: a glob of
    * image/audio/video files becomes rows) via Spark's binaryFile source:
    * (path, modification_time, size, data). The scan distributes across
    * executors — bytes never route through the driver.
    */
  def importMediaDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    val reader = spark.read.format("binaryFile")
    (if (glob == "*") reader else reader.option("pathGlobFilter", glob))
      .load(dir)
      .withColumnRenamed("modificationTime", "modification_time")
      .withColumnRenamed("length", "size")
      .withColumnRenamed("content", "data")
  }

  def importParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC import (columnar alternative to parquet; Spark's native vectorized
    * ORC reader — predicate pushdown and column pruning apply the same way).
    */
  def importOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def exportOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** HuggingFace-datasets on-disk layout import (reference
    * `import_huggingface_dataset`, `io/hf_datasets.py:159` — there the
    * `datasets` lib materializes arrow/parquet per split): each
    * subdirectory of `dir` is a split of parquet shards; rows get a
    * `split` column, like the reference's `column_name_for_split`. One
    * distributed scan per split, unioned by name.
    */
  def importHuggingFaceLayout(spark: SparkSession, dir: String,
      splitCol: String = "split"): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val splits = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).sorted
    require(splits.nonEmpty, s"no split directories under $dir")
    splits.map { split =>
      spark.read.parquet(s"$dir/$split")
        .withColumn(splitCol, org.apache.spark.sql.functions.lit(split))
    }.reduce(_.unionByName(_))
  }

  /** SqlDataNode / import_sql (reference `io/sql.py`): read a table or a
    * pushed-down query (`table` may be `(SELECT …) q`) over JDBC. Executors
    * open their own connections; pass partitioning options (partitionColumn/
    * lowerBound/upperBound/numPartitions) in `props` for a parallel read.
    */
  def importJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Export into a SQL database over JDBC (executor-side batched inserts). */
  def exportJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def exportJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def exportParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** INSERT…SELECT into a versioned table (reference `t.insert(query)`,
    * `plan.py:342-364`): computed columns evaluate on the way in.
    */
  def importInto(table: GraftTable, df: DataFrame): Long = table.insert(df)

  /** Sharded dataset export (the reference's lancedb/pytorch export layout,
    * `io/lancedb.py`, `io/__init__.py`): bounded-size parquet shards plus a
    * `_manifest.json` listing every shard with its row count — the layout a
    * DataLoader or downstream ingest consumes shard-by-shard. Sharding
    * happens on the executors (`maxRecordsPerFile`); only the file listing
    * touches the driver.
    */
  def exportShards(df: DataFrame, path: String, rowsPerShard: Int): Seq[String] = {
    require(rowsPerShard > 0, s"bad shard size $rowsPerShard")
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerShard.toString)
      .parquet(path)
    val spark = df.sparkSession
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    val shards = fs.listStatus(fsPath)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName).sorted.toSeq
    val counts = spark.read.parquet(path)
      .groupBy(org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.input_file_name(), "/"), -1).as("shard"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val manifest = shards.map { s =>
      s"""{"shard":${jsonQuote(s)},"rows":${counts.getOrElse(s, 0L)}}"""
    }.mkString("[", ",", "]")
    val out = fs.create(new org.apache.hadoop.fs.Path(fsPath, "_manifest.json"), true)
    try out.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    shards
  }

  /** FiftyOne-style labeled-media dataset export (reference
    * `io/fiftyone.py`: samples = media filepath + named labels): media
    * cells land content-addressed under `<dir>/data` ON THE EXECUTORS
    * (`Multimodal.saveMedia`), then a `samples.jsonl` manifest pairs each
    * media file with its label columns — one JSON object per line, written
    * as a distributed text output (no driver materialization). Classifica-
    * tion labels are plain values; detection labels are JSON-encoded
    * structs, which is how FiftyOne's import expects nested label data.
    */
  def exportLabeledMedia(df: DataFrame, binaryCol: String,
      labelCols: Seq[String], dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val saved = graft.multimodal.Multimodal
      .saveMedia(df, binaryCol, s"$dir/data")
    saved
      .filter(col(binaryCol + "_url").isNotNull)
      .select(to_json(struct(
        concat(lit("data/"),
          element_at(split(col(binaryCol + "_url"), "/"), -1)).as("filepath")
          +: labelCols.map(c => col(c).as(c)): _*)).as("value"))
      .write.mode(SaveMode.Overwrite).text(s"$dir/samples")
  }

  private def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
