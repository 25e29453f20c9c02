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

  def importParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def importJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

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
}
