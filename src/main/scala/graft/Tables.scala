package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** One operator-inventory query: a Spark implementation plus (optionally) a
  * DuckDB-oracle SQL producing identical rows/columns on the same parquet
  * tables. See SURVEY.md §2 for the inventory this covers.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

/** Loaders for the driver-provided parquet corpus (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
  )

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    // reader rejects outright; read nanos as long and truncate to micros
    // (DuckDB's reader truncates ns → µs identically).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // cast to NTZ: the corpus stores naive timestamps, and Spark 4 reads
      // those as TIMESTAMP_NTZ — keep derived columns consistent with that.
      df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }
}
