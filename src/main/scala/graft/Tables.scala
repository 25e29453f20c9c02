package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
