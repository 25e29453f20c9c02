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

/** Query helpers shared by the registry. */
object QueryUtil {
  /** Total order for a SMALL final result without a range sort.
    * `orderBy` plans RangePartitioning, whose bounds SAMPLING re-executes
    * every operator below it down to the nearest materialized stage — for
    * plans whose upstream has no shuffle (broadcast joins, scans+UDFs) that
    * doubles the whole query (measured 2.25s → 1.18s on q34). A 1-partition
    * exchange + local sort gives the identical row order with one upstream
    * execution; only valid when the result is small enough for one task —
    * true for every oracle-checked output here (the driver materializes
    * them anyway). At scale, keep orderBy for large results.
    */
  def orderedSmall(df: org.apache.spark.sql.DataFrame,
      cols: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Temp fixture dir that a JVM shutdown hook deletes recursively.
    * Registry gates stage parquet fixtures, checkpoints and sinks per
    * invocation; `Files.createTempDirectory` alone leaked them — the
    * driver host accumulated thousands of dirs (11 GB of /tmp by round
    * 14) across repeated verify/bench runs. Deletion at JVM exit keeps
    * the dirs alive for the whole run (streams re-read their staging
    * late), then reclaims them.
    */
  def tempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    cleanupAtExit(p)
    p
  }

  private val toDelete =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = toDelete.poll()
      while (p != null) {
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(f => try java.nio.file.Files.deleteIfExists(f)
              catch { case _: Exception => () })
        } catch { case _: Exception => () }
        p = toDelete.poll()
      }
    }))

  /** Register an existing path for recursive deletion at JVM exit. */
  def cleanupAtExit(p: java.nio.file.Path): Unit = {
    hookInstalled
    toDelete.add(p)
  }
}

/** Loaders for the driver-provided parquet corpus (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
  )

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet's ts physical type varies by generator version
    // (TESTDATA.md "events schema contract"): TIMESTAMP(NANOS) — which
    // Spark's parquet reader rejects unless read as long — or plain
    // timestamp[us]. Branch on the physical schema rather than assuming.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", normalizeTs(df)) else df
  }

  /** Normalize the events `ts` column to TIMESTAMP_NTZ regardless of the
    * generator's physical type. LongType means nanosAsLong kicked in
    * (TIMESTAMP(NANOS) file): truncate ns → µs exactly as DuckDB's reader
    * does. Timestamp/NTZ means a µs file: cast only — arithmetic like
    * `ts div 1000` would analysis-fail on TimestampType.
    */
  def normalizeTs(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ =>
        col("ts").cast("timestamp_ntz")
    }
}
