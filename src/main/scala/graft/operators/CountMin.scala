package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) for approximate
  * frequency counting, as plain codegen'd DataFrame aggregations — the
  * frequency-side sibling of [[Hll]] (cardinality) and
  * `HeavyHitters` (top-k): d independent hash rows of w counters;
  * point estimate = min over rows, which NEVER undercounts (collisions
  * only add).
  *
  *   rows → explode d (row, bucket) pairs        map-only
  *        → groupBy(keys, row, bucket).count     one shuffle, map-side
  *                                               combined to ≤ d·w rows
  *                                               per upstream partition
  *   probe → recompute buckets, join d counters  broadcast-sized
  *
  * Hashes are md5-hex-digit based (`md5("<i>:" + value)` first two hex
  * digits) so a SQL oracle recomputes the IDENTICAL counter table and
  * the identical min-estimates — the whole sketch state is
  * integer-exact across engines, like Hll's registers.
  */
object CountMin {

  /** Hash rows (d). */
  val D = 4

  /** Buckets per row (w = 256: two md5 hex digits). ε = e/w ≈ 1.06%
    * of the stream length at δ = e^−4.
    */
  val W = 256

  private def bucketOf(row: Int, value: Column): Column =
    conv(substring(md5(concat(lit(s"$row:"), value.cast("string"))
      .cast("binary")), 1, 2), 16, 10).cast("int")

  /** Counter table: keys* + (row, bucket) → cnt, the mergeable sketch
    * state (counters from disjoint data merge by ADDITION — partial
    * aggregation performs it automatically on unions).
    */
  def counters(df: DataFrame, keys: Seq[String],
      value: Column): DataFrame = {
    val pairs = array((0 until D).map(i =>
      struct(lit(i).as("row"), bucketOf(i, value).as("bucket"))): _*)
    df.select(keys.map(col) :+ explode(pairs).as("rb"): _*)
      .select(keys.map(col) :+ col("rb.row") :+ col("rb.bucket"): _*)
      .groupBy((keys :+ "row" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Point-frequency estimates for `probes` (a DataFrame with the keys
    * and a probe column named by `probeCol`): min over the d rows of
    * the matching counters. A probe whose bucket row is absent from the
    * counter table has true count 0 in that row → estimate 0.
    */
  def estimate(counters: DataFrame, probes: DataFrame, keys: Seq[String],
      probeCol: String): DataFrame = {
    val pairs = array((0 until D).map(i =>
      struct(lit(i).as("row"),
        bucketOf(i, col(probeCol)).as("bucket"))): _*)
    val exploded = probes
      .select((keys.map(col) :+ col(probeCol) :+
        explode(pairs).as("rb")): _*)
      .select(keys.map(col) :+ col(probeCol) :+ col("rb.row") :+
        col("rb.bucket"): _*)
    exploded.join(counters, keys :+ "row" :+ "bucket", "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy((keys :+ probeCol).map(col): _*)
      .agg(min("cnt").cast("long").as("estimate"))
  }
}
