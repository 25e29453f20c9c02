package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation and physical-layout helpers for 100 TB datasets. AQE's
  * skew-join handling covers sort-merge joins at runtime; `saltedJoin` is
  * the explicit fallback when one key dominates badly enough that even a
  * single AQE split is too coarse, or when AQE is unavailable.
  */
object Skew {

  /** Salted inner equi-join: the (potentially skewed) left side scatters
    * each key across `buckets` salt values; the right side replicates each
    * row `buckets` times. Shuffle keys become (key, salt), spreading a hot
    * key over `buckets` reducers. Result equals a plain inner join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, seed: Long = 0L): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("_salt", (rand(seed) * buckets).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Range-partition + sort-within-partitions on the same columns: parquet
    * files come out clustered so min/max stats prune scans on those columns
    * (the practical substitute for Z-order when filtering on a prefix).
    */
  def clusterForPruning(df: DataFrame, cols: String*): DataFrame =
    df.repartitionByRange(cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)

  /** Write a table bucketed+sorted on the join key. Two tables bucketed the
    * same way join with NO shuffle on either side (co-located join) — the
    * pre-shuffle investment for fact-fact joins repeated at 100 TB.
    * Requires a session catalog (saveAsTable), not a bare path.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
