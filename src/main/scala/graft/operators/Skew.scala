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
    * row groups come out clustered so pushed-down filters on those columns
    * skip row groups / pages via min/max stats (vanilla Spark never skips
    * whole FILES on footer stats — the pruning mechanism is the parquet
    * reader's row-group and column-index filtering, so the sort inside
    * each file matters as much as the range partitioning across files).
    * Pass `partitions` to pin the file count: AQE otherwise coalesces a
    * small clustered write into very few files.
    */
  def clusterForPruning(df: DataFrame, cols: String*): DataFrame =
    df.repartitionByRange(cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)

  /** clusterForPruning with an explicit range-partition count. */
  def clusterForPruningN(df: DataFrame, partitions: Int, cols: String*): DataFrame =
    df.repartitionByRange(partitions, cols.map(col): _*)
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

/** Z-order clustering (Delta/Iceberg OPTIMIZE ZORDER analog, on plain
  * parquet): cluster a table so parquet min/max stats prune scans filtered
  * on ANY of the z-columns — `Skew.clusterForPruning` only serves a sort
  * prefix. Bucket boundaries come from distributed quantile sketches
  * (approxQuantile: only numBuckets−1 doubles per column reach the driver),
  * so skewed columns still spread across the full curve; the per-row
  * z-value is one native codegen'd kernel (`graft.plans.ZValueExpr`).
  */
object ZOrder {

  /** Per-column quantile cut points (numBuckets − 1 each, ascending).
    * numBuckets must be a power of two (bits interleave cleanly).
    */
  def boundariesFor(df: DataFrame, cols: Seq[String],
      numBuckets: Int = 256): Seq[Seq[Double]] = {
    require(numBuckets >= 2 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two, got $numBuckets")
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
    cols.map { c =>
      df.select(col(c).cast("double").as("_zc"))
        .stat.approxQuantile("_zc", probs, 0.001).toSeq
    }
  }

  /** Equi-depth STRING cut points from a bounded sample: ≤ `sampleCap`
    * values reach the driver regardless of table size (the same
    * driver-state discipline as approxQuantile), sorted once and sliced
    * at equal ranks. Heavy skew dedupes into fewer distinct cuts — the
    * bucket ids just use less of the curve, never break it.
    */
  private def stringCuts(df: DataFrame, c: String, numBuckets: Int,
      sampleCap: Int = 65536): Seq[String] = {
    val src = df.select(col(c)).na.drop()
    val n = src.count()
    val sampled =
      (if (n <= sampleCap) src
       else src.sample(withReplacement = false,
         math.min(1.0, sampleCap * 1.2 / n), seed = 42))
        .as(org.apache.spark.sql.Encoders.STRING).collect().sorted
    if (sampled.isEmpty) Seq.fill(numBuckets - 1)("")
    else (1 until numBuckets).map { i =>
      sampled(math.min(((i.toLong * sampled.length) / numBuckets).toInt,
        sampled.length - 1))
    }
  }

  /** The z-value column for `cols` given `boundariesFor` output. */
  def zvalue(df: DataFrame, cols: Seq[String],
      cuts: Seq[Seq[Double]]): org.apache.spark.sql.Column =
    graft.plans.ZOrderNative.zvalue(df.sparkSession,
      array(cols.map(c => col(c).cast("double")): _*), cuts)

  /** Range-partition + sort by the interleaved z-value: files come out
    * tight on every z-column's min/max, so a filter on any of them prunes.
    *
    * String columns cluster too (the 100 TB curation case — domains,
    * urls, digests-with-prefix-structure): their equi-depth bucket id is
    * `size(filter(<literal cuts>, x -> x <= col))` — a codegen'd HOF over
    * the broadcast cut array, order-preserving under Spark's binary
    * string comparison — fed through the same Morton kernel via identity
    * cut points. Numeric columns keep the native binary-search path on
    * raw values.
    */
  def cluster(df: DataFrame, cols: Seq[String], numBuckets: Int = 256,
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val resolved = cols.map { c =>
      df.schema(c).dataType match {
        case StringType =>
          val sc = stringCuts(df, c, numBuckets)
          // bucket id = count of cuts <= value; identity cuts hand the id
          // through the shared interleave kernel unchanged
          val id = size(filter(typedlit(sc),
            x => x <= col(c))).cast("double")
          ((1 until numBuckets).map(_ - 0.5), id)
        case _ =>
          val probs = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
          val cut = df.select(col(c).cast("double").as("_zc"))
            .stat.approxQuantile("_zc", probs, 0.001).toSeq
          (cut, col(c).cast("double"))
      }
    }
    val withZ = df.withColumn("_zv",
      graft.plans.ZOrderNative.zvalue(df.sparkSession,
        array(resolved.map(_._2): _*), resolved.map(_._1)))
    val ranged =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("_zv"))
      else withZ.repartitionByRange(col("_zv"))
    ranged.sortWithinPartitions(col("_zv")).drop("_zv")
  }
}
