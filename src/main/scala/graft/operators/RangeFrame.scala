package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe bounded-lookback RANGE frames.
  *
  * `PARTITION BY p ORDER BY k RANGE BETWEEN L PRECEDING AND CURRENT ROW`
  * over a LOW-cardinality `p` is a classic scale-killer: Spark's Window
  * shuffles the whole table into |distinct p| partitions and each task
  * sorts its entire partition — 3 tasks sorting ~33 TB each at the 100 TB
  * target. But when the frame's lookback is BOUNDED (L), no row needs more
  * than the trailing L-wide slice of its neighborhood, so the computation
  * parallelizes over key ranges:
  *
  * Rows are bucketed by `floor(k / B)` with bucket width `B >= L`. Every
  * row lands in its home bucket, and rows within L of a bucket's upper
  * edge are ALSO copied into the next bucket as frame-feeders (marked
  * non-output). A row's frame `[k-L, k]` then lies entirely inside its
  * home bucket's row set: any frame member in the previous bucket has
  * `key >= k - L >= bucketStart - L`, which is exactly the carry
  * condition; no member can be two buckets back because `B >= L`. One
  * shuffle on the HIGH-cardinality `(partition, bucket)` key, exact
  * per-bucket windows, and only the marked home rows are emitted.
  * Data duplication is `1 + L/B` (default B = 4L → 1.25×); wall-clock
  * scales with bucket size, not partition-value cardinality.
  *
  * (The reference's only frame is unbounded-preceding running totals,
  * `/root/reference/pixeltable/exprs/function_call.py` window handling —
  * this generalizes it to the bounded RANGE frames SQL users expect.)
  */
object RangeFrame {

  /** `agg(value) OVER (PARTITION BY parts ORDER BY orderCol RANGE BETWEEN
    * lookback PRECEDING AND CURRENT ROW)` as `outName`, computed with the
    * bucketed two-pass shape above. `orderCol` must be integral/numeric
    * and non-null; `aggExpr` builds the windowed aggregate from a window
    * spec (e.g. `w => sum(col("x")).over(w)`).
    */
  def withBoundedFrame(
      df: DataFrame,
      parts: Seq[Column],
      orderCol: Column,
      lookback: Long,
      outName: String,
      aggOver: org.apache.spark.sql.expressions.WindowSpec => Column,
      bucketWidth: Long = 0L): DataFrame =
    withBoundedFrames(df, parts, orderCol, lookback,
      Seq(outName -> aggOver), bucketWidth)

  /** Multi-aggregate form: all frames share one bucketed shuffle+sort. */
  def withBoundedFrames(
      df: DataFrame,
      parts: Seq[Column],
      orderCol: Column,
      lookback: Long,
      aggs: Seq[(String, org.apache.spark.sql.expressions.WindowSpec => Column)],
      bucketWidth: Long = 0L): DataFrame = {
    require(lookback >= 0, "lookback must be >= 0")
    val b = if (bucketWidth > 0) bucketWidth else math.max(4 * lookback, 1L)
    require(b >= lookback, s"bucket width $b must be >= lookback $lookback")
    val bkt = floor(orderCol.cast("double") / b.toDouble).cast("long")
    val home = df.withColumn("_rf_bkt", bkt).withColumn("_rf_home", lit(true))
    // rows within L of the bucket's upper edge feed the next bucket's frames
    val carry = df
      .filter(orderCol >= (bkt + 1) * b - lookback)
      .withColumn("_rf_bkt", bkt + 1)
      .withColumn("_rf_home", lit(false))
    val w = Window
      .partitionBy(parts :+ col("_rf_bkt"): _*)
      .orderBy(orderCol)
      .rangeBetween(-lookback, Window.currentRow)
    aggs.foldLeft(home.unionByName(carry)) { case (d, (name, aggOver)) =>
      d.withColumn(name, aggOver(w))
    }
      .filter(col("_rf_home"))
      .drop("_rf_bkt", "_rf_home")
  }
}
