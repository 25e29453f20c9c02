package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join: for each left row, the latest right row with
  * rightTs <= leftTs within the same key. Spark has no native as-of join;
  * the naive formulation is a theta join + argmax (quadratic per key). This
  * implementation unions both sides and uses one `last(..., ignoreNulls)`
  * running window — a single shuffle+sort by (key, ts), linear in input,
  * which is the 100 TB shape.
  */
object AsOf {

  /** Enrich `left` with the as-of value of `valueCol` from `right`.
    * Tie-break: right rows at exactly leftTs are visible (<= semantics).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, asOfCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      (left.columns.map(c =>
        if (c == keyCol || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_side") :+ col(valueCol).as("_v")): _*)
    // _side orders right rows before left rows at equal ts → <= semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asOfCol, last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_v")
  }
}
