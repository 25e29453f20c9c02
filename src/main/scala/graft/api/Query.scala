package graft.api

import graft.catalog.GraftTable
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fluent query builder mirroring the reference's `Query` surface
  * (`/root/reference/pixeltable/_query.py:1137-1798`):
  * select/where/join/group_by/order_by/limit/offset/distinct/head/tail/
  * sample/collect. Each call refines an immutable wrapper over a Spark
  * `DataFrame`, so the whole chain compiles to one Catalyst plan —
  * pushdown, pruning and join selection apply across the builder exactly as
  * if the user had written DataFrame code.
  *
  * The reference's repeatable `sample()` semantics (`exec/sql_node.py:
  * 715-860`: order/threshold on md5(seed ∥ pk)) are reproduced exactly —
  * `DataFrame.sample` is NOT plan-stable and is deliberately not used.
  */
final case class Query(df: DataFrame, keyCols: Seq[String]) {

  def where(cond: Column): Query = copy(df = df.filter(cond))
  def where(predicateSql: String): Query = copy(df = df.filter(expr(predicateSql)))

  def select(cols: Column*): Query = copy(df = df.select(cols: _*))
  def selectExpr(exprs: String*): Query = copy(df = df.selectExpr(exprs: _*))

  def join(other: Query, cond: Column, joinType: String = "inner"): Query =
    copy(df = df.join(other.df, cond, joinType))

  def groupBy(cols: Column*): GroupedQuery = GroupedQuery(df.groupBy(cols: _*))

  def orderBy(cols: Column*): Query = copy(df = df.orderBy(cols: _*))
  def limit(n: Int): Query = copy(df = df.limit(n))
  def offset(n: Int): Query = copy(df = df.offset(n))
  def distinct(): Query = copy(df = df.distinct())

  /** first n rows in insertion order (reference `head`, `_query.py:806`) */
  def head(n: Int): Query = copy(df = sortedByKey(asc = true).limit(n))

  /** last n rows in insertion order (reference `tail`, `_query.py:843`) */
  def tail(n: Int): Query = copy(df = sortedByKey(asc = false).limit(n))

  private def sortedByKey(asc: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "head/tail need key columns (insertion order)")
    val order = keyCols.map(c => if (asc) col(c).asc else col(c).desc)
    df.orderBy(order: _*)
  }

  private def sampleKey(seed: Long): Column = {
    require(keyCols.nonEmpty, "sample needs key columns for repeatability")
    md5(concat_ws("___", (lit(seed.toString) +: keyCols.map(c => col(c).cast("string"))): _*))
  }

  /** Repeatable fraction sample: md5(seed ∥ pk) below the fraction's 8-hex
    * threshold — stable across plans, partitionings and engines.
    */
  def sampleFraction(fraction: Double, seed: Long = 0L): Query = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    val threshold = f"${math.round(fraction * 0xffffffffL)}%08x"
    copy(df = df.filter(substring(sampleKey(seed), 1, 8) < threshold))
  }

  /** Repeatable n-row sample: top-n by md5 key via orderBy+limit, which
    * Catalyst plans as TakeOrderedAndProject (per-partition heaps + merge of
    * n-row heads — no global sort, no single-task window at any scale).
    */
  def sampleN(n: Int, seed: Long = 0L): Query =
    copy(df = df.orderBy(sampleKey(seed)).limit(n))

  /** Repeatable stratified sample: n rows per stratum, two-phase so no
    * single task ever sorts a whole stratum. Phase 1 ranks within
    * (stratum, salt) — `saltBuckets`× the parallelism of a per-stratum
    * window — keeping n rows per salted group; phase 2 ranks the surviving
    * ≤ saltBuckets·n rows per stratum. Top-n-of-union == global top-n, and
    * the salt is derived from the sample key so tied keys stay together.
    */
  def sampleStratified(n: Int, stratifyBy: Seq[Column], seed: Long = 0L,
      saltBuckets: Int = 64): Query = {
    val key = sampleKey(seed)
    val salt = pmod(crc32(key), lit(saltBuckets))
    val w1 = Window.partitionBy((stratifyBy :+ salt): _*).orderBy(key)
    val pre = df.withColumn("_rk", row_number().over(w1))
      .filter(col("_rk") <= n).drop("_rk")
    val w2 = Window.partitionBy(stratifyBy: _*).orderBy(key)
    copy(df = pre.withColumn("_rk", row_number().over(w2))
      .filter(col("_rk") <= n).drop("_rk"))
  }

  def count(): Long = df.count()
  def collect(): Array[Row] = df.collect()
  def show(): Unit = df.show(false)
}

final case class GroupedQuery(grouped: org.apache.spark.sql.RelationalGroupedDataset) {
  def agg(exprs: Column*): Query =
    Query(grouped.agg(exprs.head, exprs.tail: _*), Seq.empty)
}

object Query {
  /** Query over a versioned table; `_rowid` keys insertion order and
    * repeatable sampling (hidden from user-facing output by read()).
    */
  def apply(table: GraftTable, version: Option[Long] = None): Query = {
    val m = table.meta
    // keep _rowid available for head/tail/sample, user columns first
    val v = version.getOrElse(m.currentVersion)
    val df = table.readWithSystem(version)
    var out = df
    m.computedInTopoOrderAt(v).filterNot(_.stored).foreach { c =>
      out = out.withColumn(c.name, expr(c.computedExpr.get).cast(c.dataType))
    }
    Query(out.select((m.columnsAt(v).map(c => col(c.name)) :+ col(GraftTable.RowId)): _*),
      Seq(GraftTable.RowId))
  }

}
