package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General per-row query templates (reference `@pxt.query`,
  * `func/query_template_function.py:153-193`): a parameterized query runs
  * "for every row" of a parameter table. The reference executes the
  * template per row; here every shape rewrites to ONE distributed plan —
  * the parameter set broadcasts (it is the parameter list, not data) and
  * the corpus streams through a single join, so a million-parameter run is
  * one stage, not a million queries.
  *
  * The top-k similarity shape lives in `VectorFunctions.topKPerQuery`;
  * these are the remaining reference shapes: lookup (rows matching the
  * parameterized predicate) and aggregate (per-parameter summary).
  */
object QueryTemplates {

  /** Lookup template: for each parameter row, every corpus row satisfying
    * `cond` (built from `params("…")` / `corpus("…")` column refs).
    * Equality conds plan as a broadcast hash join; range conds as a
    * broadcast nested-loop with the SMALL side broadcast — both scan the
    * corpus exactly once.
    */
  def lookup(params: DataFrame, corpus: DataFrame, cond: Column): DataFrame =
    corpus.join(broadcast(params), cond, "inner")

  /** Aggregate template: one output row per parameter row, aggregating the
    * corpus rows that satisfy `cond` (left join keeps parameters with zero
    * matches — their aggregates see only nulls, count = 0).
    */
  def aggregatePerParam(params: DataFrame, paramKeys: Seq[String],
      corpus: DataFrame, cond: Column, aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    broadcast(params).join(corpus, cond, "left_outer")
      .groupBy(paramKeys.map(params(_)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Exists template: parameter rows that have at least one corpus match
    * (a broadcast-parameter semi-join flipped so the corpus never shuffles).
    */
  def exists(params: DataFrame, corpus: DataFrame, cond: Column): DataFrame =
    broadcast(params).join(corpus, cond, "left_semi")
}
