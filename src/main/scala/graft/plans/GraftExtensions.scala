package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-extension entry point: registers graft's native expressions and
  * the SQL relation resolver at session build time, so a cluster deployment
  * only needs `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (no per-query registration). This is the standard injection seam for
  * custom expressions/rules/strategies.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectResolutionRule(GraftRelationRule(_))
  }
}

/** Analyzer rule resolving `graft`-namespace relations in plain Spark SQL
  * against the warehouse at `spark.graft.warehouse`:
  *
  * {{{
  *   SELECT * FROM graft.orders                   -- current version
  *   SELECT * FROM graft.`orders@v3`              -- time travel to v3
  *   SELECT * FROM graft.`orders@release`         -- named snapshot
  *   SELECT * FROM graft.`dir1/nested/t`          -- directory-tree path
  * }}}
  *
  * The relation expands to the SAME logical plan `GraftTable.read()`
  * produces (versioned parquet scan + live-row predicate), so filter/column
  * pushdown, AQE, and every optimization apply exactly as in the DataFrame
  * API — SQL users and DataFrame users share one code path. Unknown tables
  * fall through untouched so the normal "table not found" analysis error
  * (or another catalog) still applies to non-graft names.
  */
case class GraftRelationRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(parts, _, _)
          if parts.length >= 2 && parts.head.equalsIgnoreCase("graft") =>
        resolve(parts.tail.mkString("/")).getOrElse(u)
    }

  private def resolve(spec: String): Option[LogicalPlan] = {
    val warehouse = session.conf.getOption("spark.graft.warehouse")
      .getOrElse(return None)
    val (name, at) = spec.lastIndexOf('@') match {
      case -1 => (spec, None)
      case i  => (spec.substring(0, i), Some(spec.substring(i + 1)))
    }
    val cat = new graft.catalog.Catalog(warehouse)
    if (!cat.exists(name)) return None
    val t = graft.catalog.GraftTable.open(session, cat, name)
    val df = at match {
      case None => t.read()
      case Some(v) if v.matches("v\\d+") => t.read(Some(v.drop(1).toLong))
      case Some(snap) => t.readSnapshot(snap)
    }
    Some(df.queryExecution.analyzed)
  }
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      new FunctionIdentifier("cosine_sim_native"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim_native"),
      (children: Seq[Expression]) => CosineSimilarityExpr(children.head, children(1)),
    ),
  )
}
