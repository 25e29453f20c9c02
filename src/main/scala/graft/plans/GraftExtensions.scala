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
    val cat = new graft.catalog.Catalog(warehouse)
    // a literal '@' is legal in a table name — try the whole spec as a
    // table FIRST, so `graft.\`a@b\`` reads table "a@b" rather than
    // mis-splitting into (a, b) (ADVICE r5)
    if (cat.exists(spec)) {
      val t = graft.catalog.GraftTable.open(session, cat, spec)
      return Some(t.read().queryExecution.analyzed)
    }
    val (name, at) = spec.lastIndexOf('@') match {
      case -1 => (spec, None)
      case i  => (spec.substring(0, i), Some(spec.substring(i + 1)))
    }
    if (!cat.exists(name)) return None
    val t = graft.catalog.GraftTable.open(session, cat, name)
    val df = at match {
      case None => t.read()
      // `vN` prefers time travel, but only when N parses (a >19-digit
      // suffix must not throw NumberFormatException out of analysis) AND
      // the version is actually in the log — otherwise fall through to a
      // named snapshot, so a snapshot literally called "v3" stays
      // reachable whenever version 3 itself doesn't exist (ADVICE r5)
      case Some(v) =>
        val asVersion = if (v.matches("v\\d+"))
          scala.util.Try(v.drop(1).toLong).toOption
            .filter(n => t.meta.versions.exists(_.version == n))
        else None
        asVersion match {
          case Some(n) => t.read(Some(n))
          case None =>
            // unknown snapshot name → leave the relation unresolved (the
            // normal "table not found" error), not an analysis-time throw
            if (!t.meta.snapshots.contains(v)) return None
            t.readSnapshot(v)
        }
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
