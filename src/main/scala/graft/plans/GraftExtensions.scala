package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers graft's native expressions at
  * session build time, so a cluster deployment only needs
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (no per-query
  * registration). This is the standard injection seam for custom
  * expressions/rules/strategies; today it carries the native vector kernel,
  * and it is where a custom `Rule[LogicalPlan]` or `SparkStrategy` would be
  * injected if an operator ever needs one (none does yet — SURVEY.md §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
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
