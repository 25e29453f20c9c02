package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded-lineage iteration for fixpoint/power-iteration operators
  * (PageRank, connected components, label propagation).
  *
  * Each step of an iterative dataframe computation nests the previous
  * plan inside the next (join + groupBy per round), so after k rounds the
  * logical plan is k levels deep: analysis/optimization cost grows
  * superlinearly, and at cluster scale a lost executor replays the ENTIRE
  * lineage from the source scan. `loop` truncates the lineage every
  * iteration with an eager `localCheckpoint`, so the plan presented to
  * round i+1 is a flat scan of round i's materialized partitions —
  * constant plan depth regardless of iteration count, and recovery
  * replays at most one round. (`localCheckpoint` stores to executor
  * block-manager storage; on a production cluster with an HDFS/S3
  * checkpoint dir configured, reliable `checkpoint()` additionally
  * survives executor loss — same plan shape either way.)
  *
  * The reference has no iterative operator family (its nearest analogue
  * is per-row computed-column cascades, pixeltable/plan.py); this is part
  * of the beyond-reference graph toolkit over the near-dup graph.
  */
object Iterate {

  /** Run `step` `n` times starting from `init`, truncating lineage after
    * every round. Returns the final iterate (already materialized).
    */
  def loop(init: DataFrame, n: Int)(step: DataFrame => DataFrame): DataFrame = {
    var cur = init.localCheckpoint(true)
    for (_ <- 1 to n) cur = step(cur).localCheckpoint(true)
    cur
  }

  /** Depth of a logical plan tree — exposed so specs can assert the
    * checkpointed iteration keeps plan depth constant across rounds.
    */
  def planDepth(df: DataFrame): Int = {
    def d(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
      1 + (if (p.children.isEmpty) 0
           else p.children.map(c =>
             d(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]])).max)
    d(df.queryExecution.optimizedPlan)
  }
}
