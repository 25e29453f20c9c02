package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iterate.loop: lineage-truncated fixpoint iteration (q118 PageRank's
  * engine). Asserts (a) numeric equivalence with the naive nested-plan
  * loop, and (b) CONSTANT plan depth across iteration counts — the 100 TB
  * property the helper exists for (an uncheckpointed loop's depth grows
  * linearly in rounds and a lost executor replays the whole lineage).
  */
class IterateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // tiny directed ring + chord graph, integer micro-unit PageRank
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L),
  ).toDF("u", "w").union(Seq((2L, 1L), (3L, 2L), (1L, 4L)).toDF("u", "w"))

  private def step(e: org.apache.spark.sql.DataFrame)(
      prev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val deg = e.groupBy("u").agg(count(lit(1)).as("d"))
    val nodes = e.select(col("u").as("v")).distinct()
    val contrib = e.join(deg, Seq("u"))
      .join(prev.withColumnRenamed("v", "u"), Seq("u"))
      .select(col("w").as("v"), expr("r div d").as("c"))
      .groupBy("v").agg(sum("c").as("s"))
    nodes.join(contrib, Seq("v"), "left")
      .select(col("v"), expr("150000L + (85L * coalesce(s, 0L)) div 100L").as("r"))
  }

  test("checkpointed loop matches the naive nested loop exactly") {
    val e = edges.cache()
    val init = e.select(col("u").as("v")).distinct()
      .select(col("v"), lit(1000000L).as("r"))
    val fast = Iterate.loop(init, 5)(step(e))
      .orderBy("v").as[(Long, Long)].collect().toSeq
    var slow = init
    for (_ <- 1 to 5) slow = step(e)(slow)
    assert(fast == slow.orderBy("v").as[(Long, Long)].collect().toSeq)
  }

  test("plan depth is constant in the iteration count") {
    val e = edges.cache()
    val init = e.select(col("u").as("v")).distinct()
      .select(col("v"), lit(1000000L).as("r"))
    // depth of the DF a FURTHER step would build on top of the iterate:
    // with checkpointing this is independent of how many rounds ran
    val d2 = Iterate.planDepth(step(e)(Iterate.loop(init, 2)(step(e))))
    val d6 = Iterate.planDepth(step(e)(Iterate.loop(init, 6)(step(e))))
    assert(d2 == d6, s"lineage grew with iterations: depth@2=$d2 depth@6=$d6")
    // while the naive loop's depth strictly grows
    var slow2 = init; for (_ <- 1 to 2) slow2 = step(e)(slow2)
    var slow6 = init; for (_ <- 1 to 6) slow6 = step(e)(slow6)
    assert(Iterate.planDepth(slow6) > Iterate.planDepth(slow2))
  }
}
