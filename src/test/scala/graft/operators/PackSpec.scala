package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exclusive prefix sum matches single-partition window on shuffled input") {
    val n = 1000
    val rows = scala.util.Random.shuffle((0 until n).toList)
      .map(i => (i.toLong, (i % 17 + 1).toLong))
    val df = rows.toDF("id", "v").repartition(7) // arbitrary placement
    val got = Pack.withExclusivePrefixSum(df, col("id"), col("v"), "off")
      .select("id", "off").as[(Long, Long)].collect().toMap
    val expect = (0 until n).scanLeft(0L)((acc, i) => acc + (i % 17 + 1))
    (0 until n).foreach(i => assert(got(i.toLong) == expect(i), s"id=$i"))
  }

  test("prefix sum handles fewer rows than partitions and a single row") {
    val df = Seq((5L, 10L), (9L, 3L)).toDF("id", "v")
    val got = Pack.withExclusivePrefixSum(df, col("id"), col("v"), "off", numPartitions = 8)
      .select("id", "off").as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 0L, 9L -> 10L))
    val one = Pack.withExclusivePrefixSum(Seq((1L, 7L)).toDF("id", "v"),
      col("id"), col("v"), "off").select("off").as[Long].collect()
    assert(one.toSeq == Seq(0L))
  }

  test("packBins start-offset rule: doc joins the bin where its first token lands") {
    // tokens: 100, 100, 100 with capacity 128:
    //   doc 1 starts at 0   -> bin 0
    //   doc 2 starts at 100 -> bin 0 (spills past 128)
    //   doc 3 starts at 200 -> bin 1
    val df = Seq((1L, 100L), (2L, 100L), (3L, 100L)).toDF("id", "tok")
    val got = Pack.packBins(df, col("id"), col("tok"), 128L, "bin")
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("input columns colliding with internal names survive untouched") {
    // r5-ADVICE: an input column literally named _pk_k/_pk_b/_pk_off was
    // silently clobbered and dropped from the output
    val df = Seq((1L, 10L, "a", "b", "c"), (2L, 5L, "d", "e", "f"))
      .toDF("id", "v", "_pk_k", "_pk_b", "_pk_off")
    val out = Pack.packBins(df, col("id"), col("v"), 8L, "bin")
    assert(out.columns.toSet == Set("id", "v", "_pk_k", "_pk_b", "_pk_off", "bin"))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("_pk_k")).toSeq == Seq("a", "d"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L))
  }

  test("phase-3 window reads the persisted intermediate, not the source again") {
    // r5 verdict #4: the operator used to scan its input three times
    // (quantile, per-bucket sums, final pass). The quantile scan is an
    // irreducible pre-pass (its literals DEFINE the bucket column), so the
    // floor is two source scans — the final pass must come from the cache.
    val df = (0 until 500).map(i => (i.toLong, 2L)).toDF("id", "v")
    val out = Pack.withExclusivePrefixSum(df, col("id"), col("v"), "off")
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("InMemoryRelation"),
      s"final pass does not read the cached intermediate:\n$plan")
    // repeated calls keep at most ONE pack intermediate cached per session
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      Pack.withExclusivePrefixSum(df, col("id"), col("v"), "off").count()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, s"cache leak: $before -> $after persistent RDDs")
    Pack.uncache(spark)
  }

  test("no single-task global window: plan has no empty-frame Window over all rows") {
    // the scale guarantee: every Window in the plan is partitioned (by the
    // internal pid), never a global ORDER BY-only window
    val df = (0 until 100).map(i => (i.toLong, 1L)).toDF("id", "v")
    val plan = Pack.withExclusivePrefixSum(df, col("id"), col("v"), "off")
      .queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty)
    windows.foreach(l => assert(l.contains("_pk_b"),
      s"unpartitioned window in plan line: $l"))
  }
}
