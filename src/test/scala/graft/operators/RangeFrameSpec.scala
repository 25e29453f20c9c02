package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, lookback: Long) = {
    val w = Window.partitionBy(col("p")).orderBy(col("k"))
      .rangeBetween(-lookback, Window.currentRow)
    df.withColumn("range_sum", sum(col("v")).over(w))
  }

  test("bucketed bounded RANGE frame equals the naive low-card window") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      (s"p${rnd.nextInt(3)}", rnd.nextInt(2000).toLong, rnd.nextInt(100).toDouble)
    }
    val df = rows.toDF("p", "k", "v")
    for (lookback <- Seq(0L, 1L, 37L, 100L, 500L);
         width <- Seq(0L /* default 4L */, lookback.max(1), 7 * lookback.max(1))) {
      val fast = RangeFrame.withBoundedFrame(df, Seq(col("p")), col("k"),
          lookback, "range_sum", w => sum(col("v")).over(w), width)
        .select("p", "k", "v", "range_sum")
        .orderBy("p", "k", "v").collect().toSeq
      val slow = naive(df, lookback)
        .select("p", "k", "v", "range_sum")
        .orderBy("p", "k", "v").collect().toSeq
      assert(fast == slow, s"diverged at lookback=$lookback width=$width")
    }
  }

  test("negative keys and ties across bucket edges stay exact") {
    val rows = Seq(("a", -401L, 1.0), ("a", -400L, 2.0), ("a", -399L, 4.0),
      ("a", -1L, 8.0), ("a", 0L, 16.0), ("a", 0L, 32.0), ("a", 1L, 64.0),
      ("a", 399L, 128.0), ("a", 400L, 256.0), ("a", 401L, 512.0))
    val df = rows.toDF("p", "k", "v")
    val fast = RangeFrame.withBoundedFrame(df, Seq(col("p")), col("k"), 100L,
        "range_sum", w => sum(col("v")).over(w))
      .orderBy("k", "v").collect().toSeq
    val slow = naive(df, 100L).orderBy("k", "v").collect().toSeq
    assert(fast == slow)
  }

  test("plan partitions the window on the high-cardinality bucket key") {
    val df = (0 until 1000).map(i => ("x", i.toLong, 1.0)).toDF("p", "k", "v")
    val q = RangeFrame.withBoundedFrame(df, Seq(col("p")), col("k"), 100L,
      "range_sum", w => sum(col("v")).over(w))
    val windowNodes = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windowNodes.nonEmpty, "no Window in plan")
    windowNodes.foreach { w =>
      val partNames = w.partitionSpec.map(_.toString).mkString(",")
      assert(partNames.contains("_rf_bkt"),
        s"window partitions only on [$partNames] — the low-card scale trap")
    }
  }
}
