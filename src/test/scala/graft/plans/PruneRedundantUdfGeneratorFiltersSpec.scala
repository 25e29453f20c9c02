package graft.plans

import java.util.concurrent.atomic.AtomicLong

import graft.TestSpark
import org.apache.spark.sql.catalyst.expressions.UserDefinedExpression
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evaluation counter shared with executor threads — exact in local mode
  * (single JVM).
  */
object UdfEvalCounter {
  val n = new AtomicLong(0)
}

/** `PruneRedundantUdfGeneratorFilters` contract. On stock Spark 4.1.2 the
  * projected-explode idiom `withColumn("arr", udf(x)).select(explode(arr))`
  * evaluates the UDF three times per input row: InferFiltersFromGenerate
  * adds `isnotnull(arr) AND size(arr) > 0`, then PushDownPredicates
  * substitutes the alias while pushing the filter below the Project. The
  * rule drops those inferred conjuncts (safe: the non-outer Generate drops
  * null/empty inputs itself), so this spec pins BOTH the plan shape (one
  * UDF occurrence, no UDF-bearing filter) and the actual evaluation count
  * (exactly one per input row), plus unchanged results — including rows
  * whose array is empty or null, the rows the dropped filter used to
  * remove early.
  */
class PruneRedundantUdfGeneratorFiltersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def udfCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.map(p =>
      p.expressions.map(_.collect {
        case u: UserDefinedExpression => u
      }.size).sum).sum

  private def mkInput(): String = {
    // parquet-backed: over a LocalRelation the optimizer would evaluate
    // projections eagerly and hide the shape under test
    val dir = java.nio.file.Files.createTempDirectory("prunegen").toString
    Seq(("a,b,c", 1), ("d", 2), ("", 3), (null.asInstanceOf[String], 4))
      .toDF("s", "id").write.mode("overwrite").parquet(dir)
    dir
  }

  test("projected explode(udf) evaluates the UDF once per input row") {
    val f = udf { (s: String) =>
      UdfEvalCounter.n.incrementAndGet()
      if (s == null || s.isEmpty) Seq.empty[String] else s.split(",").toSeq
    }
    val df = spark.read.parquet(mkInput())
      .withColumn("arr", f(col("s")))
      .select(col("id"), explode(col("arr")).as("tok"))
    // plan shape: exactly one UDF in the whole optimized plan, and no
    // Filter carrying a UDF (the inferred pre-filter is gone)
    assert(udfCount(df) === 1)
    val udfFilters = df.queryExecution.optimizedPlan.collect {
      case fl: Filter if fl.condition.exists(_.isInstanceOf[UserDefinedExpression]) => fl
    }
    assert(udfFilters.isEmpty, "inferred UDF-bearing pre-filter survived")
    // behavior: evaluation count is exactly one per input row, and the
    // null/empty rows are still (correctly) absent from the output
    UdfEvalCounter.n.set(0)
    val rows = df.as[(Int, String)].collect().sorted.toSeq
    assert(rows === Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")))
    assert(UdfEvalCounter.n.get() === 4,
      s"expected 4 evaluations (one per input row), got ${UdfEvalCounter.n.get()}")
  }

  test("direct explode(udf(x)) stays single-evaluation (stock behavior)") {
    val f = udf { (s: String) =>
      if (s == null || s.isEmpty) Seq.empty[String] else s.split(",").toSeq
    }
    val df = spark.read.parquet(mkInput())
      .select(col("id"), explode(f(col("s"))).as("tok"))
    assert(udfCount(df) === 1)
    assert(df.as[(Int, String)].collect().sorted.toSeq ===
      Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")))
  }

  test("outer generate keeps its pre-filters (rule must not fire)") {
    val f = udf { (s: String) =>
      if (s == null || s.isEmpty) Seq.empty[String] else s.split(",").toSeq
    }
    val df = spark.read.parquet(mkInput())
      .withColumn("arr", f(col("s")))
      .select(col("id"), explode_outer(col("arr")).as("tok"))
    // outer generate emits a null row for empty/null input — 6 rows total
    assert(df.collect().length === 6)
  }

  test("user-written UDF filters unrelated to the generator are kept") {
    val f = udf { (s: String) =>
      if (s == null || s.isEmpty) Seq.empty[String] else s.split(",").toSeq
    }
    val keep = udf { (id: Int) => id < 3 }
    val df = spark.read.parquet(mkInput())
      .filter(keep(col("id")))
      .withColumn("arr", f(col("s")))
      .select(col("id"), explode(col("arr")).as("tok"))
    assert(df.as[(Int, String)].collect().sorted.toSeq ===
      Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")))
    val keepFilters = df.queryExecution.optimizedPlan.collect {
      case fl: Filter if fl.condition.exists(_.isInstanceOf[UserDefinedExpression]) => fl
    }
    assert(keepFilters.nonEmpty, "unrelated user UDF filter was dropped")
  }
}
