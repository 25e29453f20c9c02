package graft.plans

import graft.TestSpark
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeVectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native cosine matches the HOF composition and runs in codegen") {
    NativeVector.register(spark)
    val df = Seq(
      (1L, Array(1.0, 0.0, 2.0), Array(1.0, 1.0, 2.0)),
      (2L, Array(0.5, -1.0, 3.0), Array(2.0, 0.25, -1.0)),
    ).toDF("id", "a", "b").repartition(2) // block local-relation folding
    val out = df.select(
      col("id"),
      expr("cosine_sim_native(a, b)").as("native"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("hof"),
    )
    out.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"mismatch on id=${r.getLong(0)}")
    }
    // the native expression alone stays inside whole-stage codegen — the
    // HOF composition does NOT (HigherOrderFunction is CodegenFallback and
    // poisons its whole projection), which is the point of the native path
    val nativeOnly = df.select(expr("cosine_sim_native(a, b)").as("c"))
    nativeOnly.collect()
    val plan = nativeOnly.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
  }

  test("null inputs produce null, not a crash") {
    NativeVector.register(spark)
    val df = Seq((1L, Option(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("id", "a", "b")
    val r = df.select(expr("cosine_sim_native(a, b)").as("c")).head()
    assert(r.isNullAt(0))
  }

  test("kernels declare input types: float arrays cast, non-arrays fail analysis") {
    // r5-ADVICE: the kernels read raw ArrayData slots, so without a type
    // contract an array<float> child returned garbage by reinterpretation
    NativeVector.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b").repartition(2)
    val dot = df.select(expr("dot_native(a, b)").as("d")).head().getDouble(0)
    assert(math.abs(dot - 14.0) < 1e-6, s"float input mis-read: $dot")
    val cos = df.select(expr("cosine_sim_native(a, b)").as("c")).head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9, s"float input mis-read: $cos")
    // a non-array child is an ANALYSIS error, not garbage numbers
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("x", "a")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(expr("dot_native(x, a)")).collect()
    }
  }
}
