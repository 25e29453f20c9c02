package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan shape audit for the URL/domain family: the PSL-aware
  * registeredDomain must stay whole-stage-codegen Column composition —
  * no UDF in the executed plan, and the q146 doc_id predicate must reach
  * the parquet scan (the pushdown the 100x probe measured as a 1.0 ratio).
  */
class PlanAuditNetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q146 executed plan: no UDF, InSet suffix probes, filter+pruning pushed to scan") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val df = graft.SparkEntry.queries("q146_psl_domains")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // pure Column composition: no python/scala UDF nodes anywhere
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "unexpected UDF in plan")
    assert(!df.queryExecution.optimizedPlan.toString.contains("ScalaUDF"))
    // the suffix sets compiled to InSet hash probes (not an Or-chain)
    assert(plan.contains("INSET"), "suffix membership did not compile to InSet")
    // predicate pushdown + column pruning reach the parquet scan — the
    // shape the 100x probe measured as a flat ratio
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,500)]"),
      "doc_id predicate not pushed to the scan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      "scan reads more than the single projected column")
  }

  test("q148 executed plan: wildcard/exception classes stay UDF-free Column composition") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val df = graft.SparkEntry.queries("q148_psl_wildcards")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "unexpected UDF in plan")
    assert(!df.queryExecution.optimizedPlan.toString.contains("ScalaUDF"))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"))
  }

  test("unicodeHosts=false keeps registeredDomain UDF-free on a plain projection") {
    import spark.implicits._
    val df = Seq("https://a.example.co.uk/x").toDF("u")
      .select(graft.functions.Net.registeredDomain(col("u")))
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }
}
