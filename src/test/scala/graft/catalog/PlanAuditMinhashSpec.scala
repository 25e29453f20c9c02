package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit for the minhash index's incremental contract: probing
  * the corpus with an incoming batch must sign ONLY the batch — the
  * executed plan of `searchNearDups` may compute minhash signatures for
  * the probe side and nothing else (the corpus contributes its PERSISTED
  * segments plus candidate-row text for the exact verify). This is the
  * shape `tools/MinhashScale` measured as flat-vs-corpus-size; a
  * regression that re-signs the corpus (as the pre-fix verify re-shingled
  * it) shows up here as extra minhash/shingle applications over the
  * corpus relation.
  */
class PlanAuditMinhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("searchNearDups: verify recomputes NO signatures; shingles gated by semi-joins") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-mhplan").toString)
    val t = GraftTable.create(spark, cat, "pl", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert((0L until 20L).map(i =>
      (i, s"document body number $i with enough text to shingle"))
      .toDF("id", "body"))
    t.createMinhashIndex("nd", "body", "id")
    // parquet-backed probe: a literal LocalRelation would be wholesale
    // constant-folded, leaving nothing to audit
    val pDir = java.nio.file.Files.createTempDirectory("graft-mhprobe").toString
    Seq((100L, "document body number 3 with enough text to shingle"))
      .toDF("qid", "txt").write.mode("overwrite").parquet(pDir)
    val probe = spark.read.parquet(pDir)
    // the probe-signing subplan signs exactly ONE relation (the probe) —
    // by construction bandSignatures only ever sees `docs` here, and the
    // corpus contributes its persisted segments (MinhashScale measures
    // this as flat-vs-corpus-size)
    val sigPlan = graft.operators.Dedup
      .bandSignatures(probe, "txt", "qid", 8, 2, 3)
      .queryExecution.optimizedPlan.toString
    // presence, not a count: Catalyst clones the expression text into
    // pushed-down null filters, so occurrence counting is meaningless
    assert("(?i)minhashsig".r.findAllIn(sigPlan).nonEmpty,
      s"probe plan:\n$sigPlan")
    val df = t.searchNearDups("nd", probe, "txt", "qid", 0.9)
    // the candidate list is localCheckpointed inside verify, so this
    // action finalizes the verify plan downstream of it
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    // verify must not recompute ANY signatures (pre-fix it re-shingled
    // the whole corpus — the cost the index exists to amortize)
    assert("(?i)minhashsig".r.findAllIn(plan).isEmpty,
      "verify path recomputes signatures:\n" +
        plan.linesIterator.filter(_.toLowerCase.contains("minhashsig"))
          .mkString("\n"))
    // candidate-id semi-joins gate the shingle projections (broadcast —
    // the corpus is filtered to candidate rows BEFORE shingling)
    assert(plan.contains("LeftSemi"), "candidate semi-join missing")
    // no UDFs anywhere in the path
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    // and the result is still right ("number 13" is a genuine one-char
    // near-dup of "number 3" at trigram Jaccard ≥ 0.9)
    assert(df.select("doc_id").as[Long].collect().toSet == Set(3L, 13L))
  }

  test("indexNearDupPairs plan: NO minhash application at all (segments only)") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-mhplan2").toString)
    val t = GraftTable.create(spark, cat, "pl2", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert(Seq((1L, "aaaa bbbb cccc dddd eeee"), (2L, "aaaa bbbb cccc dddd eeee"),
      (3L, "zzzz yyyy xxxx wwww vvvv")).toDF("id", "body"))
    t.createMinhashIndex("nd", "body", "id")
    val df = t.indexNearDupPairs("nd", 0.9)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert("(?i)minhashsig".r.findAllIn(plan).isEmpty,
      "all-pairs dedup through the index must reuse persisted signatures")
    assert(df.select("_ida", "_idb").as[(Long, Long)].collect().toSeq
      == Seq((1L, 2L)))
  }
}
