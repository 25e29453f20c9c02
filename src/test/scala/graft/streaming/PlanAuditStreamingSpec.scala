package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit for the streaming gates' scale claims:
  *
  *  - q185's stream-static decontamination must BROADCAST the static
  *    benchmark-gram side — at 100 TB the stream is unbounded and the
  *    benchmark is MBs, so a shuffled join (re-shuffling every
  *    micro-batch) is the failure mode this pins against.
  *  - q184's near-dup operator must plan as a keyed stateful operator
  *    (flatMapGroupsWithState), i.e. per-bucket state, not a
  *    whole-stream collect.
  *
  * Streaming physical plans only exist per micro-batch, so both audits
  * run a bounded AvailableNow replay and read
  * `StreamingQuery.explain()`'s last-batch output.
  */
class PlanAuditStreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def lastBatchPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos)) { q.explain(extended = false) }
    bos.toString
  }

  private def stageParquet(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("plan-stream").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("stream-static gram join broadcasts the static side") {
    val docs = (0L until 30L).map(i =>
      (i, (0 until 20).map(k => s"w${(i * 7 + k) % 9}").mkString(" ")))
      .toDF("doc_id", "text")
    val benchGrams = docs.where($"doc_id" % 7 === 0)
      .select(explode(graft.functions.TextFunctions.wordNgrams(
        graft.functions.TextFunctions.tokens(lower($"text")), 13)).as("g"))
      .distinct()
    val dir = stageParquet(docs.where($"doc_id" % 7 =!= 0))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val hits = stream
      .select($"doc_id", explode(graft.functions.TextFunctions.wordNgrams(
        graft.functions.TextFunctions.tokens(lower($"text")), 13)).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy($"doc_id")
      .agg(size(collect_set($"g")).cast("long").as("n_contaminated"))
    val ck = java.nio.file.Files.createTempDirectory("plan-ck1").toString
    val qn = "plan_audit_decontam"
    val sq = hits.writeStream.format("memory").queryName(qn)
      .outputMode("complete").option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    val plan = lastBatchPlan(sq)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"static gram side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "stream-static join degraded to a per-batch shuffle join")
    sq.stop()
  }

  test("streaming near-dup plans as keyed stateful processing") {
    val docs = (0L until 20L).map(i => (i, s"alpha beta g${i % 5}"))
      .toDF("doc_id", "text")
    val dir = stageParquet(docs)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val verdicts = Streaming.nearDupStream(stream, "doc_id", "text", 0)
    val ck = java.nio.file.Files.createTempDirectory("plan-ck2").toString
    val qn = "plan_audit_neardup"
    val sq = verdicts.toDF().writeStream.format("memory").queryName(qn)
      .outputMode("append").option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    val plan = lastBatchPlan(sq)
    assert(plan.contains("FlatMapGroupsWithState"),
      s"near-dup not planned as keyed stateful operator:\n$plan")
    // the state key is the signature bucket: an exchange on the bucket key
    // must precede the stateful operator (keyed shuffle, not a collect)
    assert(plan.contains("Exchange hashpartitioning"),
      s"no keyed exchange feeding the stateful operator:\n$plan")
    sq.stop()
  }
}
