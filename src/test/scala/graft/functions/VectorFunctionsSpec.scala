package graft.functions

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(i: Long, dim: Int = 8): Array[Double] =
    Array.tabulate(dim) { d =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"vf:$i:$d".getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(h).getInt() / Int.MaxValue.toDouble
    }

  test("topKPerQuery salted two-phase equals the naive global window") {
    val corpus = (10L until 400L).map(i => i -> vec(i)).toDF("cid", "ce")
    val queries = (0L until 5L).map(i => i -> vec(i)).toDF("qid", "qe")
    val got = VectorFunctions
      .topKPerQuery(corpus, "cid", "ce", queries, "qid", "qe", 3)
      .orderBy(col("qid"), col("_rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    // naive reference: one window over qid alone (the shape we replaced)
    val score = VectorFunctions.cosineSimilarity(col("ce"), col("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(score.desc, col("cid"))
    val naive = corpus.crossJoin(broadcast(queries))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 3)
      .select(col("qid"), col("cid"), col("_rk"))
      .orderBy(col("qid"), col("_rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == naive)
  }

  test("topKPerQuery plan pre-reduces per salt — no single-task corpus sort") {
    val corpus = (10L until 200L).map(i => i -> vec(i)).toDF("cid", "ce")
    val queries = (0L until 3L).map(i => i -> vec(i)).toDF("qid", "qe")
    val q = VectorFunctions.topKPerQuery(corpus, "cid", "ce", queries, "qid", "qe", 3)
    val plan = q.queryExecution.executedPlan.toString
    // two window stages: the salted pre-reduce plus the final per-query rank
    val windows = "(?m)^.*Window\\b".r.findAllIn(plan).size
    assert(windows >= 2, s"expected salted pre-reduce + final window, got plan:\n$plan")
    // the pre-reduce partitions on (qid, crc32-salt), so the first exchange
    // must hash on more than the bare query id
    assert(plan.contains("crc32"), s"salt missing from plan:\n$plan")
  }
}
