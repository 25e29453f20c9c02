package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),     // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again!"),    // near dup of 1
    (4L, "completely different content about spark query engines and scale"),
  ).toDF("id", "text")

  test("exact dedup keeps smallest id per identical text") {
    val out = Dedup.exact(docs, "text", "id").select("id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 4L))
  }

  test("near-dup LSH removes high-jaccard variants too") {
    val out = Dedup.nearDuplicates(docs, "text", "id", jaccardThreshold = 0.8)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 4L)) // 2 (exact) and 3 (near) both collapse into 1
  }

  test("simhash buckets collapse identical token streams") {
    val out = Dedup.simhashBuckets(docs, "text", "id").select("id").as[Long].collect().toSet
    assert(out.contains(1L) && out.contains(4L) && !out.contains(2L))
  }
}
