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

  test("connected components collapse chains and separate islands") {
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("near-dup chain A~B, B~C, A!~C keeps exactly one survivor") {
    // 3-shingle Jaccard: A-B = 6/10 = 0.6, B-C = 0.6, A-C = 4/12 = 0.33 —
    // both adjacent pairs clear threshold 0.5, the chain ends don't.
    val chain = Seq(
      (1L, "abcdefghij"),
      (2L, "cdefghijkl"),
      (3L, "efghijklmn"),
      (9L, "zzzzyyyyxxxx"),
    ).toDF("id", "text")
    val pairs = Dedup.nearDuplicatePairs(chain, "text", "id",
      jaccardThreshold = 0.5, numHashes = 8, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L))) // no 1-3 edge
    val out = Dedup.nearDuplicates(chain, "text", "id",
      jaccardThreshold = 0.5, numHashes = 8, bands = 8)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 9L)) // transitive chain → single keeper
  }
}
