package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
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

  test("decontaminate counts distinct overlapping word n-grams") {
    // bench doc = "a b c d e"; train 20 shares the 3-grams "a b c" /
    // "b c d" / "c d e" (and "b c d" TWICE — distinct count still 3);
    // train 21 shares none; train 22 is below n tokens.
    val train = Seq(
      (20L, "a b c d e x b c d"),
      (21L, "p q r s t u"),
      (22L, "a b"),
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(20L -> 3L))
  }

  test("redactPii replaces and counts emails, phones and IPv4s") {
    import graft.functions.TextFunctions
    val rows = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "call 555-867-5309 or ping 192.168.0.1 ok"),
      (3L, "no pii here"),
      (4L, "a@b.io and c_d%e@f-g.co.uk twice"),
    ).toDF("id", "t")
    val got = rows.select(col("id"),
        TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiCount(col("t")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got == List(
      (1L, "mail <EMAIL> now", 1L),
      (2L, "call <PHONE> or ping <IP> ok", 2L),
      (3L, "no pii here", 0L),
      (4L, "<EMAIL> and <EMAIL> twice", 2L)))
  }

  test("wordNgrams guards short token arrays") {
    import graft.functions.TextFunctions
    val df = Seq("a b c d", "a b", "").toDF("t")
      .select(TextFunctions.wordNgrams(
        TextFunctions.tokens(col("t")), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b c", "b c d"), Nil, Nil))
  }
}
