package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4-doc corpus with known statistics
  private def corpus = Seq(
    (1L, "apple banana apple"),        // dl 3
    (2L, "banana cherry"),             // dl 2
    (3L, "apple apple apple banana"),  // dl 4
    (4L, "date elderberry fig"),       // dl 3
  ).toDF("doc_id", "text")

  test("postings: tf and dl per (doc, term)") {
    val p = Ranking.postings(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2)) -> (r.getLong(3), r.getInt(1))).toMap
    assert(p((1L, "apple")) == ((2L, 3)))
    assert(p((1L, "banana")) == ((1L, 3)))
    assert(p((3L, "apple")) == ((3L, 4)))
    assert(p((2L, "cherry")) == ((1L, 2)))
    assert(p((4L, "fig")) == ((1L, 3)))
    assert(p.size == 9)
  }

  test("termStats: df and cf") {
    val t = Ranking.termStats(corpus, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(t("apple") == ((2L, 5L)))   // docs 1,3; 2+3 occurrences
    assert(t("banana") == ((3L, 3L)))
    assert(t("fig") == ((1L, 1L)))
  }

  test("bm25: hand-computed scores, descending, ties by doc_id") {
    // query "apple": df=2, N=4, avgdl=3
    // idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    // doc1: tf=2, dl=3 → ln2 * 2*2.2 / (2 + 1.2*(0.25+0.75*3/3)) = ln2*4.4/3.2
    // doc3: tf=3, dl=4 → ln2 * 3*2.2 / (3 + 1.2*(0.25+0.75*4/3)) = ln2*6.6/4.5
    val res = Ranking.bm25(corpus, "doc_id", "text", "apple", topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ln2 = math.log(2.0)
    def r4(d: Double) = math.rint(d * 1e4) / 1e4
    assert(res.keySet == Set(1L, 3L))
    assert(res(1L) == r4(ln2 * 4.4 / 3.2))
    assert(res(3L) == r4(ln2 * 6.6 / 4.5))
    assert(res(3L) > res(1L)) // higher tf dominates despite longer doc
  }

  test("bm25: multi-term query sums per-term contributions and counts hits") {
    val rows = Ranking.bm25(corpus, "doc_id", "text", "banana cherry", topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byId = rows.map(t => t._1 -> t).toMap
    assert(byId(2L)._3 == 2) // doc2 hits both terms
    assert(byId(1L)._3 == 1 && byId(3L)._3 == 1)
    assert(byId(2L)._2 > byId(1L)._2)
  }

  test("topTfidfTerms: rarest term wins, ties broken lexicographically") {
    val top1 = Ranking.topTfidfTerms(corpus, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc1: apple tf=2 beats banana; doc2: cherry (df=1) beats banana (df=3)
    assert(top1(1L) == "apple")
    assert(top1(2L) == "cherry")
    assert(top1(3L) == "apple")
    // doc4: all three terms have df=1, tf=1 → lexicographic first
    assert(top1(4L) == "date")
  }

  test("topTfidfTerms: k=2 emits ranks 1..2 per doc") {
    val rows = Ranking.topTfidfTerms(corpus, "doc_id", "text", k = 2).collect()
    val doc4 = rows.filter(_.getLong(0) == 4L).sortBy(_.getLong(3))
    assert(doc4.map(_.getString(1)).toSeq == Seq("date", "elderberry"))
    assert(rows.forall(r => r.getLong(3) <= 2))
  }
}
