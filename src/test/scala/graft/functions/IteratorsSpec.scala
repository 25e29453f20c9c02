package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IteratorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("charChunks: stride = size - overlap, tail chunk may be short") {
    val df = Seq(("x" * 250)).toDF("text")
    val chunks = df.select(explode(Iterators.charChunks(col("text"), 100, 20)).as("c"))
      .select(length(col("c")).as("len")).as[Int].collect().toSeq
    // starts at 1, 81, 161, 241 → lengths 100, 100, 90, 10
    assert(chunks == Seq(100, 100, 90, 10))
  }

  test("sentence and paragraph splitters") {
    val df = Seq(("One two. Three four! Five?\n\nNew para here.")).toDF("text")
    val sents = df.select(explode(Iterators.sentences(col("text"))).as("s"))
      .as[String].collect().toSeq
    assert(sents == Seq("One two.", "Three four!", "Five?", "New para here."))
    val paras = df.select(explode(Iterators.paragraphs(col("text"))).as("p"))
      .as[String].collect().toSeq
    assert(paras == Seq("One two. Three four! Five?", "New para here."))
  }

  test("tokenChunks: n-token windows with overlap") {
    val df = Seq(("a b c d e f g")).toDF("text")
    val chunks = df.select(explode(Iterators.tokenChunks(col("text"), 3, 1)).as("c"))
      .as[String].collect().toSeq
    assert(chunks == Seq("a b c", "c d e", "e f g", "g"))
  }

  test("headingChunks: markdown hierarchy, title, sourceline") {
    val doc = "preamble\n# Top\nintro text\n## Sub A\naaa\n### Deep\nddd\n## Sub B\nbbb"
    val rows = Seq(doc).toDF("text")
      .select(explode(Iterators.headingChunks(col("text"))).as("c"))
      .select(col("c.text"), col("c.title"), col("c.heading"), col("c.sourceline"))
      .collect()
    assert(rows.length == 5)
    val texts = rows.map(_.getString(0)).toSeq
    assert(texts == Seq("preamble", "intro text", "aaa", "ddd", "bbb"))
    // preamble: no heading open, no title yet
    assert(rows(0).getAs[Map[String, String]](2).isEmpty && rows(0).getString(1) == null)
    assert(rows(1).getAs[Map[String, String]](2) == Map("h1" -> "Top"))
    assert(rows(2).getAs[Map[String, String]](2) == Map("h1" -> "Top", "h2" -> "Sub A"))
    assert(rows(3).getAs[Map[String, String]](2) ==
      Map("h1" -> "Top", "h2" -> "Sub A", "h3" -> "Deep"))
    // h2 'Sub B' closes h3 (deeper level)
    assert(rows(4).getAs[Map[String, String]](2) == Map("h1" -> "Top", "h2" -> "Sub B"))
    assert(rows.map(_.getInt(3)).toSeq == Seq(1, 3, 5, 7, 9))
    assert(rows.drop(1).forall(_.getString(1) == "Top")) // title = first h1
  }

  test("headingChunks: single-line HTML headings parse too") {
    val doc = "<h1 class=\"t\">Title</h1>\nbody text\n<h2>Section</h2>\nmore"
    val rows = Seq(doc).toDF("text")
      .select(explode(Iterators.headingChunks(col("text"))).as("c"))
      .select(col("c.heading"), col("c.title")).collect()
    assert(rows(0).getAs[Map[String, String]](0) == Map("h1" -> "Title"))
    assert(rows(1).getAs[Map[String, String]](0) ==
      Map("h1" -> "Title", "h2" -> "Section"))
    assert(rows(0).getString(1) == "Title")
  }

  test("pageChunks: form-feed pages with 1-based numbers, blanks dropped") {
    val doc = "page one\ftwo here\f\f  \ffive"
    val rows = Seq(doc).toDF("text")
      .select(explode(Iterators.pageChunks(col("text"))).as("c"))
      .select(col("c._1").as("t"), col("c._2").as("p"))
      .collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("page one", 1), ("two here", 2), ("five", 5)))
  }
}
