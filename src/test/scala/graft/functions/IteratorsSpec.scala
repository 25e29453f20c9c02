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
}
