package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** the HOF composition SimHashExpr replaces — kept here as the
    * bit-identity oracle (and the to_sql twin q35's DuckDB oracle mirrors)
    */
  private def hofSimhash(tokens: org.apache.spark.sql.Column) = {
    val bits = (0 until 16).map { i =>
      val contrib = transform(tokens,
        t => when(substring(md5(t), i + 1, 1) >= "8", 1).otherwise(-1))
      when(aggregate(contrib, lit(0), (a, x) => a + x) > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  test("native simhash is bit-identical to the HOF composition") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "single",
      "a a a a repeated tokens a a",
      "",
      "unicode żółć 機械 tokens",
    ).toDF("text").select(
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val rows = docs.select(
        TextNative.simhash16(spark, col("toks")).as("native"),
        hofSimhash(col("toks")).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    assert(rows.map(_.getString(0)).distinct.length > 2) // not degenerate
  }

  test("native simhash: null array and null tokens match the HOF twin") {
    val df = Seq(
      (1L, Seq("alpha", null, "beta")),
      (2L, null),
      (3L, Seq.empty[String]),
    ).toDF("id", "toks")
    val rows = df.select(col("id"),
        TextNative.simhash16(spark, col("toks")).as("native"),
        hofSimhash(col("toks")).as("hof"))
      .orderBy("id").collect()
    rows.foreach { r =>
      // HOF null-array/empty results coalesce to all-zero bits
      val hof = Option(r.getString(2)).getOrElse("0" * 16)
      assert(r.getString(1) == hof, s"id=${r.getLong(0)}")
    }
  }
}
