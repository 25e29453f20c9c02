package graft.functions

import graft.TestSpark
import graft.functions.TypeChecks.JSpec._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TypeChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(c: org.apache.spark.sql.Column, rows: Seq[String]) =
    rows.toDF("j").select(c.as("e")).collect().map(r =>
      Option(r.getString(0)))

  test("Json[TypeSchema] validates structure, types, required fields") {
    val spec = JObj(Seq(
      "name" -> JStr,
      "count" -> JNum,
      "tags" -> JArr(JStr),
      "pair" -> JTuple(Seq(JNum, JStr)),
    ))
    val res = check(TypeChecks.jsonCheck(col("j"), spec), Seq(
      """{"name":"a","count":3,"tags":["x","y"],"pair":[1,"b"],"extra":true}""",
      """{"name":"a","count":"three","tags":[],"pair":[1,"b"]}""",
      """{"name":"a","count":3,"tags":["x",5],"pair":[1,"b"]}""",
      """{"count":3,"tags":[],"pair":[1,"b"]}""",
      """{"name":"a","count":3,"tags":[],"pair":[1,"b","c"]}""",
      """not json at all""",
    ))
    assert(res(0).isEmpty) // extra keys allowed
    assert(res(1).exists(_.contains("$.count: expected number")))
    assert(res(2).exists(_.contains("$.tags[1]: expected string")))
    assert(res(3).exists(_.contains("missing required field 'name'")))
    assert(res(4).exists(_.contains("expected 2 elements, got 3")))
    assert(res(5).exists(_.contains("not valid JSON")))
  }

  test("array shape check: fixed dims, wildcards, nested violations") {
    val df = Seq(
      (1L, Seq(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0))), // 3x2 ok
      (2L, Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))),                // 2x2: dim0 wrong
      (3L, Seq(Seq(1.0, 2.0), Seq(3.0), Seq(5.0, 6.0))),      // ragged dim1
    ).toDF("id", "a")
    val c = TypeChecks.arrayShapeCheck(col("a"), Seq(Some(3), Some(2)))
    val res = df.orderBy("id").select(c).collect().map(r => Option(r.getString(0)))
    assert(res(0).isEmpty)
    assert(res(1).exists(_.contains("dim 0: expected 3, got 2")))
    assert(res(2).exists(_.contains("dim 1: expected 2, got 1")))
    // wildcard first dim passes both lengths
    val wild = TypeChecks.arrayShapeCheck(col("a"), Seq(None, Some(2)))
    val res2 = df.orderBy("id").select(wild).collect().map(r => Option(r.getString(0)))
    assert(res2(0).isEmpty && res2(1).isEmpty && res2(2).nonEmpty)
  }

  test("image constraints: size and mode") {
    val df = Seq(
      (1L, Images.solidPng(8, 4, 0x123456)),
      (2L, Images.solidPng(9, 4, 0x123456)),
      (3L, "junk".getBytes("UTF-8")),
    ).toDF("id", "img")
    val c = TypeChecks.imageCheck(col("img"), Some((8, 4)), Some("RGB"))
    val res = df.orderBy("id").select(c).collect().map(r => Option(r.getString(0)))
    assert(res(0).isEmpty)
    assert(res(1).exists(_.contains("expected size 8x4, got 9x4")))
    assert(res(2).exists(_.contains("not a decodable image")))
  }

  test("enforce throws on first violation; flag captures per cell") {
    val df = Seq((1L, """{"k":1}"""), (2L, """{"k":"x"}""")).toDF("id", "j")
    val checks = Map("j" -> TypeChecks.jsonCheck(col("j"), JObj(Seq("k" -> JNum))))
    val err = intercept[IllegalArgumentException](TypeChecks.enforce(df, checks))
    assert(err.getMessage.contains("$.k: expected number"))
    val flagged = TypeChecks.flag(df, checks).orderBy("id").collect()
    assert(flagged(0).getString(2) == null)
    assert(flagged(1).getString(2) != null)
  }

  test("rank-n array slice follows Python half-open semantics") {
    val df = Seq(Tuple1(Seq(
      Seq(0.0, 1.0, 2.0, 3.0),
      Seq(10.0, 11.0, 12.0, 13.0),
      Seq(20.0, 21.0, 22.0, 23.0),
    ))).toDF("a")
    // a[1:3, 1:3]
    val out = df.select(TypeChecks.sliceNd(col("a"),
      Seq((Some(1), Some(3)), (Some(1), Some(3)))).as("s"))
      .head().getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("s")
    assert(out.map(_.toSeq) == Seq(Seq(11.0, 12.0), Seq(21.0, 22.0)))
    // open ends: a[2:, :2]
    val out2 = df.select(TypeChecks.sliceNd(col("a"),
      Seq((Some(2), None), (None, Some(2)))).as("s"))
      .head().getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("s")
    assert(out2.map(_.toSeq) == Seq(Seq(20.0, 21.0)))
    // stop beyond length clamps
    val out3 = df.select(TypeChecks.sliceNd(col("a"),
      Seq((Some(1), Some(99)))).as("s"))
      .head().getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("s")
    assert(out3.length == 2)
  }
}
