package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch: the no-undercount guarantee, error envelope,
  * counter merge law (addition across disjoint parts), hash-scheme
  * determinism vs a JVM reference, and zero-frequency probes.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refBucket(row: Int, v: String): Int = {
    val hx = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$row:$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hx.substring(0, 2), 16)
  }

  test("bucket scheme matches the JVM reference per row") {
    val vals = (0 until 200).map(i => s"tok$i")
    val df = vals.toDF("v")
    for (row <- 0 until CountMin.D) {
      val got = df.select(col("v"),
        conv(substring(md5(concat(lit(s"$row:"), col("v"))
          .cast("binary")), 1, 2), 16, 10).cast("int").as("b"))
        .as[(String, Int)].collect().toMap
      vals.foreach(v => assert(got(v) == refBucket(row, v), s"$row:$v"))
    }
  }

  test("never undercounts; overestimate within the ε·N envelope") {
    // zipf-ish stream: token k appears 1000/k times
    val stream = (1 to 60).flatMap(k => Seq.fill(1000 / k)(s"w$k"))
    val df = stream.map(("g", _)).toDF("k", "v")
    val truth = stream.groupBy(identity).view.mapValues(_.length).toMap
    val ctr = CountMin.counters(df, Seq("k"), col("v"))
    val probes = truth.keys.toSeq.map(("g", _)).toDF("k", "v")
    val est = CountMin.estimate(ctr, probes, Seq("k"), "v")
      .select("v", "estimate").as[(String, Long)].collect().toMap
    val n = stream.length
    truth.foreach { case (tok, c) =>
      assert(est(tok) >= c, s"undercount for $tok")
      // d=4, w=256: expected overshoot per row ~ N/w; min of 4 rows is
      // far tighter — allow the loose single-row bound
      assert(est(tok) <= c + 4L * n / CountMin.W + 1, s"overshoot $tok")
    }
  }

  test("merge law: counters of a union are the SUM of part counters") {
    val a = (0 until 3000).map(i => ("g", s"t${i % 50}")).toDF("k", "v")
    val b = (0 until 2000).map(i => ("g", s"t${i % 80}")).toDF("k", "v")
    val whole = CountMin.counters(a.union(b), Seq("k"), col("v"))
    val merged = CountMin.counters(a, Seq("k"), col("v"))
      .union(CountMin.counters(b, Seq("k"), col("v")))
      .groupBy("k", "row", "bucket").agg(sum("cnt").cast("long").as("cnt"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
  }

  test("zero-frequency probes stay small (min over absent rows is 0-ish)") {
    val df = (0 until 5000).map(i => ("g", s"seen${i % 40}")).toDF("k", "v")
    val ctr = CountMin.counters(df, Seq("k"), col("v"))
    val probes = (0 until 30).map(i => ("g", s"unseen$i")).toDF("k", "v")
    val est = CountMin.estimate(ctr, probes, Seq("k"), "v")
      .select("estimate").as[Long].collect()
    // an unseen token only collides; with 40 distinct tokens in 256
    // buckets most rows are empty → min is usually exactly 0
    assert(est.forall(_ <= 5000L * 4 / CountMin.W))
    assert(est.count(_ == 0L) >= 20)
  }
}
