package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential test of `Net.registeredDomain`'s Column chain against an
  * INDEPENDENT generic implementation of the public-suffix algorithm
  * (publicsuffix.org: exception rules beat all, otherwise the longest
  * matching rule wins, `*` is the implicit default rule) over randomly
  * generated hosts drawn from labels that exercise every rule class —
  * linear 2/3/4-label suffixes, wildcards, exceptions, punycode — plus
  * depths that hit every branch boundary.
  */
class PslDifferentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** generic PSL: longest matching rule, exceptions override */
  private def model(host: String): String = {
    if (host.matches("^\\d{1,3}(\\.\\d{1,3}){3}$")) return host
    val labels = host.split("\\.", -1).toSeq
    val n = labels.length
    if (n <= 1) return host
    def lastK(k: Int) = labels.takeRight(k).mkString(".")
    val r = Net.psl
    val linear = r.suffixes2 ++ r.suffixes3 ++ r.suffixes4
    def endsWithRule(rule: String): Boolean = {
      val rl = rule.split("\\.", -1).toSeq
      rl.length <= n && labels.takeRight(rl.length) == rl
    }
    val excMatch = (r.exc2 ++ r.exc3).filter(endsWithRule)
    val suffixLen =
      if (excMatch.nonEmpty)
        // exception rule: prevailing suffix = the rule minus its left label
        excMatch.map(e => e.count(_ == '.')).max // labels-1
      else {
        val linLens = linear.filter(endsWithRule)
          .map(_.count(_ == '.') + 1)
        // wildcard base b matches hosts with ≥ 1 label under b;
        // the suffix it defines is len(b)+1 labels long
        val wildLens = (r.wild1 ++ r.wild2)
          .filter(b => endsWithRule(b) &&
            n >= b.count(_ == '.') + 2)
          .map(_.count(_ == '.') + 2)
        (linLens ++ wildLens :+ 1).max // ':+ 1' = the implicit '*' rule
      }
    if (n <= suffixLen) host else lastK(suffixLen + 1)
  }

  test("Column chain equals the generic PSL algorithm on 600 random hosts") {
    val rnd = new scala.util.Random(104810)
    val labels = Seq(
      "ck", "www", "er", "np", "com", "jp", "kawasaki", "city", "chuo",
      "k12", "ma", "us", "pvt", "xn--55qx5d", "cn", "co", "uk", "au",
      "edu", "vic", "school", "example", "shop", "a", "deep", "io")
    val hosts = ((0 until 600).map { _ =>
      (0 until (1 + rnd.nextInt(6))).map(_ => labels(rnd.nextInt(labels.length)))
        .mkString(".")
    } ++ Seq(
      // branch boundaries, hit deterministically
      "foo.ck", "a.foo.ck", "www.ck", "x.www.ck", "ck",
      "city.kawasaki.jp", "a.city.kawasaki.jp", "b.a.city.kawasaki.jp",
      "kawasaki.jp", "x.kawasaki.jp", "y.x.kawasaki.jp",
      "pvt.k12.ma.us", "s.pvt.k12.ma.us", "d.s.pvt.k12.ma.us",
      "xn--55qx5d.cn", "b.xn--55qx5d.cn", "a.b.xn--55qx5d.cn",
      "co.uk", "b.co.uk", "a.b.co.uk", "10.0.0.7",
    )).distinct
    val got = hosts.map(h => (h, s"https://$h/p")).toDF("host", "u")
      .select(col("host"), Net.registeredDomain(col("u")).as("dom"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach { h =>
      assert(got(h) == model(h), s"host '$h': column=${got(h)} model=${model(h)}")
    }
  }
}
