package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization (the FineWeb/Dolma/CCNet URL-dedup key): edge
  * cases beyond q142's closed-form grid.
  */
class NetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Net.canonicalUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("canonicalUrl: scheme/www/case/slash/tracking/param-order") {
    assert(canon(
      "https://www.Example.COM/a/b/",
      "http://example.com/a/b",
      "https://example.com/a/b?utm_source=x&utm_medium=y",
      "https://example.com/a/b#frag",
    ).distinct == Seq("example.com/a/b"))
    // non-tracking params survive, sorted; tracking interleaved is dropped
    assert(canon("https://e.com/p?z=1&utm_campaign=c&a=2") ==
      Seq("e.com/p?a=2&z=1"))
    // all-tracking query → no '?' at all
    assert(canon("https://e.com/p?utm_source=a&gclid=b&fbclid=c&ref=d") ==
      Seq("e.com/p"))
    // distinct param VALUES stay distinct
    assert(canon("https://e.com/p?a=1", "https://e.com/p?a=2").distinct.size == 2)
    // root path: trailing slash strips to bare host
    assert(canon("https://www.e.com/") == Seq("e.com"))
  }

  test("registeredDomain: last two labels; www reduces via the PSL walk") {
    val d = Seq("https://www.news.example.com/x", "http://example.com/",
      "https://a.b.c.example.org/p").toDF("u")
      .select(Net.registeredDomain(col("u"))).collect().map(_.getString(0))
    assert(d.toSeq == Seq("example.com", "example.com", "example.org"))
  }

  test("registeredDomain: public-suffix list multi-label suffixes") {
    def dom(urls: String*): Seq[String] =
      urls.toDF("u").select(Net.registeredDomain(col("u"))).collect()
        .map(_.getString(0)).toSeq
    // 2-label ccSLD suffixes: suffix + one label, regardless of depth
    assert(dom("https://news.bbc.co.uk/x") == Seq("bbc.co.uk"))
    assert(dom("https://www.shop.example.com.au/") == Seq("example.com.au"))
    assert(dom("http://a.b.firm.co.jp/p") == Seq("firm.co.jp"))
    assert(dom("https://portal.gob.mx/") == Seq("portal.gob.mx")) // gob.mx listed
    // 3-label suffixes beat their 2-label prefix
    assert(dom("https://school.vic.edu.au/") == Seq("school.vic.edu.au"))
    assert(dom("https://x.school.vic.edu.au/") == Seq("school.vic.edu.au"))
    // unlisted suffix → classic last-two-labels fallback
    assert(dom("https://deep.sub.example.io/") == Seq("example.io"))
    // IPv4 literal passes through whole
    assert(dom("http://192.168.10.1/admin") == Seq("192.168.10.1"))
    // single-label host: returned as-is
    assert(dom("http://localhost:8080/x") == Seq("localhost"))
    // host that IS a public suffix: degenerate, returns the suffix
    assert(dom("https://co.uk/") == Seq("co.uk"))
    // ... including a 3-label suffix whose 2-label parent is UNLISTED:
    // without the n==3 branch this fell to last-two-labels ("amazonaws.com")
    assert(dom("https://s3.amazonaws.com/") == Seq("s3.amazonaws.com"))
    assert(dom("https://bucket.s3.amazonaws.com/") == Seq("bucket.s3.amazonaws.com"))
  }

  test("registeredDomain: wildcard, exception, 4-label and punycode rule classes") {
    def dom(urls: String*): Seq[String] =
      urls.toDF("u").select(Net.registeredDomain(col("u"))).collect()
        .map(_.getString(0)).toSeq
    // *.ck wildcard: any label under ck is a public suffix
    assert(dom("https://shop.foo.ck/x") == Seq("shop.foo.ck"))
    assert(dom("https://a.b.foo.ck/x") == Seq("b.foo.ck"))
    assert(dom("https://foo.ck/") == Seq("foo.ck")) // host IS the suffix
    // !www.ck exception cancels the wildcard: www.ck is registrable
    assert(dom("https://www.ck/") == Seq("www.ck"))
    assert(dom("https://deep.www.ck/") == Seq("www.ck"))
    // Japanese city wildcard + its city. exception
    assert(dom("https://x.chuo.kawasaki.jp/") == Seq("x.chuo.kawasaki.jp"))
    assert(dom("https://sub.city.kawasaki.jp/") == Seq("city.kawasaki.jp"))
    assert(dom("https://city.kawasaki.jp/") == Seq("city.kawasaki.jp"))
    // 4-label linear entries (previously dead data in the 2-label bucket)
    assert(dom("https://x.pvt.k12.ma.us/") == Seq("x.pvt.k12.ma.us"))
    assert(dom("https://deep.x.pvt.k12.ma.us/") == Seq("x.pvt.k12.ma.us"))
    assert(dom("https://pvt.k12.ma.us/") == Seq("pvt.k12.ma.us"))
    // punycode IDN registries match as plain ASCII labels
    assert(dom("https://shop.xn--55qx5d.cn/") == Seq("shop.xn--55qx5d.cn"))
    assert(dom("https://a.shop.xn--55qx5d.cn/") == Seq("shop.xn--55qx5d.cn"))
    // other wildcard TLDs
    assert(dom("http://acme.com.np/") == Seq("acme.com.np"))
    assert(dom("http://x.acme.com.bd/") == Seq("acme.com.bd"))
    // PRIVATE-section registries: each hosting subdomain is its own
    // publisher (alice.github.io must group apart from bob.github.io)
    assert(dom("https://alice.github.io/blog") == Seq("alice.github.io"))
    assert(dom("https://deep.alice.github.io/p") == Seq("alice.github.io"))
    assert(dom("https://myshop.blogspot.com/") == Seq("myshop.blogspot.com"))
    assert(dom("https://bucket1.s3.amazonaws.com/key") ==
      Seq("bucket1.s3.amazonaws.com")) // 3-label private entry
    // plain .com hosts are untouched by the private entries
    assert(dom("https://www.amazonaws.com/") == Seq("amazonaws.com"))
  }

  test("registeredDomain unicodeHosts=true: unicode IDN hosts hit punycode rules") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // 公司 = the CJK 'company' registry label; IDNA -> xn--55qx5d
    val u = "https://shop.\u516C\u53F8.cn/x"
    val out = Seq(u, "https://plain.example.com/").toDF("u")
      .select(Net.registeredDomain(col("u"), unicodeHosts = true))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("shop.xn--55qx5d.cn", "example.com"))
  }

  test("registeredDomain properties over random hosts (one Spark pass)") {
    val rnd = new scala.util.Random(4171780)
    val labels = Seq("co", "uk", "com", "au", "example", "deep", "www",
      "edu", "vic", "school", "x9", "a", "gov", "io", "net", "shop")
    val hosts = (0 until 200).map { _ =>
      (0 until (1 + rnd.nextInt(5))).map(_ => labels(rnd.nextInt(labels.length)))
        .mkString(".")
    } ++ Seq("10.0.0.1", "255.255.255.255", "localhost")
    val rows = hosts.map(h => (h, s"https://$h/p")).toDF("host", "u")
      .select(col("host"), Net.registeredDomain(col("u")).as("dom"))
      .collect()
    rows.foreach { r =>
      val host = r.getString(0)
      val dom = r.getString(1)
      // no www-strip: under the full PSL algorithm `www` is an ordinary
      // label (and the registrable one for the !www.ck exception class)
      val base = host
      val isIp = host.matches("^\\d{1,3}(\\.\\d{1,3}){3}$")
      if (isIp) assert(dom == host, s"$host → $dom")
      else if (!base.contains('.')) assert(dom == base, s"$host → $dom")
      else {
        // the registered domain is a dot-boundary suffix of the host
        // with 2-5 labels, and at least the last two labels
        assert(base == dom || base.endsWith("." + dom), s"$host → $dom")
        val n = dom.count(_ == '.') + 1
        assert(n >= 2 && n <= 5, s"$host → $dom")
        assert(dom.split("\\.").toSeq ==
          base.split("\\.").toSeq.takeRight(n), s"$host → $dom")
      }
    }
  }

  test("null url → null canon") {
    val r = Seq((1, null.asInstanceOf[String])).toDF("i", "u")
      .select(Net.canonicalUrl(col("u"))).head()
    assert(r.isNullAt(0))
  }
}
