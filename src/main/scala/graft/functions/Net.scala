package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's net family (`/root/reference/pixeltable/functions/
  * net.py:11` presigned_url): time-limited signed URLs for media columns.
  * No cloud SDK exists in this environment, so the signing scheme is the
  * S3-style query-string HMAC implemented directly: the URL carries an
  * absolute expiry and an HMAC-SHA256 over (uri, expiry) — verifiable
  * without shared state, deterministic given (uri, expiry, secret).
  */
object Net {

  private def hmacHex(secret: String, payload: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** presigned_url(uri, expiresEpochS, secret): `uri?X-Graft-Expires=E&
    * X-Graft-Signature=hex(hmac_sha256(secret, uri \n E))`. The caller
    * passes the ABSOLUTE expiry so the result is deterministic (the
    * reference passes a relative `expiration` and stamps now() inside —
    * plan-unstable; computed columns need determinism).
    */
  val presignedUrl = udf { (uri: String, expiresEpochS: Long, secret: String) =>
    if (uri == null) null
    else {
      val sep = if (uri.contains("?")) "&" else "?"
      val sig = hmacHex(secret, s"$uri\n$expiresEpochS")
      s"$uri${sep}X-Graft-Expires=$expiresEpochS&X-Graft-Signature=$sig"
    }
  }

  /** URL canonicalization for crawl-scale URL-level dedup (the first
    * dedup stage of the FineWeb/Dolma/CCNet pipelines): lower-cased host
    * without a leading `www.`, path without its trailing slash, query
    * string with tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`)
    * dropped and the survivors SORTED; scheme and fragment discarded.
    * Pure Column composition over `parse_url` + array HOFs — whole-stage
    * codegen, no UDF in the hot path, so the canonical key feeds a plain
    * hash-partitioned groupBy at any corpus size.
    */
  def canonicalUrl(url: Column): Column = {
    val host = regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")
    val path = regexp_replace(coalesce(parse_url(url, lit("PATH")), lit("")), "/$", "")
    val query = coalesce(parse_url(url, lit("QUERY")), lit(""))
    val kept = array_join(array_sort(filter(split(query, "&"), p =>
      !(p.rlike("^(utm_[a-z]+|fbclid|gclid|ref)=") || p === lit("")))), "&")
    concat(host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** The bundled PSL snapshot (publicsuffix.org data, public domain)
    * parsed into the full rule classes of the public-suffix algorithm:
    * linear suffixes bucketed by label count (2/3/4), wildcard rules
    * (`*.ck` → any label under `ck` is a suffix) bucketed by the label
    * count of their base, and exception rules (`!www.ck` → cancels the
    * wildcard: `www.ck` IS the registered domain) bucketed by their own
    * label count. Punycode (`xn--…`) entries are plain ASCII labels and
    * match through the same probes.
    */
  private[graft] final case class PslRules(
      suffixes2: Seq[String], suffixes3: Seq[String], suffixes4: Seq[String],
      wild1: Seq[String], wild2: Seq[String],
      exc2: Seq[String], exc3: Seq[String])

  private[graft] lazy val psl: PslRules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.txt")
    require(in != null, "public_suffix_snapshot.txt missing from resources")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toList
      finally in.close()
    def labels(s: String) = s.count(_ == '.') + 1
    val (excRaw, rest) = lines.partition(_.startsWith("!"))
    val (wildRaw, linear) = rest.partition(_.startsWith("*."))
    val exc = excRaw.map(_.substring(1))
    val wild = wildRaw.map(_.substring(2)) // the base under the '*.'
    PslRules(
      suffixes2 = linear.filter(labels(_) == 2),
      suffixes3 = linear.filter(labels(_) == 3),
      suffixes4 = linear.filter(labels(_) == 4),
      wild1 = wild.filter(labels(_) == 1),
      wild2 = wild.filter(labels(_) == 2),
      exc2 = exc.filter(labels(_) == 2),
      exc3 = exc.filter(labels(_) == 3))
  }

  /** Registered domain (public suffix + one label) via the FULL
    * public-suffix algorithm over the bundled snapshot:
    * `news.bbc.co.uk` → `bbc.co.uk`, `a.b.example.com` → `example.com`,
    * wildcard `foo.bar.ck` → `bar.ck` under `*.ck`, exception
    * `any.www.ck` → `www.ck` under `!www.ck`, 4-label
    * `x.pvt.k12.ma.us` → `x.pvt…` stays, punycode `shop.xn--55qx5d.cn` →
    * itself + one label. Rule precedence is the PSL's: exceptions beat
    * wildcards beat shorter linear rules; a host that IS a public suffix
    * returns itself; anything unlisted falls back to the last-two-labels
    * rule. IPv4 literals pass through whole. Pure Column composition —
    * the big suffix sets compile to `InSet` hash probes and the small
    * wildcard/exception sets to short `In` chains, all inside whole-stage
    * codegen, so the URL-dedup key stays UDF-free at crawl scale.
    *
    * `unicodeHosts = true` additionally IDNA-encodes non-ASCII hosts
    * (`java.net.IDN`) before matching, so unicode-form IDN hosts hit the
    * punycode rules — this branch is a UDF, so leave it off (the default)
    * when hosts are already ASCII/punycode, which keeps the plan
    * UDF-free (asserted in CI by PlanAuditNetSpec).
    */
  def registeredDomain(url: Column, unicodeHosts: Boolean = false): Column = {
    // NO `www.` strip here (unlike canonicalUrl): the PSL walk already
    // reduces www.example.com to example.com, and stripping would break
    // the `!www.ck` exception class where `www` IS the registrable label
    val host = if (!unicodeHosts) lower(parse_url(url, lit("HOST"))) else {
      // parse_url (java.net.URI) rejects non-ASCII authorities, so fall
      // back to a regex authority grab, then IDNA-encode the rare
      // non-ASCII hosts so they match the punycode PSL entries
      val rawHost = lower(coalesce(parse_url(url, lit("HOST")),
        nullif(regexp_extract(url,
          "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", 1), lit(""))))
      val idna = udf { (h: String) =>
        if (h == null) null
        else try java.net.IDN.toASCII(h).toLowerCase(java.util.Locale.ROOT)
        catch { case _: IllegalArgumentException => h }
      }
      when(rawHost.rlike("^[\\x00-\\x7F]*$"), rawHost).otherwise(idna(rawHost))
    }
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column = array_join(slice(labels, -k, k), ".")
    val lastLabel = element_at(labels, -1)
    when(host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$"), host)
      .when(n <= lit(1), host)
      // exception rules first: they cancel the wildcard below them and
      // are themselves the registered domain for any host under them
      .when(lastK(3).isInCollection(psl.exc3), lastK(3))
      .when(lastK(2).isInCollection(psl.exc2), lastK(2))
      // longest linear rules next (4-label, e.g. pvt.k12.ma.us)
      .when(n >= lit(5) && lastK(4).isInCollection(psl.suffixes4), lastK(5))
      .when(n === lit(4) && lastK(4).isInCollection(psl.suffixes4), host)
      // 2-label-base wildcards (*.kawasaki.jp → 3-label suffixes)
      .when(n >= lit(4) && lastK(2).isInCollection(psl.wild2), lastK(4))
      .when(n === lit(3) && lastK(2).isInCollection(psl.wild2), host)
      // 3-label linear rules (a host that IS a 3-label suffix returns
      // itself, e.g. s3.amazonaws.com where amazonaws.com is unlisted)
      .when(n >= lit(4) && lastK(3).isInCollection(psl.suffixes3), lastK(4))
      .when(n === lit(3) && lastK(3).isInCollection(psl.suffixes3), host)
      // 1-label-base wildcards (*.ck → 2-label suffixes)
      .when(n >= lit(3) && lastLabel.isInCollection(psl.wild1), lastK(3))
      .when(n === lit(2) && lastLabel.isInCollection(psl.wild1), host)
      // 2-label linear rules, then the classic fallback
      .when(n >= lit(3) && lastK(2).isInCollection(psl.suffixes2), lastK(3))
      .otherwise(lastK(2))
  }

  /** Check a presigned URL's signature and expiry against `nowEpochS`. */
  val verifyPresignedUrl = udf { (signed: String, nowEpochS: Long, secret: String) =>
    if (signed == null) false
    else {
      val m = "^(.*?)[?&]X-Graft-Expires=(\\d+)&X-Graft-Signature=([0-9a-f]+)$".r
      signed match {
        case m(uri, expS, sig) =>
          val exp = expS.toLong
          exp >= nowEpochS && hmacHex(secret, s"$uri\n$exp") == sig
        case _ => false
      }
    }
  }
}
