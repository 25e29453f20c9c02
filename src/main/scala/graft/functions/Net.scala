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

  /** Multi-label public suffixes from the bundled PSL snapshot
    * (publicsuffix.org data, public domain), split by label count so the
    * longest-match rule is a fixed two-branch check: 3-label suffixes are
    * tested before 2-label ones, and anything unlisted falls back to the
    * classic "last label is the suffix" rule.
    */
  private lazy val (suffixes3, suffixes2): (Seq[String], Seq[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.txt")
    require(in != null, "public_suffix_snapshot.txt missing from resources")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toList
      finally in.close()
    lines.partition(_.count(_ == '.') == 2)
  }

  /** Registered domain (public suffix + one label) via the bundled
    * public-suffix snapshot: `news.bbc.co.uk` → `bbc.co.uk`,
    * `a.b.example.com` → `example.com`. Longest-match over the snapshot's
    * 3- then 2-label suffixes; unlisted suffixes fall back to the last-two-
    * labels rule. IPv4 literals pass through whole (an IP has no registered
    * domain boundary). Pure Column composition — the suffix sets compile to
    * `InSet` hash probes inside whole-stage codegen, so the URL-dedup key
    * stays UDF-free at crawl scale.
    */
  def registeredDomain(url: Column): Column = {
    val host = regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column = array_join(slice(labels, -k, k), ".")
    when(host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$"), host)
      .when(n <= lit(1), host)
      .when(n >= lit(4) && lastK(3).isInCollection(suffixes3), lastK(4))
      .when(n >= lit(3) && lastK(2).isInCollection(suffixes2), lastK(3))
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
