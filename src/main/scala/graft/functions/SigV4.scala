package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

/** AWS Signature Version 4 request signing — the public HMAC-SHA256
  * canonical-request scheme (documented in AWS's general reference with
  * an official test-suite; SigV4Spec pins the published `get-vanilla`
  * vector). No SDK: the algorithm is hash chains over strings. Used by
  * `Providers` for Bedrock when an `awsRegion` is configured.
  */
object SigV4 {

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data.getBytes(UTF_8))
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def sha256Hex(b: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))

  /** Authorization header value for one request. `headers` must contain
    * every header to be signed (at minimum host and x-amz-date, matching
    * what is actually sent); `amzDate` is `yyyyMMdd'T'HHmmss'Z'`.
    */
  def sign(method: String, canonicalPath: String, canonicalQuery: String,
      headers: Seq[(String, String)], payload: Array[Byte], akid: String,
      secret: String, region: String, service: String,
      amzDate: String): String = {
    val canon = headers
      .map { case (k, v) => k.toLowerCase -> v.trim.replaceAll("\\s+", " ") }
      .sortBy(_._1)
    val signedHeaders = canon.map(_._1).mkString(";")
    val canonicalRequest = Seq(
      method,
      canonicalPath,
      canonicalQuery,
      canon.map { case (k, v) => s"$k:$v\n" }.mkString,
      signedHeaders,
      sha256Hex(payload)).mkString("\n")
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      ("AWS4" + secret).getBytes(UTF_8), date), region), service),
      "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$akid/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }

  /** UTC timestamp in the x-amz-date format. */
  def amzNow(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
}
