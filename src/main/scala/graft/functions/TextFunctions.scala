package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for training-data pipelines: tokenization,
  * shingling, MinHash, SimHash, fingerprints, language ID, quality metrics.
  *
  * Everything here is a composition of codegen'd Spark built-ins — no UDFs —
  * so predicates/projections over these stay inside whole-stage codegen and
  * push down where possible. Hashes are md5-based so results are reproducible
  * across engines (and across Spark versions, unlike `hash()`'s murmur seed).
  *
  * Reference surface: pixeltable has `string_splitter` / `document_splitter`
  * iterators (`/root/reference/pixeltable/functions/string.py:913`,
  * `document.py:163`) but no dedup/lang-id ops; these are the north-star
  * additions for 100 TB pipelines.
  */
object TextFunctions {

  /** whitespace tokens */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** distinct character n-gram shingle set; empty array when length < n
    * (an unguarded `sequence(1, length-(n-1))` would count DOWN for short
    * text — Spark's default step is -1 — yielding bogus substrings).
    */
  def shingles(text: Column, n: Int = 3): Column =
    when(length(text) >= n,
      array_distinct(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** MinHash_j over a shingle-set column: min md5(j ∥ '_' ∥ shingle), 12-hex
    * prefix. A signature of k of these supports banded LSH joins.
    */
  def minhash(shingleSet: Column, j: Int): Column =
    substring(array_min(transform(shingleSet, s => md5(concat(lit(s"${j}_"), s)))), 1, 12)

  /** LSH band hash over consecutive minhash columns. */
  def bandHash(minhashes: Seq[Column]): Column = md5(concat(minhashes: _*))

  /** 16-bit SimHash over a token-array column, as a '0'/'1' string: bit i is
    * the sign of Σ_tokens ±1 by the top bit of md5(token)'s i-th nibble.
    */
  def simhash16(tokens: Column): Column = {
    val bits = (0 until 16).map { i =>
      val contrib = transform(tokens,
        t => when(substring(md5(t), i + 1, 1) >= "8", 1).otherwise(-1))
      when(aggregate(contrib, lit(0), (a, x) => a + x) > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** whitespace-normalized 16-hex content fingerprint */
  def fingerprint(text: Column): Column =
    substring(md5(lower(regexp_replace(text, "\\s+", " "))), 1, 16)

  /** count of tokens contained in a fixed vocabulary */
  def vocabHits(tokens: Column, vocab: Seq[String]): Column =
    size(filter(tokens, t => vocab.map(w => t === w).reduce(_ || _))).cast("long")

  /** type-token ratio (lexical diversity) */
  def typeTokenRatio(tokens: Column): Column =
    size(array_distinct(tokens)).cast("double") / size(tokens)

  /** space-joined word n-grams over a token array; empty when < n tokens
    * (same guard rationale as `shingles`: Spark's `sequence` counts DOWN
    * when stop < start). The 13-gram form of this is the standard
    * benchmark-decontamination unit (GPT-3 appendix C / Llama 2 §A.6).
    */
  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  // PII patterns: shared RE2/Java-regex-safe dialect (no lookaround, no
  // backrefs) so Spark and the DuckDB oracle match identical spans.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails, NNN-NNN-NNNN phone numbers and IPv4 addresses with
    * typed placeholders — the standard pre-training PII scrub. Map-only:
    * three codegen'd regexp_replace passes, no shuffle, trivially
    * data-parallel at any scale. Order matters: emails first (an email's
    * domain may contain an IPv4-looking host), then phones, then IPs.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** Count of PII matches (emails + phones + IPv4s), each pattern counted
    * on the text with the earlier patterns already redacted — the same
    * precedence `redactPii` applies.
    */
  def piiCount(text: Column): Column = {
    val noEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, phoneRe, "<PHONE>")
    (regexp_count(text, lit(emailRe)) +
      regexp_count(noEmail, lit(phoneRe)) +
      regexp_count(noPhone, lit(ipv4Re))).cast("long")
  }
}
