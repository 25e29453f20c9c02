package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Scalar UDF surface (reference `@pxt.udf`,
  * `/root/reference/pixeltable/func/udf.py:27-106`) for the Python-exact
  * string semantics that Spark built-ins don't reproduce (SURVEY.md §7.4
  * hard part 2). Prefer built-in Column functions everywhere else — a UDF
  * breaks codegen and pushdown for the expression it wraps.
  */
object Udfs {

  /** Python `str.title()`: every alpha run starts uppercase, rest lowercase
    * (reference `functions/string.py` title). Differs from `initcap`, which
    * splits on whitespace only and lowercases the remainder of each word.
    */
  val titleCase = udf { (s: String) =>
    if (s == null) null
    else {
      val sb = new StringBuilder(s.length)
      var prevAlpha = false
      s.foreach { c =>
        if (c.isLetter) {
          sb += (if (prevAlpha) c.toLower else c.toUpper)
          prevAlpha = true
        } else { sb += c; prevAlpha = false }
      }
      sb.toString
    }
  }

  /** uuid4: random v4 UUID (nondeterministic, like reference
    * `functions/uuid.py:14`).
    */
  val uuid4 = udf(() => java.util.UUID.randomUUID().toString).asNondeterministic()

  /** uuid7: time-ordered UUID (reference `functions/uuid.py:29`):
    * 48-bit unix-ms timestamp + version/variant bits + random — sortable by
    * creation time, the reference's preferred row id generator.
    */
  val uuid7 = udf { () =>
    val ms = System.currentTimeMillis()
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    val hi = (ms << 16) | 0x7000L | (rnd.nextLong() & 0x0fffL)
    val lo = (rnd.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L
    new java.util.UUID(hi, lo).toString
  }.asNondeterministic()

  /** Python `str.zfill(width)`: left-pad with zeros, sign-aware. */
  val zfill = udf { (s: String, width: Int) =>
    if (s == null) null
    else if (s.length >= width) s
    else if (s.nonEmpty && (s(0) == '+' || s(0) == '-'))
      s(0) + ("0" * (width - s.length)) + s.substring(1)
    else "0" * (width - s.length) + s
  }

  /** Python `//` floor division on longs (SQL div truncates toward zero). */
  val floorDiv = udf { (a: Long, b: Long) => Math.floorDiv(a, b) }

  /** Python `%` (sign of divisor; SQL % takes sign of dividend). */
  val pyMod = udf { (a: Long, b: Long) => Math.floorMod(a, b) }

  def title(c: Column): Column = titleCase(c)

  /** Unicode NFC normalization (Python str via unicodedata.normalize). */
  val nfcNormalize = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  /** Python textwrap.wrap: greedy word wrap to `width`, breaking long
    * words; returns the list of lines.
    */
  private[graft] def textWrapImpl(s: String, width: Int): Seq[String] = {
    if (s == null) return null
    val words = s.trim.split("\\s+").filter(_.nonEmpty).flatMap { w =>
      if (w.length <= width) Seq(w) else w.grouped(width).toSeq
    }
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    words.foreach { w =>
      if (cur.isEmpty) cur ++= w
      else if (cur.length + 1 + w.length <= width) { cur += ' '; cur ++= w }
      else { lines += cur.toString; cur.clear(); cur ++= w }
    }
    if (cur.nonEmpty) lines += cur.toString
    lines.toSeq
  }

  val textWrap = udf(textWrapImpl _)
}
