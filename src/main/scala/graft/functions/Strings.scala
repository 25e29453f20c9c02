package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's complete string function family
  * (`/root/reference/pixeltable/functions/string.py:27-913`, 49 functions)
  * as Column builders. Python-name-compatible (snake_case method → same
  * name here), Python semantics where they differ from SQL (via `PyStrings`
  * compositions or `Udfs` where character-level work is unavoidable).
  * Everything except the explicitly-UDF entries stays codegen'd.
  */
object Strings {

  def capitalize(s: Column): Column = PyStrings.capitalize(s)
  def casefold(s: Column): Column = lower(s) // ASCII casefold == lower
  def center(s: Column, width: Int, fill: String = " "): Column =
    PyStrings.center(s, width, fill)
  def contains(s: Column, sub: String): Column = s.contains(sub)
  def contains_re(s: Column, pattern: String): Column = s.rlike(pattern)
  def count(s: Column, sub: String): Column = PyStrings.countSub(s, sub)
  def endswith(s: Column, suffix: String): Column = s.endsWith(suffix)
  /** textwrap.fill semantics (reference `functions/string.py:140-150`):
    * wrap to width, join lines with '\n' — NOT zfill.
    */
  def fill(s: Column, width: Int): Column =
    array_join(Udfs.textWrap(s, lit(width)), "\n")
  def find(s: Column, sub: String): Column = PyStrings.find(s, sub)
  def findall(s: Column, pattern: String): Column =
    regexp_extract_all(s, lit(pattern), lit(0))
  def format(fmt: String, args: Column*): Column = format_string(fmt, args: _*)
  def fullmatch(s: Column, pattern: String): Column = s.rlike(s"^(?:$pattern)$$")
  def index(s: Column, sub: String): Column = PyStrings.find(s, sub) // -1 vs raise: callers check
  def isalnum(s: Column): Column = s.rlike("^[A-Za-z0-9]+$")
  def isalpha(s: Column): Column = s.rlike("^[A-Za-z]+$")
  def isascii(s: Column): Column = s.rlike("^[\\x00-\\x7F]*$")
  def isdecimal(s: Column): Column = s.rlike("^[0-9]+$")
  def isdigit(s: Column): Column = s.rlike("^[0-9]+$")
  def isidentifier(s: Column): Column = s.rlike("^[A-Za-z_][A-Za-z0-9_]*$")
  def islower(s: Column): Column = (s === lower(s)) && s.rlike("[a-z]")
  def isnumeric(s: Column): Column = s.rlike("^[0-9]+$")
  def isupper(s: Column): Column = (s === upper(s)) && s.rlike("[A-Z]")
  def istitle(s: Column): Column = s === Udfs.titleCase(s) && length(s) > 0
  def isspace(s: Column): Column = s.rlike("^\\s+$")
  def join(sep: String, parts: Column): Column = array_join(parts, sep)
  def len(s: Column): Column = length(s).cast("long")
  def ljust(s: Column, width: Int, fill: String = " "): Column =
    when(length(s) >= width, s).otherwise(rpad(s, width, fill))
  def lower(s: Column): Column = org.apache.spark.sql.functions.lower(s)
  def lstrip(s: Column): Column = ltrim(s)
  def lstrip(s: Column, chars: String): Column = ltrim(s, chars)
  def `match`(s: Column, pattern: String): Column = s.rlike(s"^(?:$pattern)")
  def normalize(s: Column): Column = Udfs.nfcNormalize(s)
  /** reference `pad(width, side, fillchar)` (`functions/string.py:460-477`):
    * side='left' → str.ljust, 'right' → str.rjust, 'both' → str.center
    * (the reference maps the names exactly this way, not pandas-style).
    */
  def pad(s: Column, width: Int, side: String = "left", fill: String = " "): Column =
    side match {
      case "left"  => ljust(s, width, fill)
      case "right" => rjust(s, width, fill)
      case "both"  => center(s, width, fill)
      case other   => throw new IllegalArgumentException(s"Invalid side: $other")
    }
  def partition(s: Column, sep: String): Column = {
    val i = instr(s, sep)
    when(i > 0, array(substring(s, lit(1), i - 1), lit(sep),
      substring(s, i + sep.length, length(s))))
      .otherwise(array(s, lit(""), lit("")))
  }
  def removeprefix(s: Column, prefix: String): Column = PyStrings.removePrefix(s, prefix)
  def removesuffix(s: Column, suffix: String): Column = PyStrings.removeSuffix(s, suffix)
  def repeat(s: Column, n: Int): Column = org.apache.spark.sql.functions.repeat(s, n)
  def replace(s: Column, old: String, nw: String): Column =
    regexp_replace(s, java.util.regex.Pattern.quote(old), java.util.regex.Matcher.quoteReplacement(nw))
  def replace_re(s: Column, pattern: String, repl: String): Column =
    regexp_replace(s, pattern, repl)
  def reverse(s: Column): Column = org.apache.spark.sql.functions.reverse(s)
  def rfind(s: Column, sub: String): Column = {
    // 0-based index of the LAST occurrence (or -1) via the reversed string:
    // sub at 1-based pos p of reverse(s) starts at len - p - len(sub) + 1.
    val p = instr(org.apache.spark.sql.functions.reverse(s), sub.reverse)
    when(p === 0, -1L).otherwise((length(s) - p - sub.length + 1).cast("long"))
  }
  def rindex(s: Column, sub: String): Column = rfind(s, sub)
  def rjust(s: Column, width: Int, fill: String = " "): Column =
    when(length(s) >= width, s).otherwise(lpad(s, width, fill))
  def rpartition(s: Column, sep: String): Column = {
    val rev = org.apache.spark.sql.functions.reverse(s)
    val i = instr(rev, sep.reverse)
    when(i > 0, array(
      substring(s, lit(1), length(s) - i - sep.length + 1),
      lit(sep),
      substring(s, length(s) - i + 2, i - 1)))
      .otherwise(array(lit(""), lit(""), s))
  }
  def rsplit(s: Column, sep: String): Column = split(s, java.util.regex.Pattern.quote(sep))
  def rstrip(s: Column): Column = rtrim(s)
  def rstrip(s: Column, chars: String): Column = rtrim(s, chars)
  def slice(s: Column, start: Int, stop: Int): Column = // Python s[start:stop], 0-based
    substring(s, lit(start + 1), lit(math.max(stop - start, 0)))
  def slice_replace(s: Column, start: Int, stop: Int, repl: String): Column =
    concat(substring(s, lit(1), lit(start)), lit(repl),
      substring(s, lit(stop + 1), length(s)))
  def split(s: Column, sep: String): Column =
    org.apache.spark.sql.functions.split(s, java.util.regex.Pattern.quote(sep))
  def splitlines(s: Column): Column = org.apache.spark.sql.functions.split(s, "\\r?\\n")
  def startswith(s: Column, prefix: String): Column = s.startsWith(prefix)
  def strip(s: Column): Column = trim(s)
  def strip(s: Column, chars: String): Column = trim(s, chars)
  def swapcase(s: Column): Column = PyStrings.swapcase(s)
  def title(s: Column): Column = Udfs.titleCase(s)
  def upper(s: Column): Column = org.apache.spark.sql.functions.upper(s)
  def wrap(s: Column, width: Int): Column = Udfs.textWrap(s, lit(width))
  def zfill(s: Column, width: Int): Column = Udfs.zfill(s, lit(width))
}
