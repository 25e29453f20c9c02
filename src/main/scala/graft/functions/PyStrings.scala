package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Python-exact string semantics as pure Column compositions — the
  * SQL-pushdown twin pattern of the reference (`@pxt.udf` with `to_sql`,
  * `/root/reference/pixeltable/functions/string.py:27-913`): where Python
  * and SQL semantics diverge (find's -1, capitalize, center's pad split,
  * count of substrings), express the Python behavior in Column algebra so
  * it stays inside whole-stage codegen instead of dropping to a UDF.
  * ASCII-complete; full Unicode case folding would need the UDF route
  * (`Udfs`).
  */
object PyStrings {

  private val lowerAz = ('a' to 'z').mkString
  private val upperAz = ('A' to 'Z').mkString

  /** Python str.capitalize: first char upper, rest lower. */
  def capitalize(s: Column): Column =
    concat(upper(substring(s, 1, 1)), lower(substrFrom(s, 2)))

  /** Python str.find: 0-based index or -1 (SQL instr is 1-based, 0 = miss). */
  def find(s: Column, sub: String): Column =
    (instr(s, sub) - 1).cast("long")

  /** Python str.count: non-overlapping substring occurrences. */
  def countSub(s: Column, sub: String): Column = {
    require(sub.nonEmpty)
    ((length(s) - length(regexp_replace(s, java.util.regex.Pattern.quote(sub), ""))) /
      sub.length).cast("long")
  }

  /** Python str.center: pad to width; CPython's split puts the odd fill char
    * on the LEFT when width is odd (`left = marg//2 + (marg & width & 1)`,
    * Objects/unicodeobject.c pad) — 'ab'.center(5,'*') == '**ab*'.
    */
  def center(s: Column, width: Int, fill: String = " "): Column = {
    val pad = greatest(lit(width) - length(s), lit(0))
    val left = (floor(pad / 2) + pad.bitwiseAND(lit(width)).bitwiseAND(lit(1))).cast("int")
    val right = (pad - left).cast("int")
    concat(call_function("repeat", lit(fill), left), s,
      call_function("repeat", lit(fill), right))
  }

  /** Python str.swapcase (ASCII). */
  def swapcase(s: Column): Column =
    translate(s, lowerAz + upperAz, upperAz + lowerAz)

  /** Python str.removeprefix. */
  def removePrefix(s: Column, prefix: String): Column =
    when(s.startsWith(prefix), substrFrom(s, prefix.length + 1)).otherwise(s)

  /** Python str.removesuffix. */
  def removeSuffix(s: Column, suffix: String): Column =
    when(s.endsWith(suffix), substring(s, lit(1), length(s) - suffix.length))
      .otherwise(s)

  /** substring from pos to end */
  private def substrFrom(s: Column, pos: Int): Column =
    substring(s, lit(pos), greatest(length(s) - (pos - 1), lit(0)))
}
