package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's math family (`/root/reference/pixeltable/functions/
  * math.py:21-255`, 14 functions) — all direct built-ins.
  */
object Maths {
  def abs(x: Column): Column = org.apache.spark.sql.functions.abs(x)

  private def nonFinite(x: Column): Column =
    isnan(x) || x === Double.PositiveInfinity || x === Double.NegativeInfinity

  /** ceil/floor keep FLOAT semantics (reference `tests/functions/
    * test_math.py:33-34`: `float(math.ceil(x))`, infinities pass
    * through) — Spark's builtins return LONG and overflow on ±inf.
    */
  def ceil(x: Column): Column =
    when(nonFinite(x), x)
      .otherwise(org.apache.spark.sql.functions.ceil(x).cast("double"))
  def floor(x: Column): Column =
    when(nonFinite(x), x)
      .otherwise(org.apache.spark.sql.functions.floor(x).cast("double"))

  /** CPython-exact round (reference math.round = builtins.round):
    * half-even over the TRUE binary value — round(2.675, 2) = 2.67
    * because the double is really 2.67499…; Spark's round/bround round
    * the shortest decimal string instead and disagree exactly on such
    * values. `new BigDecimal(double)` is the exact binary expansion, so
    * setScale(HALF_EVEN) reproduces CPython bit-for-bit.
    */
  private val roundPy = udf { (x: java.lang.Double, digits: Int) =>
    if (x == null) null
    else if (x.isNaN || x.isInfinite) x
    else java.lang.Double.valueOf(new java.math.BigDecimal(x.doubleValue)
      .setScale(digits, java.math.RoundingMode.HALF_EVEN).doubleValue)
  }
  def round(x: Column, digits: Int = 0): Column = roundPy(x, lit(digits))
  def pow(x: Column, y: Column): Column = org.apache.spark.sql.functions.pow(x, y)
  def sqrt(x: Column): Column = org.apache.spark.sql.functions.sqrt(x)
  def exp(x: Column): Column = org.apache.spark.sql.functions.exp(x)
  def log(x: Column): Column = org.apache.spark.sql.functions.log(x)
  def log10(x: Column): Column = org.apache.spark.sql.functions.log10(x)
  def bitwise_and(x: Column, y: Column): Column = x.bitwiseAND(y)
  def bitwise_or(x: Column, y: Column): Column = x.bitwiseOR(y)
  def bitwise_xor(x: Column, y: Column): Column = x.bitwiseXOR(y)
  def to_int(x: Column): Column = x.cast("long")
  def to_float(x: Column): Column = x.cast("double")
}
