package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's math family (`/root/reference/pixeltable/functions/
  * math.py:21-255`, 14 functions) — all direct built-ins.
  */
object Maths {
  def abs(x: Column): Column = org.apache.spark.sql.functions.abs(x)
  def ceil(x: Column): Column = org.apache.spark.sql.functions.ceil(x)
  def floor(x: Column): Column = org.apache.spark.sql.functions.floor(x)
  def round(x: Column, digits: Int = 0): Column =
    org.apache.spark.sql.functions.round(x, digits)
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
