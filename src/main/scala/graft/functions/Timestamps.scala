package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's timestamp family (`/root/reference/pixeltable/functions/
  * timestamp.py:24-341`, 22 functions) and date family (`date.py:28-205`).
  * Timestamps are session-TZ instants (stored UTC) exactly like the
  * reference (`type_system.py:928`).
  */
object Timestamps {
  def year(ts: Column): Column = org.apache.spark.sql.functions.year(ts).cast("long")
  def month(ts: Column): Column = org.apache.spark.sql.functions.month(ts).cast("long")
  def day(ts: Column): Column = dayofmonth(ts).cast("long")
  def hour(ts: Column): Column = org.apache.spark.sql.functions.hour(ts).cast("long")
  def minute(ts: Column): Column = org.apache.spark.sql.functions.minute(ts).cast("long")
  def second(ts: Column): Column = org.apache.spark.sql.functions.second(ts).cast("long")
  def microsecond(ts: Column): Column =
    (unix_micros(ts.cast("timestamp")) % 1000000L).cast("long")
  def date(ts: Column): Column = to_date(ts)
  def astimezone(ts: Column, tz: String): Column =
    convert_timezone(lit("UTC"), lit(tz), ts.cast("timestamp_ntz"))
  def weekday(ts: Column): Column = org.apache.spark.sql.functions.weekday(ts).cast("long") // Monday=0
  def isoweekday(ts: Column): Column = (org.apache.spark.sql.functions.weekday(ts) + 1).cast("long")
  def isocalendar(ts: Column): Column = struct(
    org.apache.spark.sql.functions.year(ts).cast("long").as("year"),
    weekofyear(ts).cast("long").as("week"),
    isoweekday(ts).as("weekday"))
  def isoformat(ts: Column): Column = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
  def strftime(ts: Column, javaFormat: String): Column = date_format(ts, javaFormat)
  def make_timestamp(y: Column, m: Column, d: Column, h: Column, mi: Column, s: Column): Column =
    org.apache.spark.sql.functions.make_timestamp(y, m, d, h, mi, s)
  def strip_timezone(ts: Column): Column = ts.cast("timestamp_ntz")
  def toordinal(ts: Column): Column =
    (datediff(to_date(ts), lit("0001-01-01").cast("date")) + 1).cast("long")
  def posix_timestamp(ts: Column): Column =
    unix_micros(ts.cast("timestamp")).cast("double") / 1e6

  // date family extras
  def make_date(y: Column, m: Column, d: Column): Column =
    org.apache.spark.sql.functions.make_date(y, m, d)
  def add_days(d: Column, n: Int): Column = date_add(d, n)
}
