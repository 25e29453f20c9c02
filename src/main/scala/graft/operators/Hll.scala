package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
  * standard linear-counting small-range correction) formulated as PLAIN
  * DataFrame aggregations — no UDA, no UDF, fully whole-stage-codegen:
  *
  *   rows → (keys, bucket, rho)                       map-only column ops
  *        → groupBy(keys, bucket).agg(max(rho))       shuffle 1 (combined)
  *        → groupBy(keys).agg(register functionals)   shuffle 2 (tiny)
  *
  * The map-side combine of shuffle 1 means each upstream partition emits
  * at most |keys|×m rows regardless of input size — the sketch property
  * itself IS the scale story; shuffle 2 moves ≤ m rows per group. This is
  * exactly how a 100 TB distinct-count runs: no raw values cross the
  * network after the first partial aggregate.
  *
  * Hashing is md5-hex-digit based (the q184 simhash idiom) so a SQL
  * oracle can recompute the IDENTICAL register state: bucket = first two
  * hex digits (m = 256, p = 8), rho = 1 + leading zero BITS of the next
  * 13 hex digits (a 52-bit window; all-zero window → rho = 53). Register
  * contents are small integers, so cross-engine comparison is exact —
  * no float tolerance anywhere in the sketch state.
  *
  * Reference surface: pixeltable exposes approximate counting only via
  * its aggregate registry (`count` family); this is a beyond-reference
  * pipeline operator in the dedup/statistics group alongside
  * `operators/HeavyHitters.scala`.
  */
object Hll {

  /** Number of registers (p = 8). 256 gives ±1.04/√256 ≈ 6.5% standard
    * error — the right tier for pipeline telemetry; the construction
    * generalizes to any even number of hex digits.
    */
  val M = 256

  private val Alpha = 0.7213 / (1.0 + 1.079 / M) // bias constant, m ≥ 128

  /** (bucket, rho) columns for `value` (any type; cast to its canonical
    * string form before hashing so the oracle can reproduce it).
    */
  def hashCols(value: Column): (Column, Column) = {
    val hx = md5(value.cast("string").cast("binary"))
    val bucket = conv(substring(hx, 1, 2), 16, 10).cast("int")
    val win = substring(hx, 3, 13)
    val z = length(regexp_extract(win, "^0*", 0))
    val dv = conv(hx.substr(z + lit(3), lit(1)), 16, 10).cast("int")
    val lzBits = when(dv >= 8, 0).when(dv >= 4, 1).when(dv >= 2, 2)
      .otherwise(3)
    val rho = when(z === 13, lit(53))
      .otherwise(z * 4 + lzBits + 1)
    (bucket, rho)
  }

  /** Per-(keys, bucket) max-rho registers — the mergeable sketch state.
    * Registers from disjoint data merge by MAX on (keys, bucket), which
    * Spark's partial aggregation performs automatically when sketching a
    * union (HllSpec pins the merge law).
    */
  def registers(df: DataFrame, keys: Seq[String],
      value: Column): DataFrame = {
    val (bucket, rho) = hashCols(value)
    // HLL semantics ignore nulls; without the filter a null value
    // yields a null-bucket register whose m is skipped by sum() but
    // counted by n_hit, skewing V = M − n_hit by one.
    df.where(value.isNotNull)
      .select(keys.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max("rho").as("m"))
  }

  /** Distinct-count estimate per key group from `registers` output:
    * raw = α·m²/(Σ 2^−Mj + V) with V empty registers (each contributing
    * 2⁰), corrected by linear counting m·ln(m/V) when raw ≤ 2.5m and
    * V > 0. Output keeps the integer register functionals (`n_hit`,
    * `sum_rho`, `max_rho`) — the exactly-comparable sketch state.
    */
  def estimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val agg = regs.groupBy(keys.map(col): _*).agg(
      count(lit(1)).cast("long").as("n_hit"),
      sum("m").cast("long").as("sum_rho"),
      max("m").cast("long").as("max_rho"),
      sum(pow(lit(2.0), -col("m"))).as("zsum"))
    val v = lit(M) - col("n_hit")
    val raw = lit(Alpha * M * M) / (col("zsum") + v)
    agg.withColumn("estimate",
      when(v > 0 && raw <= 2.5 * M, lit(M.toDouble) * log(lit(M) / v))
        .otherwise(raw))
  }

  /** One-call convenience: keys + n_hit/sum_rho/max_rho/estimate. */
  def distinctSketch(df: DataFrame, keys: Seq[String],
      value: Column): DataFrame =
    estimate(registers(df, keys, value), keys)
}
