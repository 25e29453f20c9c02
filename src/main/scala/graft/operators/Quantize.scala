package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization for embedding columns: one per-tensor scale
  * `s = max(abs(v))` over the corpus, each float encoded to
  * `round(v / s * 127)` in [-127, 127]. 4x smaller than fp32 — the
  * compression layer a 100 TB embedding store needs before any index.
  *
  * Because the transform is linear (no per-dimension offset), the INTEGER
  * dot product of two code vectors is proportional to the true dot product
  * (up to rounding), so ranking by integer dot approximates exact-dot
  * ranking directly — and, being integer arithmetic, is bit-deterministic
  * across engines: the DuckDB oracle replicates it exactly, unlike any
  * float-accumulation similarity. (Per-dimension ASYMMETRIC codes would
  * break this: the offsets make raw code dots non-monotone in the true
  * dot.)
  *
  * Scale shapes:
  *  - `scaleStat` is a single global max-abs aggregate (map-side combine;
  *    scalar result — metadata, like k-means centroids).
  *  - `encode` is map-only.
  *  - `searchQuantized` is a map + TakeOrderedAndProject top-k; no shuffle
  *    of the corpus.
  *
  * Reference has no quantization (pgvector holds fp32/fp16 only,
  * index/embedding_index.py:20-21); this is a north-star scale extension.
  */
object Quantize {

  /** Per-tensor scale: max |v| over every element of the corpus. */
  def scaleStat(df: DataFrame, embCol: String): Double = {
    val r = df.select(
      max(array_max(transform(col(embCol).cast("array<double>"), v => abs(v))))
        .as("s")).collect()(0)
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Quantize one double given scale `s`; clamps to [-127, 127]. */
  def encodeValue(v: Double, s: Double): Int =
    if (s > 0) math.max(-127, math.min(127, math.round(v / s * 127.0).toInt))
    else 0

  /** Column of int8 codes (array<int>) for an embedding column. */
  def encode(embCol: Column, s: Double): Column =
    if (s <= 0) transform(embCol.cast("array<double>"), _ => lit(0))
    else transform(embCol.cast("array<double>"), v =>
      greatest(least(round(v / s * 127.0), lit(127.0)), lit(-127.0)).cast("int"))

  /** Integer dot product of two code arrays — exact, no float accumulation. */
  def codeDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Codes for a query vector under its OWN max-abs scale (a deterministic
    * function of the literal query alone — both positive constants, so
    * integer-dot ranking is unchanged).
    */
  def encodeQuery(queryVec: Seq[Double]): Seq[Int] = {
    val qs = queryVec.map(math.abs).foldLeft(0.0)(math.max)
    queryVec.map(encodeValue(_, qs))
  }

  /** Top-k by quantized integer dot against `queryVec`. Emits
    * (idCol, qdot) ordered by (qdot desc, id) — fully deterministic.
    */
  def searchQuantized(df: DataFrame, embCol: String, idCol: String,
      queryVec: Seq[Double], k: Int, s: Double): DataFrame = {
    val qArr = array(encodeQuery(queryVec).map(lit): _*)
    df.select(col(idCol), codeDot(encode(col(embCol), s), qArr).as("qdot"))
      .orderBy(col("qdot").desc, col(idCol))
      .limit(k)
  }
}
