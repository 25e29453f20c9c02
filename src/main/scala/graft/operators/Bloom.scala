package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom filter — the scale path for membership checks whose
  * key set outgrows an exact broadcast (the q94 decontamination pattern:
  * an eval SUITE broadcasts exactly, but decontaminating against another
  * multi-TB CORPUS needs a compact sketch; Bloom is how Dolma's dedup
  * and CCNet's dedup pass ship membership to every worker).
  *
  * Construction is a typed partial Aggregator: each task ORs key bits
  * into a local m-bit array and partials merge by OR, so the driver only
  * ever holds m/64 longs — never a key set. Bits come from
  * Kirsch-Mitzenmacher double hashing over the two md5 halves
  * (h_i = h1 + i·h2 mod m), the standard k-from-2 construction.
  * Deterministic: same keys → same bits in any partitioning.
  *
  * Guarantees: NO false negatives (every inserted key tests true);
  * false-positive rate ≈ (1 − e^{−kn/m})^k, controlled by mBits/k —
  * q145 gates the no-false-negative side exactly and bounds the FP side.
  */
object Bloom {

  /** Bit positions of `key` (Kirsch-Mitzenmacher from the md5 halves). */
  def bitsFor(key: String, mBits: Long, k: Int): Seq[Long] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    def long(off: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
      v
    }
    val h1 = long(0); val h2 = long(8) | 1L // odd h2 cycles all residues
    (0 until k).map { i =>
      val h = h1 + i.toLong * h2
      java.lang.Math.floorMod(h, mBits)
    }
  }

  def mightContain(bloom: Array[Long], mBits: Long, k: Int,
      key: String): Boolean =
    bitsFor(key, mBits, k).forall(b =>
      (bloom((b >>> 6).toInt) & (1L << (b & 63))) != 0L)

  private final class BuildAgg(mBits: Long, k: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](((mBits + 63) / 64).toInt)
    def reduce(b: Array[Long], key: String): Array[Long] = {
      if (key != null) bitsFor(key, mBits, k).foreach(bit =>
        b((bit >>> 6).toInt) |= (1L << (bit & 63)))
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build the filter over a key column — one partial-aggregating pass,
    * m/64 longs on the driver.
    */
  def build(keys: DataFrame, keyCol: String, mBits: Long,
      k: Int = 5): Array[Long] = {
    keys.select(col(keyCol).cast("string").as("k"))
      .na.drop()
      .select(udaf(new BuildAgg(mBits, k), Encoders.STRING).apply(col("k")))
      .head().getSeq[Long](0).toArray
  }

  /** A built filter bound to its one Spark broadcast: build (or wrap) once,
    * test membership in as many stages of a pipeline as needed without
    * re-shipping the bit array per call. `destroy()` releases executor
    * copies when the pipeline is done with it.
    */
  final case class Handle(bc: org.apache.spark.broadcast.Broadcast[Array[Long]],
      mBits: Long, k: Int) extends Serializable {
    /** membership as a map-only Column, reusing the shared broadcast */
    def contains(keyCol: Column): Column = {
      val (b, m, kk) = (bc, mBits, k) // avoid capturing the Handle in the UDF
      val f = udf { (key: String) =>
        if (key == null) false else mightContain(b.value, m, kk, key)
      }
      f(keyCol.cast("string"))
    }
    def destroy(): Unit = bc.destroy()
  }

  /** Build + broadcast in one step: the handle's broadcast is shared by
    * every subsequent `contains` call (a pipeline that tests membership in
    * several stages ships the bit array once, not once per stage).
    */
  def buildHandle(keys: DataFrame, keyCol: String, mBits: Long,
      k: Int = 5): Handle =
    Handle(keys.sparkSession.sparkContext.broadcast(
      build(keys, keyCol, mBits, k)), mBits, k)

  /** Membership test as a Column over a broadcast filter (map-only).
    * Broadcasts `bloom` for this one call — for multi-stage reuse build a
    * [[Handle]] instead.
    */
  def containsColumn(df: DataFrame, keyCol: Column, bloom: Array[Long],
      mBits: Long, k: Int = 5): Column =
    Handle(df.sparkSession.sparkContext.broadcast(bloom), mBits, k)
      .contains(keyCol)

  /** Bloom-side decontamination (the Dedup.decontaminate scale variant):
    * flag training docs with ANY n-gram in the filter built from the
    * benchmark side. Map-only over the corpus; the sketch replaces the
    * exact broadcast set.
    */
  def decontaminateBloom(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 13, mBits: Long = 1 << 20,
      k: Int = 5): DataFrame = {
    import graft.functions.TextFunctions
    def grams(df: DataFrame) = df.select(col(idCol).as("_id"),
      explode(TextFunctions.wordNgrams(
        TextFunctions.tokens(lower(col(textCol))), n)).as("_gram"))
    val bloom = build(grams(bench), "_gram", mBits, k)
    grams(train)
      .withColumn("_hit", containsColumn(train, col("_gram"), bloom, mBits, k))
      .groupBy(col("_id").as(idCol))
      .agg(max(col("_hit")).as("bloom_contaminated"))
  }
}
