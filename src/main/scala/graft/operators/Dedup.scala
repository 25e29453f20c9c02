package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end deduplication operators for document corpora — the user-facing
  * API over the primitives in `TextFunctions` (north-star op family,
  * BASELINE.json). Each returns the deduplicated DataFrame; the keeper per
  * duplicate group is the row with the smallest `idCol`.
  */
object Dedup {

  /** Exact dedup by content digest: one shuffle on the 128-bit hash. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
  }

  /** Near-dup removal via MinHash+LSH banding: map-side signatures, an
    * equi-join on (band, hash) for candidates (never O(n²)), exact Jaccard
    * on candidates only, then greedy keep-smallest-id within connected
    * pairs (single-link one level — at 100 TB a connected-components pass
    * replaces the last step).
    */
  def nearDuplicates(df: DataFrame, textCol: String, idCol: String,
      jaccardThreshold: Double = 0.9, numHashes: Int = 8, bands: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = bands
    val perBand = numHashes / bands
    val withShingles = df
      .filter(length(col(textCol)) >= shingleSize)
      .withColumn("_sh", TextFunctions.shingles(col(textCol), shingleSize))
    val sig = withShingles.withColumn("_bands", array((0 until rows).map { b =>
      TextFunctions.bandHash((0 until perBand).map(r =>
        TextFunctions.minhash(col("_sh"), b * perBand + r)))
    }: _*))
    val bandsDf = sig.select(col(idCol).as("_id"), col("_sh"),
      posexplode(col("_bands")).as(Seq("_b", "_h")))
    val a = bandsDf.select(col("_id").as("_ida"), col("_sh").as("_sha"), col("_b"), col("_h"))
    val b = bandsDf.select(col("_id").as("_idb"), col("_sh").as("_shb"), col("_b"), col("_h"))
    val dupIds = a.join(b, Seq("_b", "_h"))
      .filter(col("_ida") < col("_idb"))
      .filter(size(array_intersect(col("_sha"), col("_shb"))).cast("double") /
        size(array_union(col("_sha"), col("_shb"))) >= jaccardThreshold)
      .select(col("_idb").as("_dup"))
      .distinct()
    df.join(dupIds, df(idCol) === dupIds("_dup"), "left_anti")
  }

  /** SimHash bucket dedup: rows sharing a 16-bit simhash collapse to the
    * smallest id — a coarse, single-shuffle near-dup pass.
    */
  def simhashBuckets(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(TextFunctions.simhash16(
      TextFunctions.tokens(col(textCol)))).orderBy(col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
  }
}
