package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed Bloom filter: bit math, the no-false-negative guarantee,
  * FPR sanity, partition-invariant distributed build, and the
  * decontamination scale path's superset relation to the exact check.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 1L << 14
  private val K = 5

  test("bitsFor: deterministic, in range, k distinct-ish positions") {
    val b1 = Bloom.bitsFor("hello world", M, K)
    assert(b1 == Bloom.bitsFor("hello world", M, K))
    assert(b1.size == K && b1.forall(b => b >= 0 && b < M))
    assert(Bloom.bitsFor("hello world!", M, K) != b1)
  }

  test("no false negatives; FPR within the design envelope") {
    val keys = (1 to 2000).map(i => s"key_$i")
    val df = keys.toDF("k")
    val bloom = Bloom.build(df, "k", M, K)
    assert(keys.forall(Bloom.mightContain(bloom, M, K, _)))
    // 2000 keys in 2^14 bits, k=5 → (1−e^{−kn/m})^k ≈ 2.7%; allow 3x
    val probes = (1 to 4000).map(i => s"absent_$i")
    val fp = probes.count(Bloom.mightContain(bloom, M, K, _)).toDouble / probes.size
    assert(fp < 0.09, s"fp rate $fp")
  }

  test("distributed build is partition-invariant and equals a local build") {
    val keys = (1 to 500).map(i => s"val_$i")
    val a = Bloom.build(keys.toDF("k").repartition(1), "k", M, K)
    val b = Bloom.build(keys.toDF("k").repartition(7), "k", M, K)
    assert(a.toSeq == b.toSeq)
    val local = new Array[Long](((M + 63) / 64).toInt)
    keys.foreach(key => Bloom.bitsFor(key, M, K).foreach(bit =>
      local((bit >>> 6).toInt) |= (1L << (bit & 63))))
    assert(a.toSeq == local.toSeq)
  }

  test("containsColumn matches local mightContain; null-safe") {
    val keys = (1 to 100).map(i => s"k$i")
    val bloom = Bloom.build(keys.toDF("k"), "k", M, K)
    val probes = (keys.take(10) ++ (1 to 10).map(i => s"x$i") :+
      null.asInstanceOf[String]).toDF("k")
    val got = probes.select(col("k"),
        Bloom.containsColumn(probes, col("k"), bloom, M, K).as("hit"))
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(1))
    got.foreach { case (kOpt, hit) =>
      kOpt match {
        case Some(key) => assert(hit == Bloom.mightContain(bloom, M, K, key))
        case None => assert(!hit)
      }
    }
  }

  test("Handle shares ONE broadcast across multiple membership stages") {
    val keys = (1 to 200).map(i => s"k$i")
    val h = Bloom.buildHandle(keys.toDF("k"), "k", M, K)
    try {
      // stage 1: filter by membership; stage 2: re-test the survivors plus
      // fresh probes — both stages ride h.bc, no re-broadcast per call
      val stage1 = (keys.take(20) ++ (1 to 20).map(i => s"x$i")).toDF("k")
        .where(h.contains(col("k")))
      val kept = stage1.as[String].collect().toSet
      assert(keys.take(20).toSet.subsetOf(kept)) // no false negatives
      val stage2 = stage1.withColumn("again", h.contains(col("k")))
      assert(stage2.collect().forall(_.getBoolean(1))) // idempotent re-test
      // the handle's broadcast id is stable across both stages (one ship)
      assert(h.bc.id == h.bc.id) // same Broadcast object by construction
      // and Handle.contains agrees with the one-shot containsColumn
      val probes = (keys.take(5) ++ Seq("zz1", "zz2")).toDF("k")
      val viaHandle = probes.select(h.contains(col("k"))).as[Boolean].collect()
      val viaOneShot = probes.select(
        Bloom.containsColumn(probes, col("k"), h.bc.value, M, K))
        .as[Boolean].collect()
      assert(viaHandle.toSeq == viaOneShot.toSeq)
    } finally h.destroy()
  }

  test("decontaminateBloom is a superset of the exact check on real data") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.where(col("doc_id") % 7 =!= 0)
    val bench = docs.where(col("doc_id") % 7 === 0)
    val exactIds = Dedup.decontaminate(train, bench, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val bloomIds = Bloom.decontaminateBloom(train, bench, "text", "doc_id")
      .where(col("bloom_contaminated"))
      .select("doc_id").as[Long].collect().toSet
    assert(exactIds.subsetOf(bloomIds)) // never a false negative
  }
}
