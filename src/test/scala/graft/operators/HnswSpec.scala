package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HnswSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** deterministic pseudo-random vector for id i */
  private def vec(i: Long, dim: Int = 16): Array[Double] =
    Array.tabulate(dim) { d =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v:$i:$d".getBytes("UTF-8"))
      (java.nio.ByteBuffer.wrap(h).getInt() / Int.MaxValue.toDouble)
    }

  private def bruteTopK(vs: Seq[(Long, Array[Double])], q: Array[Double],
      k: Int): Seq[Long] = {
    val qn = Hnsw.unit(q)
    vs.map { case (id, v) =>
      val u = Hnsw.unit(v)
      (id, u.zip(qn).map { case (a, b) => a * b }.sum)
    }.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
  }

  test("graph search recall vs brute force on one shard") {
    val data = (0L until 500L).map(i => i -> vec(i))
    val g = Hnsw.buildGraph(data.iterator, m = 16, efConstruction = 100)
    val q = vec(9999L)
    val expected = bruteTopK(data, q, 10).toSet
    val got = g.search(q, 10, ef = 64).map(_._1).toSet
    val recall = (expected & got).size / 10.0
    assert(recall >= 0.9, s"recall $recall below 0.9: got $got want $expected")
  }

  test("build is deterministic and serialization round-trips") {
    val data = (0L until 200L).map(i => i -> vec(i))
    val g1 = Hnsw.buildGraph(data.iterator, m = 8, efConstruction = 50)
    val g2 = Hnsw.buildGraph(data.iterator, m = 8, efConstruction = 50)
    assert(java.util.Arrays.equals(g1.serialize(), g2.serialize()))
    val g3 = Hnsw.deserialize(g1.serialize())
    val q = vec(777L)
    assert(g1.search(q, 5, 32) == g3.search(q, 5, 32))
  }

  test("sharded index: distributed build, union-of-shards top-k, high recall") {
    val data = (0L until 1000L).map(i => i -> vec(i))
    val df = data.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("hnsw-idx").toString + "/i"
    Hnsw.buildIndex(df, "embedding", "vec_id", idx, shards = 4)
    // one graph per non-empty shard, bytes in parquet
    val shards = spark.read.parquet(idx)
    assert(shards.count() == 4)
    assert(shards.agg(sum("n")).as[Long].head() == 1000L)
    val q = vec(31337L)
    val got = Hnsw.search(spark, idx, q.toSeq, 10, ef = 96)
      .select("vec_id").as[Long].collect().toSet
    val expected = bruteTopK(data, q, 10).toSet
    val recall = (expected & got).size / 10.0
    assert(recall >= 0.9, s"sharded recall $recall: got $got want $expected")
  }

  test("level assignment follows the geometric distribution") {
    val levels = (0L until 20000L).map(Hnsw.levelFor(_, 16))
    val l0 = levels.count(_ == 0) / 20000.0
    assert(l0 > 0.9 && l0 < 0.97, s"P(level=0)=$l0, want ~1-1/16")
    assert(levels.max <= 6, s"suspiciously deep: ${levels.max}")
  }
}
