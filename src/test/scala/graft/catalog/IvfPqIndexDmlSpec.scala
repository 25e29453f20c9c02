package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DML-maintained IVF-PQ index lifecycle, mirroring HnswIndexDmlSpec:
  * inserts append encoded code segments WITHOUT retraining, updates rank
  * by the NEW vector (exact re-rank over live vectors beats stale codes),
  * deletes drop at the live join, and the segment threshold triggers a
  * retrain+rewrite swapped in via the CAS. PQ is approximate, so the
  * contract asserts exact-by-construction facts (a vector equal to the
  * query must surface at rank 1 with cosine 1) and recall floors, not
  * blanket brute-force equality.
  */
class IvfPqIndexDmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog() =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-wh-pq").toString)

  private def vec(i: Long, dim: Int = 8): Seq[Double] =
    (0 until dim).map { d =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v:$i:$d".getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(h).getInt() / Int.MaxValue.toDouble
    }

  private def mkTable(cat: Catalog, name: String, n: Long): GraftTable = {
    val t = GraftTable.create(spark, cat, name, Seq(
      ColumnDef("id", "bigint"), ColumnDef("emb", "array<double>")))
    t.insert((0L until n).map(i => (i, vec(i))).toDF("id", "emb"))
    t
  }

  private def bruteTopK(t: GraftTable, q: Seq[Double], k: Int): Seq[Long] = {
    import graft.functions.VectorFunctions
    t.read()
      .withColumn("s", VectorFunctions.cosineSimilarity(col("emb"),
        VectorFunctions.vectorLit(q)))
      .orderBy(col("s").desc, col("id")).limit(k)
      .select("id").as[Long].collect().toSeq
  }

  private def recallAt(t: GraftTable, got: Seq[Long], q: Seq[Double], k: Int): Double =
    got.toSet.intersect(bruteTopK(t, q, k).toSet).size.toDouble / k

  test("insert after createIvfPqIndex: new rows searchable without retrain") {
    val cat = freshCatalog()
    val t = mkTable(cat, "pq1", 200L)
    t.createIvfPqIndex("e", "emb", "id", cells = 4, pqM = 4, pqKs = 16)
    assert(t.meta.indexes.head.indexedThrough == t.currentVersion)
    val modelBefore = graft.operators.Pq.loadModel(spark,
      s"${t.meta.indexes.head.path}/model")
    t.insert((200L until 260L).map(i => (i, vec(i))).toDF("id", "emb"))
    assert(t.meta.indexes.head.indexedThrough == t.currentVersion)
    // appends never retrain: model bytes identical
    val modelAfter = graft.operators.Pq.loadModel(spark,
      s"${t.meta.indexes.head.path}/model")
    assert(modelBefore.coarse.map(_.toSeq).toSeq ==
      modelAfter.coarse.map(_.toSeq).toSeq)
    // a NEW row queried by its own vector is exact-by-construction rank 1
    val q = vec(233L)
    val got = t.searchIndex("e", q, 10)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    assert(got.head._1 == 233L && math.abs(got.head._2 - 1.0) < 1e-9)
    assert(recallAt(t, got.map(_._1), q, 10) >= 0.7)
  }

  test("update of the embedding ranks the row by its NEW vector") {
    val cat = freshCatalog()
    val t = mkTable(cat, "pq2", 150L)
    t.createIvfPqIndex("e", "emb", "id", cells = 4, pqM = 4, pqKs = 16)
    val target = vec(7777L)
    t.batchUpdate(Seq((42L, target)).toDF("id", "emb"), Seq("id"))
    val got = t.searchIndex("e", target, 5)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    assert(got.head._1 == 42L, s"expected updated row first, got $got")
    assert(math.abs(got.head._2 - 1.0) < 1e-9)
    // no ghost second entry for the same id from the stale code segment
    assert(got.map(_._1).distinct == got.map(_._1))
  }

  test("deleted rows never come back; escalation still fills k from live rows") {
    val cat = freshCatalog()
    val t = mkTable(cat, "pq3", 120L)
    t.createIvfPqIndex("e", "emb", "id", cells = 4, pqM = 4, pqKs = 16)
    t.delete("id % 2 = 0") // half the corpus is gone
    val q = vec(31L) // an odd id's own vector: still live
    val got = t.searchIndex("e", q, 10).select("vec_id").as[Long].collect().toSeq
    assert(got.nonEmpty && got.head == 31L)
    assert(got.forall(_ % 2 == 1), s"deleted ids resurfaced: $got")
    assert(got.size == 10) // escalating over-fetch filled k from live rows
  }

  test("segment threshold: retrain + rewrite swaps in a fresh dir via CAS") {
    val cat = freshCatalog()
    val t = mkTable(cat, "pq4", 80L)
    t.createIvfPqIndex("e", "emb", "id", cells = 4, pqM = 4, pqKs = 16,
      segmentThreshold = 3)
    val path0 = t.meta.indexes.head.path
    var next = 80L
    for (_ <- 0 until 4) { // 4 appends blow through threshold 3
      t.insert(Seq((next, vec(next))).toDF("id", "emb"))
      next += 1
    }
    val ixAfter = t.meta.indexes.head
    assert(ixAfter.path != path0, "threshold rebuild did not swap the dir")
    assert(ixAfter.path.contains("@v"))
    // search stays correct through the swap
    val q = vec(82L)
    val got = t.searchIndex("e", q, 5)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    assert(got.head._1 == 82L && math.abs(got.head._2 - 1.0) < 1e-9)
    assert(recallAt(t, got.map(_._1), q, 5) >= 0.6)
  }
}
