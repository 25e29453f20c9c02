package graft.catalog

import graft.TestSpark
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit (round 10, continued): the two index kinds added late
  * in the round crossed with the physical-layout and history ops they
  * must commute with — clustered compaction (rewrites every live file)
  * and revert (rolls version numbers BACK so later DML reuses them; the
  * index high-water clamp in `revert` is what these tests pin).
  */
class IndexMaintenanceInteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-ixmx").toString)

  private def text(g: Long): String = {
    val w = "wxyz".charAt((g % 4).toInt).toString * 6
    s"$w aa $w bb $w cc $w dd $w ee"
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("_ida"), col("_idb")).as[(Long, Long)].collect().toSet

  private def batchPairs(t: GraftTable): Set[(Long, Long)] =
    pairSet(Dedup.nearDuplicatePairs(t.read(), "body", "id",
      jaccardThreshold = 0.9, numHashes = 8, bands = 2, shingleSize = 3))

  test("minhash index survives clustered compaction; maintenance continues after it") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "mx1", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert((0L until 8L).map(i => (i, text(i % 4))).toDF("id", "body"))
    t.createMinhashIndex("nd", "body", "id")
    val before = pairSet(t.indexNearDupPairs("nd", 0.9))
    assert(before.size == 4) // 4 groups of 2

    // clustered rewrite of every live file: rowids/values byte-identical,
    // so the index's live join must reproduce the same pairs
    t.compact(targetFiles = 1, clusterBy = Seq("id"))
    assert(pairSet(t.indexNearDupPairs("nd", 0.9)) == before)
    assert(batchPairs(t) == before)

    // maintenance after the compact: only the new rows get signed, and
    // the new pairs appear
    t.insert(Seq((100L, text(0)), (101L, text(1))).toDF("id", "body"))
    val after = pairSet(t.indexNearDupPairs("nd", 0.9))
    assert(after.contains((0L, 100L)) && after.contains((1L, 101L)))
    assert(after == batchPairs(t))

    // compact again, then delete: pairs involving the deleted id vanish
    t.compact(targetFiles = 2, clusterBy = Seq("id"))
    t.delete("id = 0")
    val afterDel = pairSet(t.indexNearDupPairs("nd", 0.9))
    assert(!afterDel.exists(p => p._1 == 0L || p._2 == 0L))
    assert(afterDel == batchPairs(t))
  }

  test("minhash index across revert: ghosts drop, reused version numbers re-index") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "mx2", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert((0L until 6L).map(i => (i, text(i % 3))).toDF("id", "body"))
    t.createMinhashIndex("nd", "body", "id")
    val v1 = t.meta.currentVersion
    val base = pairSet(t.indexNearDupPairs("nd", 0.9))

    t.insert(Seq((50L, text(0)), (51L, text(1))).toDF("id", "body"))
    assert(pairSet(t.indexNearDupPairs("nd", 0.9)).contains((0L, 50L)))

    // revert: the batch-2 rows are gone; their signatures remain as
    // ghost segment rows but the live verify must drop them
    t.revert(v1)
    assert(pairSet(t.indexNearDupPairs("nd", 0.9)) == base)
    assert(batchPairs(t) == base)

    // post-revert insert REUSES the rolled-back version numbers — the
    // indexedThrough clamp must make maintenance sign these rows
    t.insert(Seq((60L, text(2))).toDF("id", "body"))
    val p = pairSet(t.indexNearDupPairs("nd", 0.9))
    assert(p.contains((2L, 60L)), s"post-revert insert not indexed: $p")
    assert(p == batchPairs(t))
  }

  private def vec(i: Long, dim: Int = 8): Seq[Double] =
    (0 until dim).map { d =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v:$i:$d".getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(h).getInt() / Int.MaxValue.toDouble
    }

  private def topIds(t: GraftTable, q: Seq[Double], k: Int): Seq[Long] =
    t.searchIndex("ann", q, k).select("vec_id").as[Long].collect().toSeq

  test("ivfpq index across revert and compaction: live re-rank tracks history") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "mx3", Seq(
      ColumnDef("id", "bigint"), ColumnDef("emb", "array<double>")))
    t.insert((0L until 24L).map(i => (i, vec(i))).toDF("id", "emb"))
    t.createIvfPqIndex("ann", "emb", "id", cells = 4, pqM = 4, pqKs = 8)
    val v1 = t.meta.currentVersion

    // batch 2 appends a code segment without retraining
    t.insert((100L until 108L).map(i => (i, vec(i))).toDF("id", "emb"))
    assert(topIds(t, vec(100L), 3).head == 100L,
      "exact-match query from batch 2 must re-rank to the top")

    // revert: batch-2 ids must vanish from results (stale codes are
    // candidates only; the live join drops them)
    t.revert(v1)
    val got = topIds(t, vec(100L), 5)
    assert(!got.exists(_ >= 100L), s"reverted ids still surface: $got")
    assert(topIds(t, vec(7L), 3).head == 7L)

    // clustered compact after the revert: search unchanged
    val pre = topIds(t, vec(7L), 5)
    t.compact(targetFiles = 1, clusterBy = Seq("id"))
    assert(topIds(t, vec(7L), 5) == pre)

    // post-revert insert reuses version numbers; clamp => searchable
    t.insert(Seq((200L, vec(200L))).toDF("id", "emb"))
    assert(topIds(t, vec(200L), 3).head == 200L,
      "post-revert insert must be indexed and found")

    // time travel to v1 still reads the original 24 rows
    assert(t.read(Some(v1)).count() == 24)
  }
}
