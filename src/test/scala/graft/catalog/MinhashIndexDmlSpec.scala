package graft.catalog

import graft.TestSpark
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DML-maintained MinHash-LSH near-dup index: the incremental path of
  * `Dedup.nearDuplicatePairs`. Contract through the full lifecycle:
  *
  *  - the index's verified pairs EQUAL the batch operator's on the live
  *    image (same hash family by construction — the differential oracle);
  *  - inserts sign only their own rows (segment append, no re-sign);
  *  - updates re-rank by NEW text (stale segment rows only donate
  *    candidates; exact verify kills them), deletes drop at the live join;
  *  - an incoming batch probes the corpus without re-signing it;
  *  - the segment-threshold rebuild stays correct.
  */
class MinhashIndexDmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-mh").toString)

  // group g docs share a text; group words are long repeated letters so
  // cross-group char-trigram Jaccard stays far below the 0.9 threshold
  private def text(g: Long): String = {
    val w = "wxyz".charAt((g % 4).toInt).toString * 6
    s"$w aa $w bb $w cc $w dd $w ee"
  }

  private def mk(cat: Catalog, name: String, n: Long, groups: Long): GraftTable = {
    val t = GraftTable.create(spark, cat, name, Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert((0L until n).map(i => (i, text(i % groups))).toDF("id", "body"))
    t
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("_ida"), col("_idb")).as[(Long, Long)].collect().toSet

  private def batchPairs(t: GraftTable): Set[(Long, Long)] =
    pairSet(Dedup.nearDuplicatePairs(t.read(), "body", "id",
      jaccardThreshold = 0.9, numHashes = 8, bands = 2, shingleSize = 3))

  test("index pairs equal the batch operator across insert/update/delete") {
    val cat = newCat()
    val t = mk(cat, "mh1", 12L, 4L) // groups of 3
    t.createMinhashIndex("nd", "body", "id")
    def idx() = pairSet(t.indexNearDupPairs("nd", 0.9))
    // 4 groups × C(3,2) = 12 pairs
    assert(idx().size == 12 && idx() == batchPairs(t))

    // insert: new member of group 0 — signed incrementally, pairs grow
    t.insert(Seq((100L, text(0))).toDF("id", "body"))
    assert(idx().contains((0L, 100L)) && idx() == batchPairs(t))

    // update: id=1 (group 1) moves to group 0's text — new pairs by NEW
    // text, old group-1 pairs involving id=1 disappear
    t.batchUpdate(Seq((1L, text(0))).toDF("id", "body"), Seq("id"))
    val p = idx()
    assert(p.contains((0L, 1L)) && !p.contains((1L, 5L)), s"$p")
    assert(p == batchPairs(t))

    // delete: id=0's pairs vanish
    t.delete("id = 0")
    val p2 = idx()
    assert(!p2.exists(e => e._1 == 0L || e._2 == 0L))
    assert(p2 == batchPairs(t))
  }

  test("searchNearDups probes the corpus without re-signing it") {
    val cat = newCat()
    val t = mk(cat, "mh2", 9L, 3L)
    t.createMinhashIndex("nd", "body", "id")
    val incoming = Seq((1000L, text(1)), (2000L, "completely unrelated text"))
      .toDF("doc_id", "txt")
    val hits = t.searchNearDups("nd", incoming, "txt", "doc_id", 0.9)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    // query 1000 matches exactly group 1's live members (ids 1, 4, 7)
    assert(hits == Set((1000L, 1L), (1000L, 4L), (1000L, 7L)), s"$hits")
  }

  test("segment-threshold rebuild drops ghosts and stays correct") {
    val cat = newCat()
    val t = mk(cat, "mh3", 6L, 2L)
    t.createMinhashIndex("nd", "body", "id", segmentThreshold = 2)
    // force appends past the threshold: each insert adds a segment
    (0 until 4).foreach(k =>
      t.insert(Seq((200L + k, text(k % 2))).toDF("id", "body")))
    t.delete("id = 0")
    val p = pairSet(t.indexNearDupPairs("nd", 0.9))
    assert(p == batchPairs(t))
    // rebuild swapped the path: exactly one live segment dir again
    val ix = t.meta.indexes.find(_.name == "nd").get
    val segDirs = Option(new java.io.File(s"${ix.path}/sigs").listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("seg-"))).getOrElse(0)
    assert(segDirs == 1, s"expected rebuilt single segment, got $segDirs")
  }

  test("vector searchIndex refuses a minhash index; drop removes its dirs") {
    val cat = newCat()
    val t = mk(cat, "mh4", 4L, 2L)
    t.createMinhashIndex("nd", "body", "id")
    intercept[IllegalArgumentException] { t.searchIndex("nd", Seq(1.0, 0.0), 1) }
    t.dropIndex("nd")
    intercept[IllegalArgumentException] { t.indexNearDupPairs("nd", 0.9) }
  }
}
