package graft.streaming

import graft.TestSpark
import graft.catalog.{Catalog, ColumnDef, GraftTable, Views}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit: streaming ingest × DML-maintained indexes — the
  * crawl-ingest pipeline end to end. `foreachBatchInto` lands micro-batches
  * as table versions, which means index maintenance runs INSIDE each batch
  * insert (the same `maintainIndexes` hook as batch DML) — so the minhash
  * near-dup index is already current when the next batch probes it with
  * `searchNearDups`, with no rebuild step anywhere in the loop.
  */
class StreamIndexIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def text(g: Int): String = {
    val w = "wxyz".charAt(g).toString * 6
    s"$w aa $w bb $w cc $w dd $w ee"
  }

  test("streamed micro-batches maintain the minhash index; next batch probes it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sidx").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-sidx-cp").toString
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-sidx-wh").toString)
    val t = GraftTable.create(spark, cat, "crawl", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert(Seq((0L, text(0)), (1L, text(1))).toDF("id", "body"))
    t.createMinhashIndex("nd", "body", "id")

    // drop 1: two docs — a dup of group 0 and a fresh group 2
    Seq((10L, text(0)), (11L, text(2))).toDF("id", "body")
      .write.mode("overwrite").parquet(dir)
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("id bigint, body string")
    Streaming.foreachBatchInto(Streaming.fileStream(spark, dir, schema), t, cp)
      .awaitTermination(60000)
    assert(t.read().count() == 4)
    // the STREAMED rows were signed by in-insert maintenance: the index
    // already knows 10 is a dup of 0 — no manual refresh ran
    val pairs = t.indexNearDupPairs("nd", 0.9)
      .select("_ida", "_idb").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 10L)))

    // drop 2 arrives: dedup-BEFORE-ingest probes the corpus via the index
    val drop2 = Seq((20L, text(2)), (21L, text(3))).toDF("id", "body")
    val hits = t.searchNearDups("nd", drop2, "body", "id", 0.9)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((20L, 11L))) // 20 duplicates streamed doc 11
    // ingest only the novel rows — the loop a crawl pipeline runs
    val dupIds = hits.map(_._1)
    t.insert(drop2.filter(!col("id").isin(dupIds.toSeq: _*)))
    assert(t.read().count() == 5)
    // the whole lifecycle still matches the batch operator
    val batch = Dedup.nearDuplicatePairs(t.read(), "body", "id",
        jaccardThreshold = 0.9, numHashes = 8, bands = 2, shingleSize = 3)
      .as[(Long, Long)].collect().toSet
    assert(t.indexNearDupPairs("nd", 0.9)
      .select("_ida", "_idb").as[(Long, Long)].collect().toSet == batch)
  }

  test("streamed batches sync an incremental view AND the index in one loop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sidx2").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-sidx2-cp").toString
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-sidx2-wh").toString)
    val t = GraftTable.create(spark, cat, "crawl2", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert(Seq((0L, text(0))).toDF("id", "body"))
    t.createMinhashIndex("nd", "body", "id")
    val view = Views.createComponentView(spark, cat, "crawl2_tok", t,
      "split(body, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
    assert(view.read().count() == 10) // 10 tokens per doc

    Seq((1L, text(0)), (2L, text(1))).toDF("id", "body")
      .write.mode("overwrite").parquet(dir)
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("id bigint, body string")
    Streaming.foreachBatchInto(Streaming.fileStream(spark, dir, schema), t, cp)
      .awaitTermination(60000)
    // index current without refresh; view catches up incrementally
    assert(t.indexNearDupPairs("nd", 0.9)
      .select("_ida", "_idb").as[(Long, Long)].collect().toSet == Set((0L, 1L)))
    val st = Views.syncComponentViewStatus(view, t,
      "split(body, '\\\\s+')", "token", Seq("id"))
    assert(st.rowsInserted == 20 && st.rowsDeleted == 0, s"$st")
    assert(view.read().count() == 30)
  }
}
