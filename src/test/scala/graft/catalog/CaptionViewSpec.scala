package graft.catalog

import graft.TestSpark
import graft.functions.{Mp3, Mp4, Subtitles}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audits for the round-11 media surfaces against the
  * catalog/DML layer:
  *  - caption documents (SRT binary column) as an incrementally-
  *    maintained COMPONENT VIEW of cues (the string_splitter-over-
  *    documents shape, cue-shaped), surviving base compaction and
  *    cascading deletes;
  *  - `mediaTags` as a computed column: backfill on add, recompute
  *    after a batch update rewrites the media payload.
  */
class CaptionViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def srt(id: Long, n: Int): Array[Byte] =
    Subtitles.formatSrt((0 until n).map(i =>
      (i * 2.0, i * 2.0 + 1.5, s"clip $id cue $i"))).getBytes("UTF-8")

  private val cueType = "struct<idx:int,start:double,end:double,text:string>"
  private val iterExpr = "cue_iter(decode(srt, 'UTF-8'))"

  test("caption cues drive an incrementally-maintained component view") {
    spark.udf.register("cue_iter", Subtitles.parseCues)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-cap").toString)
    val base = GraftTable.create(spark, cat, "clips", Seq(
      ColumnDef("clip_id", "bigint"), ColumnDef("srt", "binary")))
    base.insert(Seq((1L, srt(1, 3)), (2L, srt(2, 2))).toDF("clip_id", "srt"))
    val view = Views.createComponentView(spark, cat, "clip_cues", base,
      iterExpr, "cue", cueType,
      keepCols = Seq(ColumnDef("clip_id", "bigint")))
    assert(view.read().count() == 5)
    val cues = view.read()
      .select(col("clip_id"), col("cue.idx"), col("cue.start"), col("cue.text"))
      .orderBy("clip_id", "_pos").collect()
    assert(cues.map(_.getString(3)).toSeq == Seq(
      "clip 1 cue 0", "clip 1 cue 1", "clip 1 cue 2",
      "clip 2 cue 0", "clip 2 cue 1"))
    assert(cues.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 1, 2)) // SRT numbering
    assert(cues.map(_.getDouble(2)).toSeq == Seq(0.0, 2.0, 4.0, 0.0, 2.0))

    // later insert expands incrementally
    base.insert(Seq((3L, srt(3, 4))).toDF("clip_id", "srt"))
    val st = Views.syncComponentViewStatus(view, base, iterExpr, "cue",
      Seq("clip_id"))
    assert(st.rowsInserted == 4 && st.rowsDeleted == 0, s"$st")

    // base compaction between syncs is invisible
    base.compact(targetFiles = 1, clusterBy = Seq("clip_id"))
    val stNoop = Views.syncComponentViewStatus(view, base, iterExpr, "cue",
      Seq("clip_id"))
    assert(stNoop.rowsInserted == 0 && stNoop.rowsDeleted == 0, s"$stNoop")

    // base delete cascades
    base.delete("clip_id = 1")
    val stDel = Views.syncComponentViewStatus(view, base, iterExpr, "cue",
      Seq("clip_id"))
    assert(stDel.rowsDeleted == 3 && stDel.rowsInserted == 0, s"$stDel")
    assert(view.read().select("clip_id").distinct().as[Long].collect().toSet
      == Set(2L, 3L))
  }

  test("mediaTags computed column backfills and recomputes on update") {
    spark.udf.register("media_tags", graft.functions.Audio.mediaTags)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-tagcol").toString)
    def mp3(title: String) =
      Mp3.writeId3v2(Seq("title" -> title)) ++ Mp3.writeTestStream(Seq(80))
    val t = GraftTable.create(spark, cat, "media", Seq(
      ColumnDef("media_id", "bigint"), ColumnDef("payload", "binary")),
      primaryKey = Seq("media_id"))
    t.insert(Seq((1L, mp3("one")), (2L, mp3("two"))).toDF("media_id", "payload"))

    // computed column over existing rows backfills on add
    t.addColumn(ColumnDef("tags", "map<string,string>",
      computedExpr = Some("media_tags(payload)")))
    val titles0 = t.read().select(col("media_id"),
      element_at(col("tags"), "title")).as[(Long, String)].collect().toMap
    assert(titles0 == Map(1L -> "one", 2L -> "two"))

    // a batch update that rewrites the payload recomputes the tags
    t.batchUpdate(Seq((2L, mp3("two-v2"))).toDF("media_id", "payload"),
      Seq("media_id"))
    val titles1 = t.read().select(col("media_id"),
      element_at(col("tags"), "title")).as[(Long, String)].collect().toMap
    assert(titles1 == Map(1L -> "one", 2L -> "two-v2"))

    // inserts after the add compute the column at write time
    t.insert(Seq((3L, mp3("three"))).toDF("media_id", "payload"))
    val titles2 = t.read().select(col("media_id"),
      element_at(col("tags"), "title")).as[(Long, String)].collect().toMap
    assert(titles2(3L) == "three")
  }
}
