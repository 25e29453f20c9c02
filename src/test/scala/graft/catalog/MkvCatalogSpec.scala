package graft.catalog

import graft.TestSpark
import graft.functions.{Avi, Mkv, Ogg, Video}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 interaction audits: the new container families against the
  * catalog/DML layer (VERDICT r11 task 8 continued):
  *  - Matroska subtitle tracks as an incrementally-maintained COMPONENT
  *    VIEW (the q180 cue surface × the q86 view machinery), surviving
  *    base compaction and cascading deletes;
  *  - `containerMetadata` as a stored computed column over a MIXED
  *    corpus (MKV + OGG + MP4-family payloads), backfilled on add,
  *    recomputed by batch update, and visible in the change feed.
  */
class MkvCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jpeg(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def mkv(id: Long, n: Int): Array[Byte] =
    Mkv.write(Seq(jpeg()), 8, 6, 2,
      subtitles = (0 until n).map(i =>
        (i * 2.0, i * 2.0 + 1.5, s"clip $id cue $i")))

  test("mkv subtitle cues drive a component view across compaction") {
    spark.udf.register("mkv_cues", udf { (b: Array[Byte]) =>
      Mkv.readSubtitles(b).map { case (s, e, t) => (s, e, t) }
    })
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-mkvcue").toString)
    val base = GraftTable.create(spark, cat, "clips", Seq(
      ColumnDef("clip_id", "bigint"), ColumnDef("v", "binary")))
    base.insert(Seq((1L, mkv(1, 3)), (2L, mkv(2, 2))).toDF("clip_id", "v"))
    val cueType = "struct<_1:double,_2:double,_3:string>"
    val iterExpr = "mkv_cues(v)"
    val view = Views.createComponentView(spark, cat, "clip_cues", base,
      iterExpr, "cue", cueType,
      keepCols = Seq(ColumnDef("clip_id", "bigint")))
    assert(view.read().count() == 5)
    val texts = view.read().select(col("clip_id"), col("cue._3"))
      .orderBy("clip_id", "_pos").as[(Long, String)].collect()
    assert(texts.map(_._2).toSeq == Seq(
      "clip 1 cue 0", "clip 1 cue 1", "clip 1 cue 2",
      "clip 2 cue 0", "clip 2 cue 1"))

    // later insert expands incrementally
    base.insert(Seq((3L, mkv(3, 4))).toDF("clip_id", "v"))
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

  test("containerMetadata computed column over a mixed mkv/ogg corpus") {
    spark.udf.register("container_meta",
      graft.functions.Multimedia.containerMetadata)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-metacol").toString)
    val t = GraftTable.create(spark, cat, "media", Seq(
      ColumnDef("media_id", "bigint"), ColumnDef("payload", "binary")),
      primaryKey = Seq("media_id"))
    t.insert(Seq(
      (1L, mkv(1, 2)),
      (2L, Ogg.writeTestOgg("opus", 1, 48000, 3, 960)),
      (3L, Video.makeTestVideo(2, 8, 6, 0x333333, 5))).toDF("media_id", "payload"))
    val v0 = t.currentVersion

    // computed column backfills over the mixed corpus on add
    val metaType = org.apache.spark.sql.Encoders
      .product[graft.functions.Multimedia.ContainerMeta].schema.catalogString
    t.addColumn(ColumnDef("meta", metaType,
      computedExpr = Some("container_meta(payload)")))
    val fmts0 = t.read().select(col("media_id"), col("meta.format"))
      .as[(Long, String)].collect().toMap
    assert(fmts0 == Map(1L -> "MKV", 2L -> "OGG", 3L -> "AVI"))

    // batch update rewriting a payload recomputes the metadata
    t.batchUpdate(Seq((1L, Mkv.write(Seq(jpeg()), 8, 6, 2,
      docType = "webm"))).toDF("media_id", "payload"), Seq("media_id"))
    val fmts1 = t.read().select(col("media_id"), col("meta.format"))
      .as[(Long, String)].collect().toMap
    assert(fmts1(1L) == "WEBM" && fmts1(2L) == "OGG")

    // the change feed carries the recomputed column
    val feed = t.changeFeed(v0)
    val post = feed.filter(col("_change_type") === "update_postimage")
      .select(col("meta.format")).as[String].collect()
    assert(post.toSeq == Seq("WEBM"))

    // inserts after the add compute at write time
    t.insert(Seq((4L, Ogg.writeTestOgg("vorbis", 2, 16000, 2, 800)))
      .toDF("media_id", "payload"))
    val s4 = t.read().filter(col("media_id") === 4)
      .select(col("meta.streams")(0)("codec_context")("name"))
      .as[String].collect()
    assert(s4.toSeq == Seq("vorbis"))
  }
}
