package graft.catalog

import graft.TestSpark
import graft.functions.{Audio, Video}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit: the r7 media iterators (video_splitter,
  * audio_splitter budget modes) as COMPONENT-VIEW iterators — the
  * reference's flagship use of these functions
  * (`create_view(segments, tbl, iterator=video_splitter(tbl.video,
  * duration=…))`, `functions/video/iterators.py:361`). Pins: the
  * one-to-many expansion lands as a versioned table keyed
  * (_base_rowid, _pos), later inserts expand INCREMENTALLY (only fresh
  * base rows), a no-change refresh is a no-op, and base deletes cascade
  * through sync.
  */
class MediaIteratorViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val segType = "struct<segment_start:double,segment_start_pts:bigint," +
    "segment_end:double,segment_end_pts:bigint,video_segment:binary>"

  test("video_splitter drives an incrementally-maintained component view") {
    spark.udf.register("video_segments", Video.videoSplitter)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val base = GraftTable.create(spark, cat, "vids", Seq(
      ColumnDef("vid_id", "bigint"), ColumnDef("v", "binary")))
    base.insert(Seq(
      (1L, Video.makeTestVideo(20, 16, 12, 0x112233, 10)), // → starts 0, 8, 16
      (2L, Video.makeTestVideo(10, 16, 12, 0x445566, 10)), // → starts 0, 8
    ).toDF("vid_id", "v"))

    val view = Views.createComponentView(spark, cat, "vid_segments", base,
      "video_segments(v, 1.2D, 0.4D, 0.0D)", "seg", segType,
      keepCols = Seq(ColumnDef("vid_id", "bigint")))
    val rows = view.read()
      .select(col("vid_id"), col("_pos"), col("seg.segment_start_pts"),
        col("seg.segment_end_pts"))
      .orderBy("vid_id", "_pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 0, 0L, 12L), (1L, 1, 8L, 20L), (1L, 2, 16L, 20L),
      (2L, 0, 0L, 10L), (2L, 1, 8L, 10L)))

    // refresh with nothing new: version unchanged
    val v0 = view.currentVersion
    Views.refreshComponentView(view, base, "video_segments(v, 1.2D, 0.4D, 0.0D)",
      "seg", Seq("vid_id"))
    assert(view.currentVersion == v0)

    // a later insert expands ONLY the fresh base row (one new view version)
    base.insert(Seq((3L, Video.makeTestVideo(16, 16, 12, 0x778899, 10)))
      .toDF("vid_id", "v"))
    Views.refreshComponentView(view, base, "video_segments(v, 1.2D, 0.4D, 0.0D)",
      "seg", Seq("vid_id"))
    assert(view.currentVersion == v0 + 1)
    val after = view.read().filter(col("vid_id") === 3)
      .select(col("seg.segment_start_pts")).as[Long].collect().sorted.toSeq
    assert(after == Seq(0L, 8L)) // 16 frames → starts 0, 8 (tail merged at 16)
    assert(view.read().count() == 7)

    // each emitted segment is a playable AVI (decode through the container)
    val metas = view.read().select(col("seg.video_segment")).collect()
      .map(r => graft.functions.Avi.readMeta(r.getAs[Array[Byte]](0)))
    assert(metas.forall(m => m.fps == 10.0 && m.frames > 0))

    // base delete cascades through sync: vid 1's segments disappear
    base.delete("vid_id = 1")
    Views.syncComponentView(view, base, "video_segments(v, 1.2D, 0.4D, 0.0D)",
      "seg", Seq("vid_id"))
    val left = view.read().select("vid_id").as[Long].collect().distinct.sorted
    assert(left.toSeq == Seq(2L, 3L))
  }

  test("audio_splitter budget mode drives a component view with silence-snapped rows") {
    spark.udf.register("audio_segments", Audio.audioSegments)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val base = GraftTable.create(spark, cat, "clips", Seq(
      ColumnDef("clip_id", "bigint"), ColumnDef("wav", "binary")))
    val (_, t1) = Audio.decodePcm(Audio.sineWav(1.0, 440.0))
    val (_, sil) = Audio.decodePcm(Audio.sineWav(0.3, 440.0, amplitude = 0.0))
    base.insert(Seq((1L, Audio.encodeWav(t1 ++ sil ++ t1))).toDF("clip_id", "wav"))

    val segT = "struct<segment_start:double,segment_end:double,audio_segment:binary>"
    val view = Views.createComponentView(spark, cat, "clip_segments", base,
      "audio_segments(wav, 1.5D, 0.0D, 0L, 0.01D, 0.2D, false)", "seg", segT,
      keepCols = Seq(ColumnDef("clip_id", "bigint")))
    val segs = view.read()
      .select(col("_pos"), col("seg.segment_start"), col("seg.segment_end"))
      .orderBy("_pos").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    // the 1.5 s budget snaps to the 1.0–1.3 silence end
    assert(segs.toSeq == Seq((0, 0.0, 1.3), (1, 1.3, 2.3)))
  }

  test("tile_iterator drives a component view through DML and revert") {
    import graft.functions.Images
    spark.udf.register("tile_grid", Images.tileIterator)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val base = GraftTable.create(spark, cat, "imgs", Seq(
      ColumnDef("img_id", "bigint"), ColumnDef("png", "binary")))
    base.insert(Seq(
      (1L, Images.solidPng(20, 14, 0x224466)), // 8×6 tiles, (2,2) overlap → 3×3
      (2L, Images.solidPng(8, 6, 0x665544)),   // exactly one tile
    ).toDF("img_id", "png"))

    val tileT = "struct<_1:int,_2:int,_3:int,_4:int,_5:int,_6:int,_7:binary>"
    val expr = "tile_grid(png, 8, 6, 2, 2)"
    val view = Views.createComponentView(spark, cat, "img_tiles", base,
      expr, "tile", tileT, keepCols = Seq(ColumnDef("img_id", "bigint")))
    def grid(id: Long): Seq[(Int, Int, Int, Int)] = view.read()
      .filter(col("img_id") === id)
      .select(col("tile._1"), col("tile._2"), col("tile._3"), col("tile._4"))
      .orderBy(col("tile._2"), col("tile._1")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    // 20 px wide / stride 6 → i ∈ 0..2; 14 px tall / stride 4 → j ∈ 0..2
    assert(grid(1).size == 9 && grid(1).head == ((0, 0, 0, 0)) &&
      grid(1).last == ((2, 2, 12, 8)))
    assert(grid(2) == Seq((0, 0, 0, 0)))
    // every emitted tile is exactly tile-size (the padding contract)
    val dims = view.read().select(col("tile._7")).collect()
      .map { r =>
        val img = Images.decode(r.getAs[Array[Byte]](0))
        (img.getWidth, img.getHeight)
      }
    assert(dims.forall(_ == ((8, 6))))

    // incremental insert expands only the fresh base row
    val v0 = view.currentVersion
    base.insert(Seq((3L, Images.solidPng(7, 5, 0x102030)))
      .toDF("img_id", "png"))
    Views.refreshComponentView(view, base, expr, "tile", Seq("img_id"))
    assert(view.currentVersion == v0 + 1)
    assert(grid(3) == Seq((0, 0, 0, 0)))
    assert(view.read().count() == 11)

    // base REVERT below the view's watermark: sync self-heals by rebuild
    // (the reference leaves revert × views broken; ViewsSpec pins the
    // general mechanism — this pins it for the media-iterator shape)
    base.revert(base.currentVersion - 1)
    Views.syncComponentView(view, base, expr, "tile", Seq("img_id"))
    assert(view.read().select("img_id").as[Long].collect().distinct.sorted
      .toSeq == Seq(1L, 2L))
    assert(view.read().count() == 10)
  }

  test("scene_detect drives a component view with closed-form scene rows") {
    import graft.functions.{SceneDetect, Video}
    spark.udf.register("scene_detect_content",
      SceneDetect.sceneDetectContentUdf)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val base = GraftTable.create(spark, cat, "clips2", Seq(
      ColumnDef("clip_id", "bigint"), ColumnDef("v", "binary")))
    // red×4 | cyan×3 | white×3 at 10 fps → cuts at frames 4 and 7
    base.insert(Seq(
      (1L, Video.makeBlockVideo(Seq(4, 3, 3),
        Seq(0xff0000, 0x00ffff, 0xffffff), 16, 12, 10)),
    ).toDF("clip_id", "v"))

    val sceneT = "struct<start_time:double,start_pts:bigint,duration:double>"
    val expr = "scene_detect_content(v, 15.0D, 2, false)"
    val view = Views.createComponentView(spark, cat, "clip_scenes", base,
      expr, "scene", sceneT, keepCols = Seq(ColumnDef("clip_id", "bigint")))
    val scenes = view.read()
      .select(col("_pos"), col("scene.start_pts"), col("scene.duration"))
      .orderBy("_pos").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(scenes.toSeq == Seq((0, 0L, 0.4), (1, 4L, 0.3)))

    // incremental insert: a one-block video yields a single full-span row
    base.insert(Seq((2L, Video.makeBlockVideo(Seq(5),
      Seq(0x336699), 16, 12, 10))).toDF("clip_id", "v"))
    Views.refreshComponentView(view, base, expr, "scene", Seq("clip_id"))
    val s2 = view.read().filter(col("clip_id") === 2)
      .select(col("scene.start_pts"), col("scene.duration")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(s2.toSeq == Seq((0L, 0.4))) // (nFrames-1)/fps, no-cut semantics
  }
}
