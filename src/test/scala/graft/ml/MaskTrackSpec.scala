package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the cross-frame mask association kernel (the tracking half of
  * the reference's sam3_for_video_segmentation, huggingface.py:680-860):
  * greedy IoU assignment, occlusion/reacquire through the lost buffer,
  * retirement past maxAge, deterministic tie-breaks — against
  * hand-computed values (independently re-encoded as q138's oracle) —
  * plus the end-to-end samVideoSegmentation surface on the tiny SAM
  * checkpoint.
  */
class MaskTrackSpec extends AnyFunSuite {

  private def band(r0: Int, r1: Int): Array[Boolean] =
    Array.tabulate(64)(i => i / 8 >= r0 && i / 8 < r1)

  test("greedy step: best-IoU one-to-one, new ids in detection order") {
    val t0 = MaskTrack.step(Nil, Seq(band(0, 3), band(5, 8)),
      iouThresh = 0.4f, maxAge = 2, nextId = 0)
    assert(t0.ids == Seq(0, 1) && t0.nextId == 2)
    // both detections overlap track 0; the higher-IoU one takes the id,
    // the other opens a fresh track
    val t1 = MaskTrack.step(t0.tracks, Seq(band(0, 2), band(0, 3)),
      iouThresh = 0.1f, maxAge = 2, nextId = t0.nextId)
    // IoU(band(0,3), band(0,3)) = 1.0 beats IoU(band(0,3), band(0,2)) = 2/3
    assert(t1.ids == Seq(2, 0))
  }

  test("occlusion: a lost track reacquires its id within maxAge, retires after") {
    val f0 = Seq(band(0, 3), band(5, 8))
    val gone = Seq(band(0, 3))
    // missing 2 frames with maxAge = 2 → reacquired
    val seq1 = MaskTrack.trackSequence(
      Seq(f0, gone, gone, Seq(band(0, 3), band(5, 8))),
      iouThresh = 0.4f, maxAge = 2)
    assert(seq1 == Seq(Seq(0, 1), Seq(0), Seq(0), Seq(0, 1)))
    // missing 3 frames with maxAge = 2 → retired; reappearance = NEW id
    val seq2 = MaskTrack.trackSequence(
      Seq(f0, gone, gone, gone, Seq(band(0, 3), band(5, 8))),
      iouThresh = 0.4f, maxAge = 2)
    assert(seq2 == Seq(Seq(0, 1), Seq(0), Seq(0), Seq(0), Seq(0, 2)))
  }

  test("the q138 branch matrix (hand-computed)") {
    def run(m: Int): Seq[Seq[Int]] = {
      val a = Seq(band(0, 3), band(1, 4), band(2, 5), band(3, 6))
      val b = band(5, 8)
      val c = band(0, 2)
      MaskTrack.trackSequence(Seq(
        Seq(a(0), b),
        if (m == 1) Seq(a(1)) else Seq(a(1), b),
        Seq(a(2), b) ++ (if (m == 2) Seq(c) else Nil),
        Seq(a(3), b) ++ (if (m == 2) Seq(c) else Nil)),
        iouThresh = 0.4f, maxAge = 2)
    }
    // m=0: drift at IoU 0.5 per step holds both ids
    assert(run(0) == Seq(Seq(0, 1), Seq(0, 1), Seq(0, 1), Seq(0, 1)))
    // m=1: B occluded one frame, reacquires id 1
    assert(run(1) == Seq(Seq(0, 1), Seq(0), Seq(0, 1), Seq(0, 1)))
    // m=2: entering object opens id 2 (0.25 IoU vs the drifting band
    // stays under the 0.4 gate)
    assert(run(2) == Seq(Seq(0, 1), Seq(0, 1), Seq(0, 1, 2), Seq(0, 1, 2)))
  }

  test("samVideoSegmentation: per-frame rows, aligned arrays, ids stable") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = LocalModels.ensureTinySamModel(seed = 42L)
    // 4 near-identical frames: the same detections per frame should hold
    // the same ids throughout
    val vid = graft.functions.Video.makeTestVideo(4, 20, 16, 0x336699, 10)
    val df = Seq((1L, vid), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("vid_id", "v")
    val out = LocalModels.samVideoSegmentation(df, "v", "seg", dir,
      gridSize = 2, maxFrames = 3)
    val rows = out.collect().map(r => r.getLong(0) -> r.get(2)).toMap
    assert(rows(2L) == null)
    val frames =
      rows(1L).asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(frames.length == 3) // maxFrames honored
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.getInt(0) == i)
      val ids = f.getSeq[Int](1)
      assert(ids.length == f.getSeq[Float](2).length &&
        ids.length == f.getSeq[Seq[Float]](3).length &&
        ids.length == f.getSeq[Any](4).length)
      assert(ids.distinct.length == ids.length) // one id per object
    }
    // identical frames → identical detections → stable ids across frames
    val idSets = frames.map(_.getSeq[Int](1).toSet)
    assert(idSets.forall(_ == idSets.head))
  }

  test("reference workflow: tracked component view → id-map overlay → make_video") {
    // huggingface.py:733-745's documented example: create_view(iterator=
    // sam3_for_video_segmentation(...)), overlay_segmentation keyed by
    // object_ids (consistent colors per object), make_video group_by video
    val spark = graft.TestSpark.spark
    import graft.catalog.{Catalog, ColumnDef, GraftTable, Views}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = LocalModels.ensureTinySamModel(seed = 42L)
    spark.udf.register("sam_video_track",
      LocalModels.samVideoTrackUdf(dir, gridSize = 2, maxFrames = 4))
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val base = GraftTable.create(spark, cat, "videos", Seq(
      ColumnDef("vid_id", "bigint"), ColumnDef("v", "binary")))
    base.insert(Seq(
      (1L, graft.functions.Video.makeTestVideo(4, 20, 16, 0x336699, 10)))
      .toDF("vid_id", "v"))

    val tfType = "struct<frame_idx:int,object_ids:array<int>," +
      "scores:array<float>,boxes:array<array<float>>," +
      "masks:array<array<array<boolean>>>>"
    val view = Views.createComponentView(spark, cat, "tracked", base,
      "sam_video_track(v)", "tf", tfType,
      keepCols = Seq(ColumnDef("vid_id", "bigint")))
    assert(view.read().count() == 4) // one row per tracked frame

    // id map: paint object_id + 1 per mask (0 = background) — the
    // overlay_segmentation contract with consistent per-object coloring
    val idMap = udf { (masks: Seq[Seq[Seq[Boolean]]], ids: Seq[Int]) =>
      val h = masks.head.length; val w = masks.head.head.length
      val m = Array.fill(h, w)(0)
      for (((mask, id), _) <- masks.zip(ids).zipWithIndex; y <- 0 until h;
           x <- 0 until w if mask(y)(x)) m(y)(x) = id + 1
      m.map(_.toSeq).toSeq
    }
    val frames = udf { (v: Array[Byte], i: Int) =>
      graft.functions.Avi.readFrames(v)(i)
    }
    val overlaid = view.read()
      .join(base.read().select(col("vid_id"), col("v")), Seq("vid_id"))
      .withColumn("frame", frames(col("v"), col("tf.frame_idx")))
      .withColumn("overlay", graft.functions.Vision.overlaySegmentation(
        col("frame"), idMap(col("tf.masks"), col("tf.object_ids")),
        lit(0.5), lit(false), lit(1)))
    val out = overlaid.groupBy(col("vid_id"))
      .agg(graft.functions.Video.make_video(
        col("tf.frame_idx"), col("overlay")).as("annotated"))
      .head().getAs[Array[Byte]](1)
    val meta = graft.functions.Avi.readMeta(out)
    assert(meta.frames == 4 && meta.width == 20 && meta.height == 16)
  }
}
