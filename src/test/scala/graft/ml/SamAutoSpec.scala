package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the model-free kernels of sam_automatic_mask_generation
  * (reference huggingface.py:557-620 → HF mask-generation pipeline →
  * SAM amg.py): point grid geometry, stability score, mask IoU, and the
  * filter + greedy-NMS chain — against hand-computed expected values
  * (independently re-encoded as q136's DuckDB oracle VALUES).
  */
class SamAutoSpec extends AnyFunSuite {

  test("pointGrid: half-cell offset, row-major, normalized") {
    assert(SamAuto.pointGrid(1) == Seq((0.5, 0.5)))
    val g2 = SamAuto.pointGrid(2)
    assert(g2 == Seq((0.25, 0.25), (0.75, 0.25), (0.25, 0.75), (0.75, 0.75)))
    val g4 = SamAuto.pointGrid(4)
    assert(g4.size == 16)
    assert(g4.head == (0.125, 0.125) && g4.last == (0.875, 0.875))
    // all points interior — never on the image border
    assert(g4.forall { case (x, y) => x > 0 && x < 1 && y > 0 && y < 1 })
  }

  test("stabilityScore: area ratio of the ±offset binarizations") {
    // 4 cells: logits 2.0 (counts in both), 0.5 (low only), -0.5, -2.0
    val lg = Array(2f, 0.5f, -0.5f, -2f)
    // hi = #(>1) = 1; lo = #(>-1) = 3 → 1/3
    assert(math.abs(SamAuto.stabilityScore(lg, 1.0f) - 1f / 3f) < 1e-6)
    // offset 0.4: hi = #(>0.4) = 2; lo = #(>-0.4) = 2 → 1.0
    assert(SamAuto.stabilityScore(lg, 0.4f) == 1.0f)
    // all below -offset → lo = 0 → 0 (filtered, no division)
    assert(SamAuto.stabilityScore(Array(-5f, -5f), 1.0f) == 0f)
  }

  test("maskIou: intersection over union on flat boolean masks") {
    val a = Array(true, true, true, false)
    val b = Array(false, true, true, true)
    assert(SamAuto.maskIou(a, b) == 0.5f) // inter 2, union 4
    assert(SamAuto.maskIou(a, a) == 1.0f)
    assert(SamAuto.maskIou(a, Array(false, false, false, false)) == 0f)
    assert(SamAuto.maskIou(Array.empty[Boolean], Array.empty[Boolean]) == 0f)
  }

  /** The q136 candidate family: 8×8 grid, full-width row bands. */
  private def band(r0: Int, r1: Int, softRow: Int = -1): Array[Float] =
    Array.tabulate(64) { i =>
      val r = i / 8
      if (r == softRow) 0.5f else if (r >= r0 && r < r1) 2f else -2f
    }
  private val j4 = Array.tabulate(64)(i => if (i < 21) 2f else -2f)

  private def run(m: Int): Seq[(Float, Array[Boolean])] =
    SamAuto.filterAndNms(
      Seq(
        (if (m == 1 || m == 3) 0.65f else 0.90f, band(0, 4)),
        (0.80f, band(0, 3, if (m == 3) 2 else -1)),
        (0.75f, band(5, 8, if (m == 2) 7 else -1)),
        (0.70f, band(0, 4)),
        (0.71f, j4)),
      predIouThresh = 0.7f, stabilityThresh = 0.9f,
      stabilityOffset = 1.0f, nmsIouThresh = 0.7f)

  test("filterAndNms: IoU gate, stability gate, greedy NMS (hand-computed)") {
    // m=0: all pass filters; j1 (IoU .75 vs j0) and j3 (1.0) suppressed;
    // j4 KEPT even though it overlaps j1 at .875 — j1 was itself dropped,
    // and a suppressed mask never suppresses (the greedy-NMS property)
    val m0 = run(0)
    assert(m0.map(_._1) == Seq(0.90f, 0.75f, 0.71f))
    assert(m0.map(_._2.count(identity)) == Seq(32, 24, 21))

    // m=1: the top candidate dies at the predicted-IoU gate (0.65 < 0.7);
    // j1 becomes top and now suppresses BOTH j4 (.875) and j3 (.75)
    val m1 = run(1)
    assert(m1.map(_._1) == Seq(0.80f, 0.75f))
    assert(m1.map(_._2.count(identity)) == Seq(24, 24))

    // m=2: j2 dies at the stability gate (16/24 = .667 < .9)
    val m2 = run(2)
    assert(m2.map(_._1) == Seq(0.90f, 0.71f))
    assert(m2.map(_._2.count(identity)) == Seq(32, 21))

    // m=3: j0 (IoU gate) and j1 (stability gate) both die; the three
    // survivors are mutually below the NMS threshold and all kept
    val m3 = run(3)
    assert(m3.map(_._1) == Seq(0.75f, 0.71f, 0.70f))
    assert(m3.map(_._2.count(identity)) == Seq(24, 21, 32))
  }

  test("automaticMasks end-to-end: scores descending, boxes bound masks, NMS holds") {
    val dir = LocalModels.ensureTinySamModel(seed = 42L)
    val bundle = LocalModels.loadSam(dir)
    val img = graft.functions.Images.decode(
      graft.functions.Images.texturedPng(24, 20, 123456L))
    val inst = bundle.model.automaticMasks(img, gridSize = 3,
      predIouThresh = 0.0f, stabilityThresh = 0.0f, nmsIouThresh = 0.7f)
    assert(inst.nonEmpty && inst.size <= 3 * 3 * (bundle.model.cfg.numMaskTokens - 1))
    assert(inst.map(_.score) == inst.map(_.score).sortBy(-_))
    inst.foreach { i =>
      assert(i.mask.length == img.getHeight && i.mask.head.length == img.getWidth)
      val ys = i.mask.zipWithIndex.filter(_._1.exists(identity)).map(_._2)
      if (ys.nonEmpty) {
        val xs = for (row <- i.mask; (v, x) <- row.zipWithIndex if v) yield x
        assert(i.box(0) <= xs.min && xs.max < i.box(2))
        assert(i.box(1) <= ys.min && ys.max < i.box(3))
      }
    }
  }
}
