package graft.ml

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based pins for the r8 model-free kernels — invariants that
  * must hold on ARBITRARY inputs, complementing the hand-computed oracle
  * branches (q136/q138/q139/q141):
  *  - SamAuto: stability ∈ [0,1], maskIou symmetric/bounded, NMS output
  *    pairwise below threshold and score-sorted, filter monotone in the
  *    thresholds;
  *  - MaskTrack: per-frame ids unique, ids nonnegative and bounded by
  *    the total detection count, identical frames keep identical ids;
  *  - Ctc: decode idempotent-on-own-output (no blanks, no adjacent
  *    repeats survive), blank-free monotone subsequence of the input.
  */
object KernelPropertySpec extends Properties("kernels") {

  private val genLogits: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](16, Gen.chooseNum(-4f, 4f))
  private val genMask: Gen[Array[Boolean]] =
    Gen.containerOfN[Array, Boolean](16, Gen.oneOf(true, false))

  property("stabilityScore in [0,1]") = Prop.forAll(genLogits) { lg =>
    val s = SamAuto.stabilityScore(lg, 1.0f)
    s >= 0f && s <= 1f
  }

  property("maskIou symmetric, bounded, reflexive") =
    Prop.forAll(genMask, genMask) { (a, b) =>
      val ab = SamAuto.maskIou(a, b)
      ab == SamAuto.maskIou(b, a) && ab >= 0f && ab <= 1f &&
        (!a.exists(identity) || SamAuto.maskIou(a, a) == 1f)
    }

  property("filterAndNms: kept pairwise IoU <= threshold, scores sorted, all pass filters") =
    Prop.forAll(Gen.listOfN(6, Gen.zip(Gen.chooseNum(0f, 1f), genLogits))) { cands =>
      val thresh = 0.5f
      val kept = SamAuto.filterAndNms(cands, predIouThresh = 0.4f,
        stabilityThresh = 0.3f, stabilityOffset = 1.0f, nmsIouThresh = thresh)
      val scoresSorted = kept.map(_._1) == kept.map(_._1).sortBy(-_)
      val pairwiseOk = kept.map(_._2).combinations(2).forall {
        case Seq(a, b) => SamAuto.maskIou(a, b) <= thresh
      }
      val filtersOk = kept.forall(_._1 >= 0.4f)
      scoresSorted && pairwiseOk && filtersOk
    }

  property("filterAndNms monotone: raising predIou never keeps more") =
    Prop.forAll(Gen.listOfN(6, Gen.zip(Gen.chooseNum(0f, 1f), genLogits))) { cands =>
      val lo = SamAuto.filterAndNms(cands, 0.2f, 0.0f, 1.0f, 0.7f)
      val hi = SamAuto.filterAndNms(cands, 0.6f, 0.0f, 1.0f, 0.7f)
      hi.size <= lo.size
    }

  private val genFrame: Gen[Seq[Array[Boolean]]] =
    Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, genMask).map(_.toSeq))

  property("trackSequence: ids unique per frame, nonnegative, bounded") =
    Prop.forAll(Gen.listOfN(5, genFrame)) { frames =>
      val ids = MaskTrack.trackSequence(frames, iouThresh = 0.5f, maxAge = 1)
      val total = frames.map(_.size).sum
      ids.zip(frames).forall { case (fi, dets) => fi.size == dets.size } &&
        ids.forall(fi => fi.distinct.size == fi.size) &&
        ids.flatten.forall(id => id >= 0 && id < math.max(total, 1))
    }

  property("trackSequence: identical frames keep identical ids") =
    Prop.forAll(genFrame) { dets =>
      val ids = MaskTrack.trackSequence(Seq.fill(4)(dets), 0.5f, maxAge = 1)
      // frame 0's assignment repeats verbatim: every mask matches itself
      // at IoU 1.0 ≥ threshold (empty masks never match — they open a
      // fresh id each frame, so restrict to frames of non-empty masks)
      dets.exists(!_.exists(identity)) ||
        ids.forall(_ == ids.head)
    }

  private val genIds: Gen[Seq[Int]] =
    Gen.listOf(Gen.chooseNum(0, 4)).map(_.toSeq)

  property("ctc decode: no blanks; blank-interleaving preserves every token") =
    Prop.forAll(genIds) { ids =>
      val out = Ctc.decode(ids, blank = 0)
      val noBlank = !out.contains(0)
      // a blank after every frame stops ALL collapsing — the alignment
      // distinction ("aa" vs "a·a"); note decode is deliberately NOT
      // idempotent: its output may carry adjacent repeats that a second
      // pass would wrongly merge
      val preserved = Ctc.decode(ids.flatMap(t => Seq(t, 0)), blank = 0) ==
        ids.filter(_ != 0)
      noBlank && preserved
    }

  property("ctc decode: subsequence of the blank-free input") =
    Prop.forAll(genIds) { ids =>
      val out = Ctc.decode(ids, blank = 0)
      // every decoded token appears in order within the input
      val it = ids.iterator
      out.forall(tok => it.contains(tok))
    }

  property("whisper fallback: no-speech override wins; NaN disables") =
    Prop.forAll(Gen.chooseNum(-3.0, 0.0), Gen.chooseNum(0.0, 5.0),
      Gen.chooseNum(0.61, 1.0)) { (alp, cr, nsp) =>
      !WhisperQuality.needsFallback(alp, cr, nsp) &&
        !WhisperQuality.needsFallback(alp, cr, 0.0,
          compressionRatioThreshold = Double.NaN,
          logprobThreshold = Double.NaN)
    }

  property("acceptedRung within range and minimal") =
    Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(-3.0, 0.0), Gen.chooseNum(0.0, 5.0),
        Gen.chooseNum(0.0, 1.0)))) { rungs0 =>
      val rungs = rungs0.toSeq
      val r = WhisperQuality.acceptedRung(rungs)
      val inRange = r >= 0 && r < rungs.size
      val earlierAllFallback = rungs.take(r).forall { case (a, c, n) =>
        WhisperQuality.needsFallback(a, c, n)
      }
      inRange && earlierAllFallback
    }
}
