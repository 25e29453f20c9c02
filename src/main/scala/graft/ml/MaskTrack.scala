package graft.ml

/** Cross-frame mask association for video segmentation — the tracking half
  * of the reference's `sam3_for_video_segmentation` iterator
  * (`/root/reference/pixeltable/functions/huggingface.py:680-860`): one row
  * per frame with a stable `object_id` per tracked object, preserved as
  * objects move, are occluded, and reappear.
  *
  * The reference delegates tracking to gated SAM 3's learned memory
  * attention (a documented cut, same basis as COVERAGE's SAM adjudication:
  * the repo implements the public SAM checkpoint family). The association
  * here is the classical greedy mask-IoU tracker (the SORT family's
  * assignment step with masks instead of Kalman boxes): per frame, match
  * detections to live-or-recently-lost tracks by descending IoU above a
  * threshold, one-to-one; unmatched detections open new ids; unmatched
  * tracks age and are retired after `maxAge` missed frames — so an object
  * occluded for ≤ maxAge frames reacquires its id on reappearance.
  *
  * Deterministic by construction: candidate pairs sort by
  * (−IoU, track id, detection index) and new ids are assigned in detection
  * order, so the same frames always yield the same ids — which is what
  * lets q138 gate this kernel against closed-form oracle rows.
  */
object MaskTrack {

  /** A live track: last matched mask, and how many frames ago (0 = this
    * frame). Tracks with `age > 0` are "lost" but still match.
    */
  final case class Track(id: Int, mask: Array[Boolean], age: Int)

  final case class StepResult(ids: Seq[Int], tracks: Seq[Track], nextId: Int)

  /** One frame of association. Returns the object id assigned to each
    * detection (aligned with `dets`), the updated track set, and the next
    * fresh id.
    */
  def step(tracks: Seq[Track], dets: Seq[Array[Boolean]], iouThresh: Float,
      maxAge: Int, nextId: Int): StepResult = {
    val pairs = for {
      t <- tracks
      (d, di) <- dets.zipWithIndex
      iou = SamAuto.maskIou(t.mask, d)
      if iou >= iouThresh
    } yield (iou, t.id, di)
    val usedTracks = scala.collection.mutable.Set.empty[Int]
    val detIds = Array.fill(dets.length)(-1)
    pairs.sortBy { case (iou, tid, di) => (-iou, tid, di) }.foreach {
      case (_, tid, di) =>
        if (!usedTracks(tid) && detIds(di) < 0) {
          usedTracks += tid
          detIds(di) = tid
        }
    }
    var next = nextId
    val ids = dets.indices.map { di =>
      if (detIds(di) >= 0) detIds(di)
      else { val id = next; next += 1; id }
    }
    val updated =
      dets.indices.map(di => Track(ids(di), dets(di), age = 0)) ++
        tracks.filterNot(t => usedTracks(t.id) || ids.contains(t.id))
          .map(t => t.copy(age = t.age + 1))
          .filter(_.age <= maxAge)
    StepResult(ids, updated.sortBy(_.id), next)
  }

  /** Track a whole frame sequence: per frame, the ids aligned with that
    * frame's detections.
    */
  def trackSequence(frames: Seq[Seq[Array[Boolean]]], iouThresh: Float,
      maxAge: Int): Seq[Seq[Int]] = {
    var tracks = Seq.empty[Track]
    var nextId = 0
    frames.map { dets =>
      val r = step(tracks, dets, iouThresh, maxAge, nextId)
      tracks = r.tracks
      nextId = r.nextId
      r.ids
    }
  }
}
