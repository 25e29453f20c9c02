package graft.functions

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** The five PySceneDetect-semantics detectors (reference
  * `functions/video/scene_detect.py`) over synthetic MJPEG-AVI videos with
  * known cut positions. Solid/gradient JPEG frames decode deterministically
  * enough that every expected cut has a wide score margin.
  */
class SceneDetectSpec extends AnyFunSuite {

  private val Fps = 10

  private def solid(rgb: Int, w: Int = 32, h: Int = 32): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  private def gray(level: Int): BufferedImage =
    solid((level << 16) | (level << 8) | level)

  /** horizontal luminance ramp; `flip` reverses its direction */
  private def gradient(flip: Boolean, w: Int = 32, h: Int = 32): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val l = ((if (flip) w - 1 - x else x) * 255 / (w - 1)) & 0xff
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    img
  }

  private def jpeg(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def video(frames: Seq[BufferedImage]): Array[Byte] =
    Avi.write(frames.map(jpeg), frames.head.getWidth, frames.head.getHeight, Fps)

  test("content: HSV cut between color blocks, one SceneInfo per cut, no-cut full span") {
    val v = video(Seq.fill(6)(solid(0xff0000)) ++ Seq.fill(6)(solid(0x0000ff)))
    val sc = SceneDetect.detectContent(v, threshold = 27.0, minSceneLen = 2,
      lumaOnly = false)
    assert(sc == Seq(SceneDetect.SceneInfo(0.0, 0L, 6.0 / Fps)))

    // luma-only ignores a pure-chroma cut (red and blue have close V)
    val lum = SceneDetect.detectContent(v, threshold = 27.0, minSceneLen = 2,
      lumaOnly = true)
    assert(lum == Seq(SceneDetect.SceneInfo(0.0, 0L, 11.0 / Fps)))

    // cut-less video: single scene ending at the LAST frame's timestamp
    val flat = video(Seq.fill(8)(solid(0x808080)))
    val one = SceneDetect.detectContent(flat, 27.0, 2, lumaOnly = false)
    assert(one == Seq(SceneDetect.SceneInfo(0.0, 0L, 7.0 / Fps)))
  }

  test("adaptive: steady drift is not a cut, an abrupt jump against the window is") {
    // constant-slope brightness drift: every frame scores alike → ratio ≈ 1
    val drift = video((0 until 6).map(i => gray(10 + 45 * i)))
    val none = SceneDetect.detectAdaptive(drift, adaptiveThreshold = 2.0,
      minSceneLen = 1, windowWidth = 2, minContentVal = 10.0)
    assert(none == Seq(SceneDetect.SceneInfo(0.0, 0L, 5.0 / Fps)))

    // small steps with one 130-level jump at frame 3: ratio ≫ threshold
    val jump = video(Seq(gray(10), gray(20), gray(30), gray(160), gray(170),
      gray(180)))
    val cut = SceneDetect.detectAdaptive(jump, adaptiveThreshold = 2.0,
      minSceneLen = 1, windowWidth = 2, minContentVal = 15.0)
    assert(cut == Seq(SceneDetect.SceneInfo(0.0, 0L, 3.0 / Fps)))
  }

  test("threshold: fade-to-black cut placement follows fadeBias; addFinalScene on a dark tail") {
    val faded = video(Seq.fill(4)(gray(200)) ++ Seq.fill(3)(gray(4)) ++
      Seq.fill(4)(gray(200)))
    def cutAt(bias: Double): Seq[SceneDetect.SceneInfo] =
      SceneDetect.detectThreshold(faded, threshold = 12.0, minSceneLen = 2,
        fadeBias = bias, addFinalScene = false, method = "floor")
    assert(cutAt(0.0) == Seq(SceneDetect.SceneInfo(0.0, 0L, 6.0 / Fps))) // midpoint: 4+round(3·0.5)
    assert(cutAt(-1.0) == Seq(SceneDetect.SceneInfo(0.0, 0L, 4.0 / Fps))) // fade-out start
    assert(cutAt(1.0) == Seq(SceneDetect.SceneInfo(0.0, 0L, 7.0 / Fps))) // fade-in frame

    // ends inside the fade: addFinalScene turns the dark tail into a scene
    val tail = video(Seq.fill(4)(gray(200)) ++ Seq.fill(3)(gray(4)))
    val fin = SceneDetect.detectThreshold(tail, 12.0, minSceneLen = 2,
      fadeBias = 0.0, addFinalScene = true, method = "floor")
    assert(fin == Seq(SceneDetect.SceneInfo(0.0, 0L, 4.0 / Fps)))
    val noFin = SceneDetect.detectThreshold(tail, 12.0, minSceneLen = 2,
      fadeBias = 0.0, addFinalScene = false, method = "floor")
    assert(noFin == Seq(SceneDetect.SceneInfo(0.0, 0L, 6.0 / Fps))) // cut-less

    // ceiling method: the BRIGHT middle is the fade
    val bright = video(Seq.fill(4)(gray(20)) ++ Seq.fill(3)(gray(250)) ++
      Seq.fill(4)(gray(20)))
    val ceil = SceneDetect.detectThreshold(bright, threshold = 240.0,
      minSceneLen = 2, fadeBias = 0.0, addFinalScene = false,
      method = "ceiling")
    assert(ceil == Seq(SceneDetect.SceneInfo(0.0, 0L, 6.0 / Fps)))
  }

  test("histogram: disjoint Y histograms cut, shared histograms don't") {
    val v = video(Seq.fill(3)(gray(50)) ++ Seq.fill(3)(gray(200)))
    val sc = SceneDetect.detectHistogram(v, threshold = 0.05, bins = 16,
      minSceneLen = 1)
    assert(sc == Seq(SceneDetect.SceneInfo(0.0, 0L, 3.0 / Fps)))

    val flat = video(Seq.fill(6)(gray(50)))
    assert(SceneDetect.detectHistogram(flat, 0.05, 16, 1) ==
      Seq(SceneDetect.SceneInfo(0.0, 0L, 5.0 / Fps)))
  }

  test("hash: brightness-only change is hash-invariant, structure change cuts") {
    // solid 50 → solid 200: pHash encodes structure, not level — no cut
    val levels = video(Seq.fill(3)(gray(50)) ++ Seq.fill(3)(gray(200)))
    val inv = SceneDetect.detectHash(levels, threshold = 0.10, size = 16,
      lowpass = 2, minSceneLen = 1)
    assert(inv == Seq(SceneDetect.SceneInfo(0.0, 0L, 5.0 / Fps)))

    // ramp → reversed ramp: odd DCT coefficients flip sign — large distance
    val v = video(Seq.fill(3)(gradient(false)) ++ Seq.fill(3)(gradient(true)))
    val sc = SceneDetect.detectHash(v, threshold = 0.10, size = 16,
      lowpass = 2, minSceneLen = 1)
    assert(sc == Seq(SceneDetect.SceneInfo(0.0, 0L, 3.0 / Fps)))
  }

  test("min_scene_len gates rapid consecutive cuts") {
    // alternating colors every 2 frames; min_scene_len=4 admits only every
    // second boundary
    val blocks = (0 until 5).flatMap(i =>
      Seq.fill(2)(solid(if (i % 2 == 0) 0xff0000 else 0x0000ff)))
    val sc = SceneDetect.detectContent(video(blocks), threshold = 27.0,
      minSceneLen = 4, lumaOnly = false)
    assert(sc.map(_.start_pts) == Seq(0L, 4L)) // cuts at 4 and 8
    assert(sc.map(_.duration) == Seq(4.0 / Fps, 4.0 / Fps))
  }
}
