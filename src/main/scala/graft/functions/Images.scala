package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image operations over binary payload columns (reference image
  * family, `/root/reference/pixeltable/functions/image.py:28-726`), built on
  * the JDK's headless javax.imageio — no external codec dependency. PNG is
  * the interchange encoding (lossless, deterministic dimensions).
  *
  * Each op is a scalar UDF over `binary`; per-cell error capture composes
  * via `Multimodal.withImageMeta` or `try`-style wrappers at call sites.
  */
object Images {

  private[graft] def decode(bytes: Array[Byte]): BufferedImage = {
    if (bytes == null) throw new IllegalArgumentException("null payload")
    if (Webp.isWebp(bytes)) return Webp.decode(bytes) // VP8L lossless
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException("not a decodable image")
    img
  }

  private[graft] def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[graft] def mode(img: BufferedImage): String = img.getType match {
    case BufferedImage.TYPE_BYTE_GRAY | BufferedImage.TYPE_USHORT_GRAY => "L"
    case t if img.getColorModel.hasAlpha => "RGBA"
    case _ => "RGB"
  }

  /** deterministic solid-color PNG — test/demo image source */
  def solidPng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, width, height)
    g.dispose()
    encodePng(img)
  }

  val makeSolidPng = udf { (w: Int, h: Int, rgb: Int) => solidPng(w, h, rgb) }

  /** deterministic textured PNG (hash-colored 4×4 blocks) — test/demo
    * image source with real spatial structure, for model gates where a
    * solid image would make every feature-map token identical.
    */
  def texturedPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var h = seed * 0x9e3779b97f4a7c15L + (y / 4).toLong * 0xc2b2ae3d27d4eb4fL +
          (x / 4).toLong * 0x165667b19e3779f9L
        h ^= h >>> 29; h *= 0xbf58476d1ce4e5b9L; h ^= h >>> 32
        img.setRGB(x, y, (h & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  val makeTexturedPng = udf { (w: Int, h: Int, seed: Long) => texturedPng(w, h, seed) }

  /** (width, height, mode) without materializing pixels downstream */
  val getMetadata = udf { (bytes: Array[Byte]) =>
    val img = decode(bytes)
    (img.getWidth, img.getHeight, mode(img))
  }

  val width = udf { (bytes: Array[Byte]) => decode(bytes).getWidth }
  val height = udf { (bytes: Array[Byte]) => decode(bytes).getHeight }

  /** PIL-style resize to exact (w, h), bilinear. */
  val resize = udf { (bytes: Array[Byte], w: Int, h: Int) =>
    val src = decode(bytes)
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(src, 0, 0, w, h, null)
    g.dispose()
    encodePng(dst)
  }

  /** crop box (left, upper, right, lower) — PIL box semantics */
  val crop = udf { (bytes: Array[Byte], l: Int, u: Int, r: Int, lo: Int) =>
    encodePng(decode(bytes).getSubimage(l, u, r - l, lo - u))
  }

  /** rotate by 90/180/270 degrees counter-clockwise (PIL rotate) */
  val rotate = udf { (bytes: Array[Byte], degrees: Int) =>
    val src = decode(bytes)
    val (w, h) = (src.getWidth, src.getHeight)
    val deg = ((degrees % 360) + 360) % 360
    require(deg % 90 == 0, s"only multiples of 90 supported, got $degrees")
    val (nw, nh) = if (deg % 180 == 0) (w, h) else (h, w)
    val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val (nx, ny) = deg match {
        case 0   => (x, y)
        case 90  => (y, w - 1 - x)
        case 180 => (w - 1 - x, h - 1 - y)
        case 270 => (h - 1 - y, x)
      }
      dst.setRGB(nx, ny, src.getRGB(x, y))
    }
    encodePng(dst)
  }

  /** PIL convert('L') */
  val grayscale = udf { (bytes: Array[Byte]) =>
    val src = decode(bytes)
    val dst = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_BYTE_GRAY)
    val g = dst.createGraphics()
    g.drawImage(src, 0, 0, null)
    g.dispose()
    encodePng(dst)
  }

  /** getpixel → [r, g, b] */
  val getPixel = udf { (bytes: Array[Byte], x: Int, y: Int) =>
    val rgb = decode(bytes).getRGB(x, y)
    Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
  }

  /** raw raster sample of band 0 — for 'L'/'1' images getRGB would apply a
    * gray→sRGB colorspace conversion; this reads the stored value.
    */
  val getSample = udf { (bytes: Array[Byte], x: Int, y: Int) =>
    decode(bytes).getRaster.getSample(x, y, 0)
  }

  val b64Encode = udf { (bytes: Array[Byte]) =>
    java.util.Base64.getEncoder.encodeToString(bytes)
  }

  /** Pixels exactly equal to `rgb` (0xRRGGBB) — the closed-form gate
    * primitive for renderer oracles (pixel-aligned fixture geometry makes
    * exact-match counts deterministic even under antialiasing).
    */
  val countColor = udf { (bytes: Array[Byte], rgb: Int) =>
    val img = decode(bytes)
    var n = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        if ((img.getRGB(x, y) & 0xffffff) == rgb) n += 1
        x += 1
      }
      y += 1
    }
    n
  }

  // ---- PIL-mirror completion (reference `functions/image.py:28-726`) ----

  private def rgbAt(img: BufferedImage, x: Int, y: Int): (Int, Int, Int) = {
    val p = img.getRGB(x, y)
    ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
  }

  private def newRgb(w: Int, h: Int) = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)

  /** PIL convert: 'L' uses ITU-R 601-2 with PIL's exact fixed-point
    * rounding ((19595 R + 38470 G + 7471 B + 0x8000) >> 16); '1' thresholds
    * L at 128 (PIL dithers by default — threshold matches dither=NONE);
    * 'RGB'/'RGBA' re-encode.
    */
  val convert = udf { (bytes: Array[Byte], mode: String) =>
    val src = decode(bytes)
    def lum(x: Int, y: Int): Int = {
      val (r, g, b) = rgbAt(src, x, y)
      (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16
    }
    val out = mode match {
      case "L" =>
        val dst = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until src.getHeight; x <- 0 until src.getWidth) {
          val l = lum(x, y)
          dst.getRaster.setSample(x, y, 0, l)
        }
        dst
      case "1" =>
        val dst = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_BYTE_BINARY)
        for (y <- 0 until src.getHeight; x <- 0 until src.getWidth)
          dst.getRaster.setSample(x, y, 0, if (lum(x, y) >= 128) 1 else 0)
        dst
      case "RGB" =>
        val dst = newRgb(src.getWidth, src.getHeight)
        val g = dst.createGraphics(); g.drawImage(src, 0, 0, null); g.dispose()
        dst
      case "RGBA" =>
        val dst = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_INT_ARGB)
        val g = dst.createGraphics(); g.drawImage(src, 0, 0, null); g.dispose()
        dst
      case other => throw new IllegalArgumentException(s"unsupported mode $other")
    }
    encodePng(out)
  }

  /** PIL blend: out = im1 + (im2 - im1) * alpha, per channel, rounded. */
  val blend = udf { (a: Array[Byte], b: Array[Byte], alpha: Double) =>
    val ia = decode(a); val ib = decode(b)
    require(ia.getWidth == ib.getWidth && ia.getHeight == ib.getHeight, "size mismatch")
    val dst = newRgb(ia.getWidth, ia.getHeight)
    for (y <- 0 until ia.getHeight; x <- 0 until ia.getWidth) {
      val (r1, g1, b1) = rgbAt(ia, x, y); val (r2, g2, b2) = rgbAt(ib, x, y)
      def mix(u: Int, v: Int) = math.max(0, math.min(255, math.round(u + (v - u) * alpha).toInt))
      dst.setRGB(x, y, (mix(r1, r2) << 16) | (mix(g1, g2) << 8) | mix(b1, b2))
    }
    encodePng(dst)
  }

  /** PIL composite(image1, image2, mask): image1 where mask=255, image2
    * where mask=0, linear in between (mask read as luminance).
    */
  val composite = udf { (a: Array[Byte], b: Array[Byte], mask: Array[Byte]) =>
    val ia = decode(a); val ib = decode(b); val im = decode(mask)
    require(ia.getWidth == ib.getWidth && ia.getHeight == ib.getHeight &&
      im.getWidth == ia.getWidth && im.getHeight == ia.getHeight, "size mismatch")
    val dst = newRgb(ia.getWidth, ia.getHeight)
    for (y <- 0 until ia.getHeight; x <- 0 until ia.getWidth) {
      val (r1, g1, b1) = rgbAt(ia, x, y); val (r2, g2, b2) = rgbAt(ib, x, y)
      val m = im.getRaster.getSample(x, y, 0)
      def mix(u: Int, v: Int) = (u * m + v * (255 - m) + 127) / 255
      dst.setRGB(x, y, (mix(r1, r2) << 16) | (mix(g1, g2) << 8) | mix(b1, b2))
    }
    encodePng(dst)
  }

  /** PIL alpha_composite: Porter-Duff source-over (inputs promoted to RGBA). */
  val alphaComposite = udf { (a: Array[Byte], b: Array[Byte]) =>
    val base = decode(a); val over = decode(b)
    require(base.getWidth == over.getWidth && base.getHeight == over.getHeight, "size mismatch")
    val dst = new BufferedImage(base.getWidth, base.getHeight, BufferedImage.TYPE_INT_ARGB)
    val g = dst.createGraphics()
    g.drawImage(base, 0, 0, null)
    g.drawImage(over, 0, 0, null)
    g.dispose()
    encodePng(dst)
  }

  /** PIL getchannel(i): one band as an 'L' image. */
  val getChannel = udf { (bytes: Array[Byte], channel: Int) =>
    val src = decode(bytes)
    val dst = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until src.getHeight; x <- 0 until src.getWidth) {
      val p = src.getRGB(x, y)
      val v = channel match {
        case 0 => (p >> 16) & 0xff
        case 1 => (p >> 8) & 0xff
        case 2 => p & 0xff
        case 3 => (p >> 24) & 0xff
        case c => throw new IllegalArgumentException(s"bad channel $c")
      }
      dst.getRaster.setSample(x, y, 0, v)
    }
    encodePng(dst)
  }

  /** PIL point(lut): 256-entry lookup applied to every channel. */
  val point = udf { (bytes: Array[Byte], lut: Seq[Int]) =>
    require(lut.length == 256, s"lut must have 256 entries, got ${lut.length}")
    val src = decode(bytes)
    val dst = newRgb(src.getWidth, src.getHeight)
    for (y <- 0 until src.getHeight; x <- 0 until src.getWidth) {
      val (r, g, b) = rgbAt(src, x, y)
      def f(v: Int) = math.max(0, math.min(255, lut(v)))
      dst.setRGB(x, y, (f(r) << 16) | (f(g) << 8) | f(b))
    }
    encodePng(dst)
  }

  /** PIL transpose: 0=FLIP_LEFT_RIGHT 1=FLIP_TOP_BOTTOM 2=ROTATE_90
    * 3=ROTATE_180 4=ROTATE_270 5=TRANSPOSE 6=TRANSVERSE (PIL's rotations
    * are counter-clockwise).
    */
  val transpose = udf { (bytes: Array[Byte], method: Int) =>
    val src = decode(bytes)
    val (w, h) = (src.getWidth, src.getHeight)
    val swap = method >= 2 && method != 3
    val dst = newRgb(if (swap) h else w, if (swap) w else h)
    for (y <- 0 until h; x <- 0 until w) {
      val (nx, ny) = method match {
        case 0 => (w - 1 - x, y)             // FLIP_LEFT_RIGHT
        case 1 => (x, h - 1 - y)             // FLIP_TOP_BOTTOM
        case 2 => (y, w - 1 - x)             // ROTATE_90 (ccw)
        case 3 => (w - 1 - x, h - 1 - y)     // ROTATE_180
        case 4 => (h - 1 - y, x)             // ROTATE_270
        case 5 => (y, x)                     // TRANSPOSE
        case 6 => (h - 1 - y, w - 1 - x)     // TRANSVERSE
        case m => throw new IllegalArgumentException(s"bad method $m")
      }
      dst.setRGB(nx, ny, src.getRGB(x, y))
    }
    encodePng(dst)
  }

  /** PIL histogram(): concatenated 256-bin per-band histogram (768 for RGB,
    * 256 for L).
    */
  def histogramOf(img: BufferedImage): Array[Long] = {
    if (img.getType == BufferedImage.TYPE_BYTE_GRAY) {
      val h = new Array[Long](256)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        h(img.getRaster.getSample(x, y, 0)) += 1
      h
    } else {
      val h = new Array[Long](768)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val (r, g, b) = rgbAt(img, x, y)
        h(r) += 1; h(256 + g) += 1; h(512 + b) += 1
      }
      h
    }
  }

  val histogram = udf { (bytes: Array[Byte]) => histogramOf(decode(bytes)).toSeq }

  /** PIL entropy(): Shannon entropy (bits) of the concatenated histogram. */
  val entropy = udf { (bytes: Array[Byte]) =>
    val h = histogramOf(decode(bytes))
    val total = h.sum.toDouble
    -h.iterator.filter(_ > 0).map { c =>
      val p = c / total
      p * (math.log(p) / math.log(2))
    }.sum
  }

  /** PIL getextrema(): per-band (min, max) — [[rmin,rmax],[gmin,gmax],[bmin,bmax]]
    * for RGB, [[min,max]] for L.
    */
  val getExtrema = udf { (bytes: Array[Byte]) =>
    val img = decode(bytes)
    if (img.getType == BufferedImage.TYPE_BYTE_GRAY) {
      var lo = 255; var hi = 0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val v = img.getRaster.getSample(x, y, 0)
        lo = math.min(lo, v); hi = math.max(hi, v)
      }
      Seq(Seq(lo, hi))
    } else {
      val lo = Array(255, 255, 255); val hi = Array(0, 0, 0)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val (r, g, b) = rgbAt(img, x, y)
        val vs = Array(r, g, b)
        for (i <- 0 until 3) { lo(i) = math.min(lo(i), vs(i)); hi(i) = math.max(hi(i), vs(i)) }
      }
      (0 until 3).map(i => Seq(lo(i), hi(i)))
    }
  }

  /** PIL getbands() */
  val getBands = udf { (bytes: Array[Byte]) =>
    mode(decode(bytes)).map(_.toString)
  }

  /** PIL getbbox(): bounding box (l, u, r, lo) of non-zero pixels, null if
    * the image is entirely zero.
    */
  val getBbox = udf { (bytes: Array[Byte]) =>
    val img = decode(bytes)
    var (minX, minY, maxX, maxY) = (Int.MaxValue, Int.MaxValue, -1, -1)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) & 0xffffff) != 0) {
        minX = math.min(minX, x); minY = math.min(minY, y)
        maxX = math.max(maxX, x); maxY = math.max(maxY, y)
      }
    if (maxX < 0) null else Seq(minX, minY, maxX + 1, maxY + 1)
  }

  /** PIL getcolors(maxcolors): (count, [r,g,b]) per distinct color, null if
    * the image has more than maxcolors distinct colors.
    */
  val getColors = udf { (bytes: Array[Byte], maxColors: Int) =>
    val img = decode(bytes)
    val counts = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
    var over = false
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth if !over) {
      val c = img.getRGB(x, y) & 0xffffff
      counts(c) = counts.getOrElse(c, 0L) + 1
      if (counts.size > maxColors) over = true
    }
    if (over) null
    else counts.toSeq.map { case (c, n) =>
      (n, Seq((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff))
    }
  }

  /** PIL getpalette(): the palette as flat [r,g,b,…] for palettized (P)
    * images, null otherwise — javax.imageio surfaces palettes as
    * IndexColorModel.
    */
  val getPalette = udf { (bytes: Array[Byte]) =>
    decode(bytes).getColorModel match {
      case icm: java.awt.image.IndexColorModel =>
        val n = icm.getMapSize
        val (rs, gs, bs) = (new Array[Byte](n), new Array[Byte](n), new Array[Byte](n))
        icm.getReds(rs); icm.getGreens(gs); icm.getBlues(bs)
        (0 until n).flatMap(i => Seq(rs(i) & 0xff, gs(i) & 0xff, bs(i) & 0xff))
      case _ => null
    }
  }

  /** PIL getprojection(): 0/1 flags per column and per row marking any
    * non-zero pixel.
    */
  val getProjection = udf { (bytes: Array[Byte]) =>
    val img = decode(bytes)
    val xs = Array.fill(img.getWidth)(0)
    val ys = Array.fill(img.getHeight)(0)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) & 0xffffff) != 0) { xs(x) = 1; ys(y) = 1 }
    (xs.toSeq, ys.toSeq)
  }

  /** PIL reduce(factor): box-mean downscale by an integer factor (edge
    * boxes average the remaining pixels); output is ceil(w/f) × ceil(h/f).
    */
  val reduceBox = udf { (bytes: Array[Byte], factor: Int) =>
    require(factor >= 1, s"bad factor $factor")
    val src = decode(bytes)
    val nw = (src.getWidth + factor - 1) / factor
    val nh = (src.getHeight + factor - 1) / factor
    val dst = newRgb(nw, nh)
    for (by <- 0 until nh; bx <- 0 until nw) {
      var (sr, sg, sb, n) = (0L, 0L, 0L, 0)
      for (y <- by * factor until math.min((by + 1) * factor, src.getHeight);
           x <- bx * factor until math.min((bx + 1) * factor, src.getWidth)) {
        val (r, g, b) = rgbAt(src, x, y)
        sr += r; sg += g; sb += b; n += 1
      }
      dst.setRGB(bx, by, (((sr + n / 2) / n).toInt << 16) |
        (((sg + n / 2) / n).toInt << 8) | ((sb + n / 2) / n).toInt)
    }
    encodePng(dst)
  }

  /** PIL thumbnail(size): aspect-preserving shrink-only resize so the result
    * fits in (maxW, maxH); images already inside the box pass through.
    */
  val thumbnail = udf { (bytes: Array[Byte], maxW: Int, maxH: Int) =>
    val src = decode(bytes)
    val scale = math.min(maxW.toDouble / src.getWidth, maxH.toDouble / src.getHeight)
    if (scale >= 1.0) encodePng(src)
    else {
      val nw = math.max(math.round(src.getWidth * scale).toInt, 1)
      val nh = math.max(math.round(src.getHeight * scale).toInt, 1)
      val dst = newRgb(nw, nh)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, nw, nh, null)
      g.dispose()
      encodePng(dst)
    }
  }

  /** PIL quantize(colors): median-cut palette of ≤ `colors` colors, every
    * pixel snapped to its bucket's mean (re-encoded as RGB — distinct-color
    * count is the observable contract).
    */
  val quantize = udf { (bytes: Array[Byte], colors: Int) =>
    require(colors >= 1, s"bad color count $colors")
    val img = decode(bytes)
    val pixels = (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y) & 0xffffff).toArray
    // median-cut: repeatedly split the box with the largest channel range
    final case class Box(px: Array[Int]) {
      private def chan(c: Int, p: Int) = (p >> (16 - 8 * c)) & 0xff
      val ranges: Seq[Int] = (0 until 3).map(c => px.map(chan(c, _)).max - px.map(chan(c, _)).min)
      def widest: Int = ranges.indexOf(ranges.max)
      def split: Seq[Box] = {
        val c = widest
        val sorted = px.sortBy(chan(c, _))
        val mid = sorted.length / 2
        Seq(Box(sorted.take(mid)), Box(sorted.drop(mid)))
      }
      def mean: Int = {
        val n = px.length
        val r = px.map(p => (p >> 16) & 0xff).map(_.toLong).sum / n
        val g = px.map(p => (p >> 8) & 0xff).map(_.toLong).sum / n
        val b = px.map(p => p & 0xff).map(_.toLong).sum / n
        (r.toInt << 16) | (g.toInt << 8) | b.toInt
      }
    }
    var boxes = Vector(Box(pixels))
    while (boxes.length < colors && boxes.exists(_.px.length > 1)) {
      val i = boxes.indexWhere(b => b.px.length > 1 && b.ranges.max ==
        boxes.filter(_.px.length > 1).map(_.ranges.max).max)
      boxes = boxes.patch(i, boxes(i).split.filter(_.px.nonEmpty), 1)
    }
    val palette = boxes.map(_.mean)
    def nearest(p: Int): Int = palette.minBy { q =>
      val dr = ((p >> 16) & 0xff) - ((q >> 16) & 0xff)
      val dg = ((p >> 8) & 0xff) - ((q >> 8) & 0xff)
      val db = (p & 0xff) - (q & 0xff)
      dr * dr + dg * dg + db * db
    }
    val dst = newRgb(img.getWidth, img.getHeight)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      dst.setRGB(x, y, nearest(img.getRGB(x, y) & 0xffffff))
    encodePng(dst)
  }

  /** PIL effect_spread(distance): per-pixel displacement within ±distance.
    * PIL draws the offsets from a PRNG; here they come from a deterministic
    * position hash so results are reproducible across runs and engines.
    */
  val effectSpread = udf { (bytes: Array[Byte], distance: Int) =>
    val src = decode(bytes)
    val (w, h) = (src.getWidth, src.getHeight)
    val dst = newRgb(w, h)
    for (y <- 0 until h; x <- 0 until w) {
      val hash = (x * 2654435761L + y * 40503L) & 0x7fffffff
      val dx = (hash % (2 * distance + 1)).toInt - distance
      val dy = ((hash / 7919) % (2 * distance + 1)).toInt - distance
      val sx = math.max(0, math.min(w - 1, x + dx))
      val sy = math.max(0, math.min(h - 1, y + dy))
      dst.setRGB(x, y, src.getRGB(sx, sy))
    }
    encodePng(dst)
  }

  /** tile_iterator (reference `functions/image.py:473`): split an image
    * into a grid of tiles; returns (x, y, w, h, tile_bytes) structs for
    * posexplode into a component view. Edge tiles may be smaller.
    */
  /** tile_iterator with overlap + black padding (reference
    * `functions/image.py:473-551`): the grid is
    * xlen = (w − ow − 1) / (tw − ow) + 1 (same for y), every output tile
    * is EXACTLY tileW×tileH — out-of-image area is blackspace, like PIL's
    * crop beyond bounds — and tile_box = (x1, y1, x1+tw, y1+th) is
    * deliberately unclipped. Row-major (tile_coord = (i, j)) via
    * posexplode ordering.
    */
  /** to_video (reference `functions/image.py:656` — ffmpeg `-loop` there):
    * a still image repeated for `duration` seconds at `fps` as an
    * MJPEG-AVI. One JPEG encode, the frame bytes repeated — the container
    * cost is O(frames), the pixel cost O(1).
    */
  val toVideo = udf { (bytes: Array[Byte], duration: Double, fps: Int) =>
    require(duration > 0 && fps > 0, s"bad duration/fps: $duration/$fps")
    val img = decode(bytes)
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_INT_RGB)
        val g = c.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
        c
      }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(rgb, "jpg", bos)
    val frame = bos.toByteArray
    val n = math.max(1, math.round(duration * fps).toInt)
    Avi.write(Seq.fill(n)(frame), img.getWidth, img.getHeight, fps)
  }

  /** The tile grid as decoded images: (i, j, x1, y1, exact-size padded
    * tile) — shared by the tileIterator UDF and tiled model inference.
    */
  private[graft] def tileImages(img: BufferedImage, tileW: Int, tileH: Int,
      overlapW: Int, overlapH: Int): Seq[(Int, Int, Int, Int, BufferedImage)] = {
    require(tileW > 0 && tileH > 0, s"tile_size must be positive: $tileW x $tileH")
    require(overlapW >= 0 && overlapH >= 0 && overlapW < tileW && overlapH < tileH,
      s"overlap must be in [0, tile_size): $overlapW x $overlapH")
    // floorDiv, not Scala's truncating `/`: the reference formula is
    // Python floor division, and for an image no wider than the overlap
    // (w − ow − 1 < 0) the two disagree — floor yields an EMPTY grid
    // (the reference's behavior), truncation would emit one padded tile
    val xlen = Math.floorDiv(img.getWidth - overlapW - 1, tileW - overlapW) + 1
    val ylen = Math.floorDiv(img.getHeight - overlapH - 1, tileH - overlapH) + 1
    for { j <- 0 until ylen; i <- 0 until xlen } yield {
      val x1 = i * (tileW - overlapW)
      val y1 = j * (tileH - overlapH)
      val out = new BufferedImage(tileW, tileH, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics() // TYPE_INT_RGB zero-fills → blackspace
      g.drawImage(img, -x1, -y1, null)
      g.dispose()
      (i, j, x1, y1, out)
    }
  }

  val tileIterator = udf {
    (bytes: Array[Byte], tileW: Int, tileH: Int, overlapW: Int, overlapH: Int) =>
      tileImages(decode(bytes), tileW, tileH, overlapW, overlapH).map {
        case (i, j, x1, y1, tile) =>
          (i, j, x1, y1, x1 + tileW, y1 + tileH, encodePng(tile))
      }
  }

  val tiles = udf { (bytes: Array[Byte], tileW: Int, tileH: Int) =>
    val img = decode(bytes)
    for {
      y <- 0 until img.getHeight by tileH
      x <- 0 until img.getWidth by tileW
    } yield {
      val w = math.min(tileW, img.getWidth - x)
      val h = math.min(tileH, img.getHeight - y)
      (x, y, w, h, encodePng(img.getSubimage(x, y, w, h)))
    }
  }
}

/** stitch_tiles UDA (reference `functions/image.py:576`): reassemble tiles
  * produced by `Images.tiles` into the full image. Position metadata makes
  * it order-insensitive, so partial aggregation applies (no sorted input
  * required, unlike the reference's requires_order_by formulation).
  */
object StitchTiles extends org.apache.spark.sql.expressions.Aggregator[
    (Int, Int, Int, Int, Array[Byte]),
    List[(Int, Int, Int, Int, Array[Byte])],
    Array[Byte]] {
  import org.apache.spark.sql.{Encoder, Encoders}

  def zero: List[(Int, Int, Int, Int, Array[Byte])] = Nil
  def reduce(b: List[(Int, Int, Int, Int, Array[Byte])],
      t: (Int, Int, Int, Int, Array[Byte])): List[(Int, Int, Int, Int, Array[Byte])] = t :: b
  def merge(a: List[(Int, Int, Int, Int, Array[Byte])],
      b: List[(Int, Int, Int, Int, Array[Byte])]): List[(Int, Int, Int, Int, Array[Byte])] = a ++ b
  def finish(ts: List[(Int, Int, Int, Int, Array[Byte])]): Array[Byte] = {
    if (ts.isEmpty) return null
    val width = ts.map(t => t._1 + t._3).max
    val height = ts.map(t => t._2 + t._4).max
    val canvas = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = canvas.createGraphics()
    ts.foreach { case (x, y, _, _, bytes) =>
      g.drawImage(Images.decode(bytes), x, y, null)
    }
    g.dispose()
    Images.encodePng(canvas)
  }
  def bufferEncoder: Encoder[List[(Int, Int, Int, Int, Array[Byte])]] =
    Encoders.kryo[List[(Int, Int, Int, Int, Array[Byte])]]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
