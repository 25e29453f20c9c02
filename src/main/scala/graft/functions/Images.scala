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

  val b64Encode = udf { (bytes: Array[Byte]) =>
    java.util.Base64.getEncoder.encodeToString(bytes)
  }

  /** tile_iterator (reference `functions/image.py:473`): split an image
    * into a grid of tiles; returns (x, y, w, h, tile_bytes) structs for
    * posexplode into a component view. Edge tiles may be smaller.
    */
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
