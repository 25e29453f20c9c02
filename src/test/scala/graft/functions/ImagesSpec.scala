package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val png = Images.solidPng(32, 16, 0xAA5500)

  test("decode/resize/crop/rotate/grayscale round-trips through real codec") {
    val df = Seq(Tuple1(png)).toDF("img")
    val out = df.select(
      Images.getMetadata(col("img")).as("meta"),
      Images.getMetadata(Images.resize(col("img"), lit(8), lit(4))).as("resized"),
      Images.getMetadata(Images.crop(col("img"), lit(2), lit(2), lit(10), lit(12))).as("cropped"),
      Images.getMetadata(Images.rotate(col("img"), lit(90))).as("rotated"),
      Images.getMetadata(Images.grayscale(col("img"))).as("gray"),
      Images.getPixel(col("img"), lit(5), lit(5)).as("px"),
    ).head()
    assert(out.getAs[org.apache.spark.sql.Row]("meta").getInt(0) == 32)
    assert(out.getAs[org.apache.spark.sql.Row]("resized").getInt(0) == 8)
    assert(out.getAs[org.apache.spark.sql.Row]("resized").getInt(1) == 4)
    assert(out.getAs[org.apache.spark.sql.Row]("cropped").getInt(0) == 8)   // 10-2
    assert(out.getAs[org.apache.spark.sql.Row]("cropped").getInt(1) == 10)  // 12-2
    assert(out.getAs[org.apache.spark.sql.Row]("rotated").getInt(0) == 16)  // dims swap
    assert(out.getAs[org.apache.spark.sql.Row]("rotated").getInt(1) == 32)
    assert(out.getAs[org.apache.spark.sql.Row]("gray").getString(2) == "L")
    assert(out.getAs[scala.collection.Seq[Int]]("px").toSeq == Seq(0xAA, 0x55, 0x00))
  }

  test("tiles + stitch round-trip reassembles the image") {
    val df = Seq(Tuple1(Images.solidPng(32, 16, 0x112233))).toDF("img")
    val tiled = df.select(explode(Images.tiles(col("img"), lit(16), lit(8))).as("t"))
      .select(col("t._1").as("x"), col("t._2").as("y"),
        col("t._3").as("w"), col("t._4").as("h"), col("t._5").as("tile"))
    assert(tiled.count() == 4)
    val stitch = udaf(StitchTiles)
    val out = tiled
      .agg(stitch(col("x"), col("y"), col("w"), col("h"), col("tile")).as("img"))
      .select(Images.getMetadata(col("img")).as("meta")).head()
    val meta = out.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getInt(0) == 32 && meta.getInt(1) == 16)
  }

  test("rotate 90 moves pixels correctly") {
    // 2x1 image: left red, right green → rotated 90 CCW: top green, bottom red
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    val bytes = Images.encodePng(img)
    val df = Seq(Tuple1(bytes)).toDF("img")
    val top = df.select(Images.getPixel(Images.rotate(col("img"), lit(90)), lit(0), lit(0)))
      .head().getAs[scala.collection.Seq[Int]](0).toSeq
    assert(top == Seq(0, 255, 0)) // green rotated to top
  }

  private def px(bytes: Array[Byte], x: Int, y: Int): Seq[Int] = {
    val p = Images.decode(bytes).getRGB(x, y)
    Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
  }

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(Tuple1(png)).toDF("img").select(c.as("r")).head().getAs[T]("r")

  test("convert: PIL-exact L luminance and threshold mode 1") {
    // PIL L for (0xAA, 0x55, 0x00): (19595*170 + 38470*85 + 7471*0 + 0x8000) >> 16 = 101
    val l = one[Array[Byte]](Images.convert(col("img"), lit("L")))
    assert(Images.decode(l).getRaster.getSample(3, 3, 0) == 101)
    val bw = one[Array[Byte]](Images.convert(col("img"), lit("1")))
    assert(Images.decode(bw).getRaster.getSample(3, 3, 0) == 0) // 101 < 128
  }

  test("blend and composite interpolate channels") {
    val red = Images.solidPng(4, 4, 0xFF0000)
    val blue = Images.solidPng(4, 4, 0x0000FF)
    val df = Seq((red, blue)).toDF("a", "b")
    val mixed = df.select(Images.blend(col("a"), col("b"), lit(0.25)).as("r"))
      .head().getAs[Array[Byte]]("r")
    assert(px(mixed, 1, 1) == Seq(191, 0, 64)) // 255*(1-.25)=191.25→191, 255*.25=63.75→64
    val black = Images.solidPng(4, 4, 0x000000) // mask 0 → second image
    val comp = Seq((red, blue, black)).toDF("a", "b", "m")
      .select(Images.composite(col("a"), col("b"), col("m")).as("r"))
      .head().getAs[Array[Byte]]("r")
    assert(px(comp, 0, 0) == Seq(0, 0, 255))
  }

  test("transpose methods produce PIL geometry") {
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    val b = Images.encodePng(img)
    val df = Seq(Tuple1(b)).toDF("img")
    val flipped = df.select(Images.transpose(col("img"), lit(0)).as("r"))
      .head().getAs[Array[Byte]]("r")
    assert(px(flipped, 0, 0) == Seq(0, 255, 0)) // FLIP_LEFT_RIGHT
    val t = df.select(Images.transpose(col("img"), lit(5)).as("r"))
      .head().getAs[Array[Byte]]("r")
    val m = Images.decode(t)
    assert(m.getWidth == 1 && m.getHeight == 2) // TRANSPOSE swaps axes
  }

  test("histogram/entropy/extrema/colors/bands on a solid image") {
    val hist = one[scala.collection.Seq[Long]](Images.histogram(col("img"))).toSeq
    assert(hist.length == 768)
    assert(hist(0xAA) == 512 && hist(256 + 0x55) == 512 && hist(512 + 0x00) == 512)
    // solid RGB: 3 equal spikes in the 768-bin concatenated histogram → log2(3)
    assert(math.abs(one[Double](Images.entropy(col("img"))) -
      math.log(3) / math.log(2)) < 1e-12)
    val ext = one[scala.collection.Seq[scala.collection.Seq[Int]]](
      Images.getExtrema(col("img"))).map(_.toSeq).toSeq
    assert(ext == Seq(Seq(0xAA, 0xAA), Seq(0x55, 0x55), Seq(0x00, 0x00)))
    val colors = one[scala.collection.Seq[org.apache.spark.sql.Row]](
      Images.getColors(col("img"), lit(4))).toSeq
    assert(colors.length == 1 && colors.head.getLong(0) == 512)
    assert(one[scala.collection.Seq[String]](Images.getBands(col("img"))).toSeq ==
      Seq("R", "G", "B"))
  }

  test("getbbox and projection find the non-zero region") {
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(2, 1, 0xFFFFFF); img.setRGB(5, 2, 0xFFFFFF)
    val df = Seq(Tuple1(Images.encodePng(img))).toDF("img")
    val bbox = df.select(Images.getBbox(col("img")).as("r"))
      .head().getAs[scala.collection.Seq[Int]]("r").toSeq
    assert(bbox == Seq(2, 1, 6, 3))
    val proj = df.select(Images.getProjection(col("img")).as("r"))
      .head().getAs[org.apache.spark.sql.Row]("r")
    assert(proj.getAs[scala.collection.Seq[Int]](0).toSeq == Seq(0, 0, 1, 0, 0, 1, 0, 0))
    assert(proj.getAs[scala.collection.Seq[Int]](1).toSeq == Seq(0, 1, 1, 0))
  }

  test("point applies a per-channel LUT") {
    val inverted = one[Array[Byte]](Images.point(col("img"),
      lit((255 to 0 by -1).toArray)))
    assert(px(inverted, 0, 0) == Seq(255 - 0xAA, 255 - 0x55, 255))
  }

  test("reduce box-averages and thumbnail preserves aspect") {
    val r = one[Array[Byte]](Images.reduceBox(col("img"), lit(5)))
    val ri = Images.decode(r)
    assert(ri.getWidth == 7 && ri.getHeight == 4) // ceil(32/5), ceil(16/5)
    assert(px(r, 0, 0) == Seq(0xAA, 0x55, 0x00))  // solid stays solid
    val t = one[Array[Byte]](Images.thumbnail(col("img"), lit(8), lit(8)))
    val ti = Images.decode(t)
    assert(ti.getWidth == 8 && ti.getHeight == 4) // 32x16 → scale 1/4
    val noop = one[Array[Byte]](Images.thumbnail(col("img"), lit(100), lit(100)))
    assert(Images.decode(noop).getWidth == 32) // shrink-only
  }

  test("quantize bounds the distinct color count") {
    val img = new java.awt.image.BufferedImage(8, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(x => img.setRGB(x, 0, x * 0x202020)) // 8 distinct grays
    val df = Seq(Tuple1(Images.encodePng(img))).toDF("img")
    val q = df.select(Images.quantize(col("img"), lit(3)).as("r"))
      .head().getAs[Array[Byte]]("r")
    val qi = Images.decode(q)
    val distinct = (0 until 8).map(x => qi.getRGB(x, 0) & 0xffffff).distinct
    assert(distinct.length <= 3)
  }

  test("getpalette: entries for palettized PNG, null for RGB") {
    assert(one[scala.collection.Seq[Int]](Images.getPalette(col("img"))) == null)
    // build a real palettized (P) image: 2-entry IndexColorModel
    val cmap = Array(0xff0000, 0x00ff00)
    val icm = new java.awt.image.IndexColorModel(1, 2,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    img.getRaster.setSample(0, 0, 0, 0); img.getRaster.setSample(1, 0, 0, 1)
    val df = Seq(Tuple1(Images.encodePng(img))).toDF("img")
    val pal = df.select(Images.getPalette(col("img")).as("p"))
      .head().getAs[scala.collection.Seq[Int]]("p").toSeq
    assert(pal == Seq(255, 0, 0, 0, 255, 0))
  }

  test("getchannel extracts a band; effect_spread is deterministic") {
    val ch = one[Array[Byte]](Images.getChannel(col("img"), lit(1)))
    assert(Images.decode(ch).getRaster.getSample(0, 0, 0) == 0x55)
    val s1 = one[Array[Byte]](Images.effectSpread(col("img"), lit(2)))
    val s2 = one[Array[Byte]](Images.effectSpread(col("img"), lit(2)))
    assert(java.util.Arrays.equals(s1, s2))
    assert(px(s1, 3, 3) == Seq(0xAA, 0x55, 0x00)) // solid: displacement invisible
  }

  test("toVideo: still image loops into an MJPEG-AVI with exact frame math") {
    val row = Seq(1).toDF("one")
      .withColumn("img", Images.makeSolidPng(lit(20), lit(14), lit(0x336699)))
      .withColumn("v", Images.toVideo(col("img"), lit(1.5), lit(10)))
      .select("v").head()
    val v = row.getAs[Array[Byte]](0)
    val meta = Avi.readMeta(v)
    assert(meta.width == 20 && meta.height == 14)
    assert(meta.frames == 15 && meta.fps == 10.0) // round(1.5 · 10)
    // all frames are the same JPEG bytes (one encode, repeated)
    val frames = Avi.readFrames(v)
    assert(frames.forall(_.sameElements(frames.head)))
    val img = Images.decode(frames.head)
    assert(img.getWidth == 20 && img.getHeight == 14)
  }

  test("tileIterator: overlap grid, row-major order, exact-size black padding") {
    // 10×7 image, 4×3 tiles, (1,1) overlap: xlen=(10-2)/3+1=3, ylen=(7-2)/2+1=3
    val df = Seq(1).toDF("one")
      .withColumn("img", Images.makeSolidPng(lit(10), lit(7), lit(0xffffff)))
      .select(posexplode(Images.tileIterator(col("img"), lit(4), lit(3), lit(1), lit(1))))
      .select(col("pos"), col("col._1").as("i"), col("col._2").as("j"),
        col("col._3").as("x1"), col("col._4").as("y1"),
        col("col._5").as("x2"), col("col._6").as("y2"), col("col._7").as("tile"))
    val rows = df.collect()
    assert(rows.length == 9)
    // row-major: pos = j*xlen + i; boxes step by tile−overlap, unclipped
    rows.foreach { r =>
      val (pos, i, j) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(pos == j * 3 + i)
      assert(r.getInt(3) == i * 3 && r.getInt(4) == j * 2)
      assert(r.getInt(5) == i * 3 + 4 && r.getInt(6) == j * 2 + 3)
      val img = Images.decode(r.getAs[Array[Byte]](7))
      assert(img.getWidth == 4 && img.getHeight == 3) // ALWAYS exact size
      // in-image pixels are the source color; beyond-the-edge = blackspace
      for (y <- 0 until 3; x <- 0 until 4) {
        val inside = i * 3 + x < 10 && j * 2 + y < 7
        val px = img.getRGB(x, y) & 0xffffff
        assert(px == (if (inside) 0xffffff else 0x000000),
          s"tile($i,$j) pixel($x,$y) inside=$inside px=$px")
      }
    }
    // overlap pixels: adjacent tiles share a source column (x1 of tile i+1
    // is x2−overlap of tile i)
    assert(rows.filter(_.getInt(2) == 0).map(_.getInt(3)).sorted.toSeq == Seq(0, 3, 6))
  }

  test("make_video assembles ordered frames into an AVI") {
    val frames = (0 until 4).map(i => (i, Images.solidPng(16, 8, 0x101010 * i)))
    val df = frames.toDF("pos", "frame")
    val vid = df.agg(Video.make_video(col("pos"), col("frame")).as("v"))
      .head().getAs[Array[Byte]]("v")
    val meta = Avi.readMeta(vid)
    assert(meta.frames == 4 && meta.width == 16 && meta.height == 8)
    assert(meta.fps == Video.DefaultFps.toDouble)
    assert(Avi.readFrames(vid).length == 4)
  }
}
