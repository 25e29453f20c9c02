package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier, ImageWriteParam}
import javax.imageio.metadata.IIOMetadataNode
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Container/codec breadth beyond PNG/JPEG/WAV: GIF (including animated),
  * BMP, TIFF, WBMP images and AIFF/AU audio — everything the headless JDK
  * ships, no external codec libs. Mirrors the reference's format-parameter
  * surfaces: `b64_encode(img, image_format)` / `Image.save` format handling
  * (`/root/reference/pixeltable/functions/image.py:28-36`), `Image.format`
  * metadata (`image.py:150`), the GIF side of frame iteration
  * (`functions/video/iterators.py:41-123` — same one-to-many shape as the
  * MJPEG-AVI `Video.frameIterator`), and audio `encode_audio`'s format
  * parameter (`functions/audio.py`).
  */
object Codecs {

  private val ImageFormats = Set("png", "jpeg", "gif", "bmp", "tiff", "wbmp", "webp")

  /** Re-encode image bytes into another container (PIL `save(format=...)`).
    * Formats without alpha (jpeg/bmp/wbmp) get flattened first; wbmp is
    * additionally 1-bit black/white.
    */
  private[graft] def reencodeImage(bytes: Array[Byte], format: String): Array[Byte] = {
    val f = format.toLowerCase
    require(ImageFormats(f), s"unsupported image format $f")
    val img = Images.decode(bytes)
    if (f == "webp") return Webp.encode { // VP8L lossless sink
      val argb = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_ARGB)
      val g = argb.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
      argb
    }
    val prepared = f match {
      case "jpeg" | "bmp" =>
        val out = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, java.awt.Color.BLACK, null)
        g.dispose()
        out
      case "wbmp" =>
        val out = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_BYTE_BINARY)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, java.awt.Color.BLACK, null)
        g.dispose()
        out
      case _ => img
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(prepared, f, bos), s"no writer for $f")
    bos.toByteArray
  }

  /** Container format of image bytes (PIL `Image.format`, lowercased). */
  private[graft] def imageFormatOf(bytes: Array[Byte]): String = {
    if (Webp.isWebp(bytes)) return "webp" // ImageIO has no webp reader
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(in)
      require(readers.hasNext, "not a decodable image")
      readers.next().getFormatName.toLowerCase match {
        case "jpg" => "jpeg"
        case "tif" => "tiff"
        case other => other
      }
    } finally in.close()
  }

  // ---- animated GIF -----------------------------------------------------

  /** Decode an (animated) GIF into fully-composited frames with their
    * per-frame delays. Frames may be stored as partial regions at offsets;
    * compositing onto a persistent canvas reproduces what a viewer shows.
    */
  private[graft] def gifFrames(bytes: Array[Byte]): Seq[(Int, BufferedImage)] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(in, false)
      val n = reader.getNumImages(true)
      var canvas: BufferedImage = null
      (0 until n).map { i =>
        val frame = reader.read(i)
        val md = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[IIOMetadataNode]
        def node(name: String): Option[IIOMetadataNode] = {
          val list = md.getElementsByTagName(name)
          if (list.getLength == 0) None
          else Some(list.item(0).asInstanceOf[IIOMetadataNode])
        }
        val (x, y) = node("ImageDescriptor").map(d =>
          (d.getAttribute("imageLeftPosition").toInt,
            d.getAttribute("imageTopPosition").toInt)).getOrElse((0, 0))
        val delayCs = node("GraphicControlExtension")
          .map(_.getAttribute("delayTime").toInt).getOrElse(0)
        if (canvas == null)
          canvas = new BufferedImage(x + frame.getWidth, y + frame.getHeight,
            BufferedImage.TYPE_INT_ARGB)
        val g = canvas.createGraphics()
        g.drawImage(frame, x, y, null)
        g.dispose()
        val snapshot = new BufferedImage(canvas.getWidth, canvas.getHeight,
          BufferedImage.TYPE_INT_ARGB)
        val g2 = snapshot.createGraphics()
        g2.drawImage(canvas, 0, 0, null)
        g2.dispose()
        (delayCs * 10, snapshot) // centiseconds → ms
      }
    } finally { reader.dispose(); in.close() }
  }

  /** Encode frames into a looping animated GIF with a fixed frame delay. */
  private[graft] def makeAnimatedGif(frames: Seq[BufferedImage],
      delayMs: Int): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(out)
      val param = writer.getDefaultWriteParam
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromBufferedImageType(
          BufferedImage.TYPE_INT_RGB), param)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def child(parent: IIOMetadataNode, name: String): IIOMetadataNode = {
        val list = parent.getElementsByTagName(name)
        if (list.getLength > 0) list.item(0).asInstanceOf[IIOMetadataNode]
        else { val n = new IIOMetadataNode(name); parent.appendChild(n); n }
      }
      val gce = child(root, "GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", (delayMs / 10).toString)
      gce.setAttribute("transparentColorIndex", "0")
      // NETSCAPE application extension: loop forever
      val apps = child(root, "ApplicationExtensions")
      val app = new IIOMetadataNode("ApplicationExtension")
      app.setAttribute("applicationID", "NETSCAPE")
      app.setAttribute("authenticationCode", "2.0")
      app.setUserObject(Array[Byte](1, 0, 0))
      apps.appendChild(app)
      meta.setFromTree(fmt, root)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        val rgb = new BufferedImage(f.getWidth, f.getHeight,
          BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics()
        g.drawImage(f, 0, 0, java.awt.Color.BLACK, null)
        g.dispose()
        writer.writeToSequence(new IIOImage(rgb, null, meta), param)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  // ---- multi-page TIFF --------------------------------------------------

  /** Encode pages into one multi-page TIFF (the binary-container analog of
    * the document splitter's page mode — one file, N addressable pages).
    */
  private[graft] def makeMultipageTiff(pages: Seq[BufferedImage]): Array[Byte] = {
    require(pages.nonEmpty, "no pages")
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      pages.foreach(p => writer.writeToSequence(new IIOImage(p, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  /** Decode every page of a multi-page TIFF. */
  private[graft] def tiffPages(bytes: Array[Byte]): Seq[BufferedImage] = {
    val reader = ImageIO.getImageReadersByFormatName("tiff").next()
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(in, false)
      (0 until reader.getNumImages(true)).map(reader.read)
    } finally { reader.dispose(); in.close() }
  }

  private val tiffPagesUdf = udf((b: Array[Byte]) =>
    tiffPages(b).zipWithIndex.map { case (img, i) =>
      (i, img.getWidth, img.getHeight, Images.encodePng(img)) })
  private val makeTiffUdf = udf((pages: Seq[Array[Byte]]) =>
    makeMultipageTiff(pages.map(Images.decode)))

  /** build a multi-page TIFF from an array of image payloads */
  def makeTiff(pages: Column): Column = makeTiffUdf(pages)

  /** One row per TIFF page (the document page-iterator shape on a real
    * binary container): appends page_idx, page_w, page_h, page_png.
    */
  def tiffPageIterator(df: DataFrame, binaryCol: String): DataFrame = {
    val exploded = df.select((df.columns.map(col) :+
      posexplode(tiffPagesUdf(col(binaryCol)).cast(
        "array<struct<page_idx:int,page_w:int,page_h:int,png:binary>>"))
        .as(Seq("_pos", "_p"))): _*)
    exploded.select((df.columns.map(col) :+
      col("_p.page_idx").as("page_idx") :+
      col("_p.page_w").as("page_w") :+
      col("_p.page_h").as("page_h") :+
      col("_p.png").as("page_png")): _*)
  }

  // ---- audio containers -------------------------------------------------

  private val AudioTypes = Map(
    "wav" -> AudioFileFormat.Type.WAVE,
    "aiff" -> AudioFileFormat.Type.AIFF,
    "au" -> AudioFileFormat.Type.AU)

  /** Transcode audio bytes between WAV/AIFF/AU containers (reference
    * `encode_audio(format=...)`). PCM payload is preserved bit-exactly;
    * only the container (and its endianness convention) changes.
    */
  private[graft] def transcodeAudio(bytes: Array[Byte], format: String): Array[Byte] = {
    val f = format.toLowerCase
    val t = AudioTypes.getOrElse(f,
      throw new IllegalArgumentException(s"unsupported audio format $f"))
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      // AIFF is big-endian, WAV/AU little/big — convert the PCM encoding to
      // the target's native byte order so the writer accepts it
      val src = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        src.getEncoding, src.getSampleRate, src.getSampleSizeInBits,
        src.getChannels, src.getFrameSize, src.getFrameRate,
        f != "wav") // bigEndian for aiff/au
      val conv = AudioSystem.getAudioInputStream(target, in)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(conv, t, bos)
      bos.toByteArray
    } finally in.close()
  }

  // ---- Column surface ---------------------------------------------------

  private val reencodeUdf = udf(reencodeImage _)
  private val formatUdf = udf(imageFormatOf _)
  private val gifUdf = udf((b: Array[Byte]) =>
    gifFrames(b).zipWithIndex.map { case ((delay, img), i) =>
      (i, delay, Images.encodePng(img))
    })
  private val makeGifUdf = udf((frames: Seq[Array[Byte]], delayMs: Int) =>
    makeAnimatedGif(frames.map(Images.decode), delayMs))
  private val audioUdf = udf(transcodeAudio _)

  private val synthGifUdf = udf((n: Int, w: Int, h: Int, delayMs: Int) =>
    makeAnimatedGif((1 to n).map { i =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color((i * 40 % 255) * 0x10101))
      g.fillRect(0, 0, w, h)
      g.dispose()
      img
    }, delayMs))

  /** deterministic n-frame looping GIF — test/demo media source (the GIF
    * twin of `Images.solidPng` / `Video.synthClip`)
    */
  def synthGif(n: Column, w: Column, h: Column, delayMs: Int): Column =
    synthGifUdf(n, w, h, lit(delayMs))

  /** `reencode(img_bytes, 'gif'|'bmp'|'tiff'|…)` */
  def reencode(c: Column, format: String): Column = reencodeUdf(c, lit(format))

  /** container format of the image payload (PIL `Image.format`) */
  def imageFormat(c: Column): Column = formatUdf(c)

  /** frames of an animated GIF → array<struct<frame_idx,delay_ms,png>> */
  def gifFrameArray(c: Column): Column = gifUdf(c)
    .cast("array<struct<frame_idx:int,delay_ms:int,png:binary>>")

  /** build a looping animated GIF from an array of image payloads */
  def makeGif(frames: Column, delayMs: Int): Column =
    makeGifUdf(frames, lit(delayMs))

  /** transcode audio payload into 'wav' | 'aiff' | 'au' */
  def audioTranscode(c: Column, format: String): Column =
    audioUdf(c, lit(format))

  /** One row per GIF frame (the frame_iterator shape on the GIF container):
    * appends frame_idx, delay_ms, frame_png.
    */
  def gifFrameIterator(df: DataFrame, binaryCol: String): DataFrame = {
    val exploded = df.select((df.columns.map(col) :+
      posexplode(gifFrameArray(col(binaryCol))).as(Seq("_pos", "_f"))): _*)
    exploded.select((df.columns.map(col) :+
      col("_f.frame_idx").as("frame_idx") :+
      col("_f.delay_ms").as("delay_ms") :+
      col("_f.png").as("frame_png")): _*)
  }
}
