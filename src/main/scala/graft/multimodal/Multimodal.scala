package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media values are opaque `binary` payloads (or
  * URIs) plus a typed metadata struct with per-cell error capture — the
  * Spark mapping of the reference's media types + cellmd pseudo-columns
  * (`/root/reference/pixeltable/type_system.py:1624-1817`,
  * `exprs/column_property_ref.py:24-29`).
  *
  * The decode kernels are STUBS (deterministic fakes derived from the
  * payload bytes) because no image/audio codecs ship in this container —
  * the Spark-side contract is real and tested: schema, mapPartitions
  * batching, error capture into the metadata struct rather than task
  * failure, and one-to-many frame expansion.
  */
object Multimodal {

  /** metadata struct: reference cellmd (errortype/errormsg) + media props */
  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mode", StringType),
    StructField("errortype", StringType),
    StructField("errormsg", StringType),
  ))

  /** Real image decode via the JDK's headless javax.imageio (see
    * `graft.functions.Images` for the full op family). Decode failures are
    * captured per cell by `withImageMeta`.
    */
  private[multimodal] def decodeImage(bytes: Array[Byte]): (Int, Int, String) = {
    val img = graft.functions.Images.decode(bytes)
    (img.getWidth, img.getHeight, graft.functions.Images.mode(img))
  }

  /** Attach decoded metadata for a binary media column. Runs as a
    * mapPartitions pass (one JVM call per partition, not per row); decode
    * failures land in the struct's errortype/errormsg — the reference's
    * on_error='ignore' cell-level capture — instead of failing the task.
    */
  def withImageMeta(df: DataFrame, binaryCol: String, metaCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(metaCol, imageMetaType))
    val idx = df.schema.fieldIndex(binaryCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta =
          try {
            val (w, h, m) = decodeImage(r.getAs[Array[Byte]](idx))
            Row(w, h, m, null, null)
          } catch {
            case e: Exception => Row(null, null, null, e.getClass.getSimpleName, e.getMessage)
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  // ---------- media file references (reference media types are file URI +
  // cache: `type_system.py:1734-1817`, `exec/cache_prefetch_node.py`;
  // column properties fileurl/localpath: `exprs/column_property_ref.py`) ----

  /** result struct for a URI fetch: payload or per-cell error */
  val mediaFetchType: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("errortype", StringType),
    StructField("errormsg", StringType),
  ))

  /** `col.fileurl` (reference ColumnPropertyRef FILEURL): for URI-backed
    * media columns the property IS the stored URI.
    */
  def fileurl(uriCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = uriCol

  /** Fetch URI-referenced media bytes ON THE EXECUTORS — each partition
    * opens its own Hadoop FileSystem (file://, hdfs://, s3a://… resolve the
    * same way), so 100 TB of media streams scan-side and never routes
    * through the driver. Failures (missing file, bad scheme) land in the
    * struct's errortype/errormsg, not as task failures.
    */
  def fetchMedia(df: DataFrame, uriCol: String, outCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, mediaFetchType))
    val idx = df.schema.fieldIndex(uriCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val conf = new org.apache.hadoop.conf.Configuration()
      rows.map { r =>
        val cell =
          try {
            val p = new org.apache.hadoop.fs.Path(new java.net.URI(r.getString(idx)))
            val fs = p.getFileSystem(conf)
            val in = fs.open(p)
            try {
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](64 * 1024)
              var n = in.read(buf)
              while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
              Row(bos.toByteArray, null, null)
            } finally in.close()
          } catch {
            case e: Exception =>
              Row(null, e.getClass.getSimpleName, e.getMessage)
          }
        Row.fromSeq(r.toSeq :+ cell)
      }
    }(enc)
  }

  /** `col.localpath` (reference ColumnPropertyRef LOCALPATH) via the
    * CachePrefetchNode pattern: remote URIs are downloaded into the
    * executor-local [[FileCache]] — a size-budgeted LRU keyed by sha256(uri)
    * with lease-protected eviction, mirroring the reference's
    * `utils/filecache.py` — concurrently, batch-ahead, with per-cell error
    * capture (riding `AsyncBatcher`'s bounded in-flight window). Local
    * file:// URIs short-circuit to their own path (no copy, never cached),
    * exactly like the reference. Appends `<outCol>` and `<outCol>_errormsg`.
    *
    * `tblId`/`colId` tag the cache entries for per-column stats and
    * table-scoped `clear` (defaults for plain DataFrames outside the catalog).
    */
  def withLocalPath(df: DataFrame, uriCol: String, outCol: String,
      cacheDir: String, tblId: String = FileCache.AnonTableId,
      colId: Int = 0): DataFrame = {
    // budget/lease resolve from the session conf ON THE DRIVER and ship in
    // the closure, so a cluster deploy sets one conf and every executor's
    // cache obeys it (the reference's file_cache_size_g config knob)
    val conf = df.sparkSession.conf
    val capacity = conf.getOption("spark.graft.fileCache.capacityBytes").map(_.toLong)
    val lease = conf.getOption("spark.graft.fileCache.leaseSeconds").map(_.toDouble)
    graft.operators.AsyncBatcher.mapColumn(df, uriCol, outCol,
      uris => {
        val fc = FileCache.forDir(cacheDir)
        capacity.foreach(fc.setCapacity)
        lease.foreach(fc.setLeaseSeconds)
        uris.map { uri =>
          val u = new java.net.URI(uri)
          if (u.getScheme == null || u.getScheme == "file") {
            val p = java.nio.file.Paths.get(
              if (u.getScheme == null) uri else u.getPath)
            if (!java.nio.file.Files.exists(p))
              throw new java.io.FileNotFoundException(uri)
            p.toString
          } else fc.lookup(uri) match {
            case Some(p) => p.toString // cache hit → no refetch, lease renewed
            case None =>
              val tmp = fetchToTemp(u, fc.dir)
              try fc.add(tblId, colId, uri, tmp).toString
              catch { case e: Throwable =>
                // add() failed before moving tmp into the cache (e.g.
                // FILE_CACHE_FULL in ensureCapacity): the '.fetch….part'
                // name is invisible to scans/clear/budget, so leaving it
                // would leak disk outside the budget on every retry
                java.nio.file.Files.deleteIfExists(tmp)
                throw e
              }
          }
        }
      },
      // batchSize=1: fetches are per-file (so errors capture per cell),
      // concurrent up to maxConcurrent — the CachePrefetchNode shape
      graft.operators.AsyncBatcher.Config(batchSize = 1, maxConcurrent = 4,
        maxRetries = 0))
  }

  /** Download a remote URI to a fresh temp file in `dir` (named so the cache's
    * directory scan ignores it), preserving the URL path's extension. http(s)
    * goes through the JDK HTTP client; every other scheme (hdfs://, s3a://…)
    * through Hadoop FileSystem.
    */
  private def fetchToTemp(u: java.net.URI, dir: java.nio.file.Path): java.nio.file.Path = {
    val path = Option(u.getPath).getOrElse("")
    val seg = path.substring(path.lastIndexOf('/') + 1)
    val dot = seg.lastIndexOf('.')
    val ext = if (dot >= 0 && seg.length - dot <= 9) seg.substring(dot) else ""
    val tmp = java.nio.file.Files.createTempFile(dir, ".fetch", ext + ".part")
    // the ".part" suffix keeps a half-written file from ever matching the
    // cache-entry name pattern; rename to the ext-bearing name when complete
    val done = tmp.resolveSibling(
      tmp.getFileName.toString.stripSuffix(".part") match {
        case n if ext.nonEmpty => n
        case n                 => n + ".bin"
      })
    try {
      val in = u.getScheme match {
        case "http" | "https" =>
          val conn = u.toURL.openConnection()
          conn.setConnectTimeout(10000); conn.setReadTimeout(60000)
          conn.getInputStream
        case _ =>
          val p = new org.apache.hadoop.fs.Path(u)
          p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
      }
      try java.nio.file.Files.copy(in, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      java.nio.file.Files.move(tmp, done,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      done
    } catch {
      case e: Exception =>
        java.nio.file.Files.deleteIfExists(tmp)
        throw e
    }
  }

  /** ObjectStoreSaveNode analog (reference
    * `exec/object_store_save_node.py:21-33`: move each row's media files to
    * destination stores, rewrite the cell to the destination URL): saves a
    * binary column's cells to `destDir` ON THE EXECUTORS via Hadoop FS (so
    * file://, hdfs://, s3a:// destinations all work and bytes never route
    * through the driver), appending `<outCol>` = destination URL plus
    * `<outCol>_errormsg` for per-cell failures (reference on_error=ignore).
    *
    * Object names are md5(bytes)+ext — content-addressed, so re-saving is
    * idempotent and concurrent writers of identical cells can't conflict.
    */
  def saveMedia(df: DataFrame, binaryCol: String, destDir: String,
      ext: String = "bin"): DataFrame = {
    val outCol = binaryCol + "_url"
    val schema = StructType(df.schema.fields :+
      StructField(outCol, StringType) :+
      StructField(outCol + "_errormsg", StringType))
    val idx = df.schema.fieldIndex(binaryCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val base = new org.apache.hadoop.fs.Path(destDir)
      val fs = base.getFileSystem(conf)
      fs.mkdirs(base)
      rows.map { r =>
        val (url, err) =
          if (r.isNullAt(idx)) (null, null)
          else try {
            val bytes = r.getAs[Array[Byte]](idx)
            val digest = java.security.MessageDigest.getInstance("MD5")
              .digest(bytes).map("%02x".format(_)).mkString
            val target = new org.apache.hadoop.fs.Path(base, s"$digest.$ext")
            if (!fs.exists(target)) { // content-addressed: skip identical
              val tmp = new org.apache.hadoop.fs.Path(base,
                s"_tmp-$digest-${java.util.UUID.randomUUID()}.$ext")
              val out = fs.create(tmp, false)
              try out.write(bytes) finally out.close()
              if (!fs.rename(tmp, target)) { // lost a race: ours is a dup
                fs.delete(tmp, false)
                if (!fs.exists(target))
                  throw new java.io.IOException(s"rename to $target failed")
              }
            }
            (fs.makeQualified(target).toUri.toString, null)
          } catch {
            case e: Exception => (null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        Row.fromSeq(r.toSeq :+ url :+ err)
      }
    }(enc)
  }

  /** STUB frame sampling: one-to-many expansion of a binary "video" payload
    * into n fixed-size frame slices with frame index — the dataflow shape of
    * the reference's frame_iterator component views. SUPERSEDED by the real
    * container codec in `graft.functions.Video.frameIterator` (MJPEG-AVI);
    * kept as the format-agnostic fallback shape.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, nFrames: Int): DataFrame = {
    val frames = transform(sequence(lit(0), lit(nFrames - 1)), i =>
      struct(i.as("frame_idx"),
        substring(col(binaryCol), i * 8 + 1, lit(8)).as("frame_bytes")))
    df.select((df.columns.map(col) :+
      posexplode(frames).as(Seq("_pos", "frame")): _*))
      .select((df.columns.map(col) :+ col("_pos") :+
        col("frame.frame_idx").as("frame_idx") :+
        col("frame.frame_bytes").as("frame_bytes")): _*)
  }
}
