package graft.io

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset tar-shard IO — the sharded `(key.ext → payload)` tar layout
  * PyTorch multimodal training loaders stream (webdataset/webdataset,
  * public format: plain POSIX tar, samples = consecutive entries sharing
  * a key stem; the reference's export surface stops at parquet shards,
  * `io/pandas.py` / `exportShards` — this is the training-loader-native
  * sibling).
  *
  * Scale shape: export repartitions by key and writes ONE tar per
  * partition from the executors (`foreachPartition` streaming, no driver
  * data); import reads `binaryFile` rows (each task parses its own
  * shards) and explodes entries map-side. Shard size is bounded by the
  * partition count the caller picks, exactly like parquet shard sizing.
  *
  * Pure-JVM ustar: 512-byte headers (octal size, checksum-over-spaces),
  * content zero-padded to block size, two zero blocks at EOF. No
  * compression (webdataset convention is uncompressed tar for seekable
  * streaming; wrap entries in zstd/gzip payloads upstream if wanted).
  */
object WebDataset {

  private val Block = 512

  private def headerFor(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length <= 100, s"tar entry name too long: $name")
    val h = new Array[Byte](Block)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(padded.getBytes(UTF_8), 0, h, off, len - 1)
      h(off + len - 1) = 0
    }
    octal(420, 100, 8) // mode 0644
    octal(0, 108, 8) // uid
    octal(0, 116, 8) // gid
    octal(size, 124, 12)
    octal(0, 136, 12) // mtime: epoch, deterministic output
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces
    h(156) = '0' // regular file
    System.arraycopy("ustar".getBytes(UTF_8), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    val sum = h.map(_ & 0xff).sum
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csPad.getBytes(UTF_8), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  /** Write `(name, bytes)` entries as one tar byte stream. */
  private[io] def writeTar(entries: Iterator[(String, Array[Byte])],
      out: java.io.OutputStream): Unit = {
    entries.foreach { case (name, bytes) =>
      out.write(headerFor(name, bytes.length.toLong))
      out.write(bytes)
      val pad = (Block - bytes.length % Block) % Block
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * Block))
  }

  /** Parse a tar byte array into `(name, bytes)` entries. */
  private[io] def readTar(tar: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + Block <= tar.length) {
      val name = {
        var e = off
        while (e < off + 100 && tar(e) != 0) e += 1
        new String(tar, off, e - off, UTF_8)
      }
      if (name.isEmpty) { off = tar.length } // zero block → EOF
      else {
        val sizeStr = new String(tar, off + 124, 12, UTF_8)
          .dropWhile(_ == ' ').takeWhile(c => c >= '0' && c <= '7')
        val size = if (sizeStr.isEmpty) 0L
          else java.lang.Long.parseLong(sizeStr, 8)
        val typeflag = tar(off + 156)
        val dataOff = off + Block
        if ((typeflag == '0' || typeflag == 0) && dataOff + size <= tar.length)
          out += name -> java.util.Arrays.copyOfRange(
            tar, dataOff, (dataOff + size).toInt)
        // a corrupt size field must not overflow Int or stall the scan —
        // advance monotonically or stop
        val next = dataOff.toLong + (size + Block - 1) / Block * Block
        off = if (next <= off || next > tar.length.toLong) tar.length
          else next.toInt
      }
    }
    out.result()
  }

  /** Export: each row becomes one SAMPLE — `keyCol` is the stem, every
    * other column an entry `stem.column` (binary columns raw, everything
    * else UTF-8 of its string form; null columns are skipped). Writes
    * `shard-NNNNN.tar` files, one per partition, from the executors.
    * Returns the shard count.
    */
  def exportWebDataset(df: DataFrame, dir: String, keyCol: String,
      numShards: Int = 0): Int = {
    val out = new File(dir)
    out.mkdirs()
    val shards =
      if (numShards > 0) numShards
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val cols = df.columns.filter(_ != keyCol)
    val schema = df.schema
    val binary = cols.filter(c =>
      schema(c).dataType == org.apache.spark.sql.types.BinaryType).toSet
    // key-repartitioned so a sample's entries stay adjacent in one shard;
    // each task returns only its (shard, entries, bytes) stat row
    val statsEnc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    val stats = df.repartition(shards, col(keyCol))
      .sortWithinPartitions(keyCol)
      .mapPartitions { (rows: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var n = 0L
        val entries = rows.flatMap { r =>
          val stem = String.valueOf(r.getAs[Any](keyCol))
          cols.flatMap { c =>
            Option(r.getAs[Any](c)).map { v =>
              val bytes =
                if (binary(c)) v.asInstanceOf[Array[Byte]]
                else String.valueOf(v).getBytes(UTF_8)
              n += 1
              s"$stem.$c" -> bytes
            }
          }
        }
        if (entries.hasNext) {
          val f = new File(out, f"shard-$pid%05d.tar")
          val os = new java.io.BufferedOutputStream(new FileOutputStream(f))
          try writeTar(entries, os) finally os.close()
          Iterator.single((f.getName, n, f.length()))
        } else Iterator.empty
      }(statsEnc)
      .collect().sortBy(_._1)
    // loader-side shard manifest (webdataset convention: a shard list
    // with sizes so loaders plan splits without opening tars) — only this
    // KB-scale summary ever reaches the driver
    val manifest = stats.map { case (name, n, bytes) =>
      s"""{"shard":"$name","entries":$n,"bytes":$bytes}"""
    }.mkString("[\n", ",\n", "\n]")
    java.nio.file.Files.writeString(
      new File(out, "_shards.json").toPath, manifest)
    stats.length
  }

  /** Import: long format `(shard, key, ext, content)` — one row per tar
    * entry, parsed task-side from `binaryFile` rows (no driver data).
    */
  def importWebDataset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, tar) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        readTar(tar).map { case (name, bytes) =>
          val dot = name.lastIndexOf('.')
          val (key, ext) =
            if (dot < 0) (name, "") else (name.take(dot), name.drop(dot + 1))
          (shard, key, ext, bytes)
        }
      }
      .toDF("shard", "key", "ext", "content")
  }

  /** Import pivoted wide: one row per sample key, one binary column per
    * extension (the loader-side sample shape).
    */
  def importWebDatasetWide(spark: SparkSession, dir: String): DataFrame = {
    val long = importWebDataset(spark, dir)
    val exts = long.select("ext").distinct()
      .collect().map(_.getString(0)).sorted // bounded: distinct extensions
    long.groupBy(col("key")).pivot("ext", exts.toSeq)
      .agg(first(col("content")))
  }
}
