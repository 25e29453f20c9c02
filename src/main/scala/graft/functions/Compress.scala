package graft.functions

import org.apache.spark.sql.functions.udf

/** Per-cell compression codecs for binary document payloads — real
  * corpora ship documents gzip/zstd-compressed inside parquet binary
  * columns (WARC-derived crawls, compressed JSONL shards), and the
  * reference reads them through Python's stdlib/av stack. All four
  * codecs ride libraries Spark already bundles (java.util.zip,
  * zstd-jni, lz4-java, snappy-java) — zero new dependencies.
  *
  * `documentToText`'s magic dispatch (Office.scala) decompresses
  * gzip/zstd payloads transparently before format sniffing, so a mixed
  * compressed corpus chunks with no per-row routing.
  */
object Compress {

  def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  def gunzip(data: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(data))
    try in.readAllBytes() finally in.close()
  }

  def zstd(data: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, level)

  def unzstd(data: Array[Byte]): Array[Byte] = {
    val size = com.github.luben.zstd.Zstd.getFrameContentSize(data)
    require(size >= 0 && size <= Int.MaxValue,
      s"zstd frame without usable content size: $size")
    com.github.luben.zstd.Zstd.decompress(data, size.toInt)
  }

  def lz4(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  def unlz4(data: Array[Byte]): Array[Byte] = {
    val in = new net.jpountz.lz4.LZ4FrameInputStream(
      new java.io.ByteArrayInputStream(data))
    try in.readAllBytes() finally in.close()
  }

  def snappy(data: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(data)

  def unsnappy(data: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.uncompress(data)

  /** Sniff-decompress: gzip (1f 8b), zstd (28 b5 2f fd) and lz4 frame
    * (04 22 4d 18) magics unwrap; anything else passes through. Applied
    * repeatedly (a .md.gz inside nothing else) but bounded to a few
    * layers so corrupt data can't loop.
    */
  def decompressAuto(data: Array[Byte]): Array[Byte] = {
    var cur = data
    var depth = 0
    while (depth < 4 && cur.length >= 4) {
      val unwrapped =
        if ((cur(0) & 0xff) == 0x1f && (cur(1) & 0xff) == 0x8b) gunzip(cur)
        else if ((cur(0) & 0xff) == 0x28 && (cur(1) & 0xff) == 0xb5 &&
          (cur(2) & 0xff) == 0x2f && (cur(3) & 0xff) == 0xfd) unzstd(cur)
        else if ((cur(0) & 0xff) == 0x04 && (cur(1) & 0xff) == 0x22 &&
          (cur(2) & 0xff) == 0x4d && (cur(3) & 0xff) == 0x18) unlz4(cur)
        else return cur
      cur = unwrapped
      depth += 1
    }
    cur
  }

  // ---------------- Spark surface ----------------

  val gzipCompress = udf { (b: Array[Byte]) => if (b == null) null else gzip(b) }
  val gzipDecompress = udf { (b: Array[Byte]) => if (b == null) null else gunzip(b) }
  val zstdCompress = udf { (b: Array[Byte], level: Int) =>
    if (b == null) null else zstd(b, level) }
  val zstdDecompress = udf { (b: Array[Byte]) => if (b == null) null else unzstd(b) }
  val lz4Compress = udf { (b: Array[Byte]) => if (b == null) null else lz4(b) }
  val lz4Decompress = udf { (b: Array[Byte]) => if (b == null) null else unlz4(b) }
  val snappyCompress = udf { (b: Array[Byte]) => if (b == null) null else snappy(b) }
  val snappyDecompress = udf { (b: Array[Byte]) =>
    if (b == null) null else unsnappy(b) }
  val decompressAny = udf { (b: Array[Byte]) =>
    if (b == null) null else decompressAuto(b) }
}
