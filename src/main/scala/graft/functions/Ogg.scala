package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Ogg container page framing (RFC 3533) with Opus (RFC 7845 OpusHead)
  * and Vorbis (identification header) stream detection — the
  * crawl-common audio family the reference reads through pyav
  * (`get_metadata` on any file, `functions/util.py:40-110`). Metadata is
  * a page-header walk: granule positions give duration without touching
  * a single codec payload byte, so a 100 TB corpus scan stays header-only
  * (the MP4 moov / Matroska cluster-header discipline). Codec DECODE
  * (Opus/Vorbis) is adjudicated in COVERAGE; this surfaces identity,
  * geometry and timing, and hands the packet stream off.
  */
object Ogg {

  def isOgg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 && bytes(0) == 'O' &&
      bytes(1) == 'g' && bytes(2) == 'g' && bytes(3) == 'S'

  /** One page header: (headerType, granule, serial, seq, payloadFrom,
    * payloadUntil).
    */
  final case class Page(headerType: Int, granule: Long, serial: Long,
      seq: Long, payloadFrom: Int, payloadUntil: Int)

  /** Header-only page walk — skips payloads via the segment table.
    * Corrupt headers end the walk (partial results).
    */
  def pages(bytes: Array[Byte]): Seq[Page] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Page]
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 0
    while (pos + 27 <= bytes.length) {
      if (!(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
        bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S' &&
        bytes(pos + 4) == 0)) return out.toSeq
      val headerType = bytes(pos + 5) & 0xff
      val granule = b.getLong(pos + 6)
      val serial = b.getInt(pos + 14).toLong & 0xffffffffL
      val seq = b.getInt(pos + 18).toLong & 0xffffffffL
      val nSegs = bytes(pos + 26) & 0xff
      if (pos + 27 + nSegs > bytes.length) return out.toSeq
      var payload = 0
      var i = 0
      while (i < nSegs) { payload += bytes(pos + 27 + i) & 0xff; i += 1 }
      val from = pos + 27 + nSegs
      if (from + payload > bytes.length) return out.toSeq
      out += Page(headerType, granule, serial, seq, from, from + payload)
      pos = from + payload
    }
    out.toSeq
  }

  /** (codec, channels, sampleRate, granuleRate, preSkip) from a BOS
    * page's first packet bytes — OpusHead (RFC 7845 §5.1; granules run
    * at 48 kHz regardless of input rate) or the Vorbis identification
    * header (`vorbis`).
    */
  private def identify(bytes: Array[Byte], p: Page):
      Option[(String, Int, Int, Int, Int)] = {
    val len = p.payloadUntil - p.payloadFrom
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (len >= 19 &&
      new String(bytes, p.payloadFrom, 8, "US-ASCII") == "OpusHead") {
      val ch = bytes(p.payloadFrom + 9) & 0xff
      val preSkip = b.getShort(p.payloadFrom + 10) & 0xffff
      val rate = b.getInt(p.payloadFrom + 12)
      Some(("opus", ch, rate, 48000, preSkip))
    } else if (len >= 30 && (bytes(p.payloadFrom) & 0xff) == 1 &&
      new String(bytes, p.payloadFrom + 1, 6, "US-ASCII") == "vorbis") {
      val ch = bytes(p.payloadFrom + 11) & 0xff
      val rate = b.getInt(p.payloadFrom + 12)
      Some(("vorbis", ch, rate, rate, 0))
    } else None
  }

  /** Stream identity + timing: codec, channels, declared sample rate,
    * total samples (last granule − preskip at the granule rate),
    * duration in seconds, page count.
    */
  final case class OggMeta(codec: String, channels: Int, sampleRate: Int,
      totalSamples: Long, durationS: Double, nPages: Int)

  def readMeta(bytes: Array[Byte]): OggMeta = {
    require(isOgg(bytes), "not an Ogg payload")
    val ps = pages(bytes)
    require(ps.nonEmpty, "no Ogg pages (truncated)")
    val bos = ps.find(p => (p.headerType & 0x02) != 0).getOrElse(ps.head)
    val (codec, ch, rate, granuleRate, preSkip) =
      identify(bytes, bos).getOrElse(("unknown", 0, 0, 48000, 0))
    val stream = ps.filter(_.serial == bos.serial)
    // granule −1 marks a page with no completed packet — skip those
    val lastGranule = stream.map(_.granule).filter(_ >= 0)
      .foldLeft(0L)(math.max)
    val total = math.max(lastGranule - preSkip, 0L)
    OggMeta(codec, ch, rate, total,
      if (granuleRate > 0) total.toDouble / granuleRate else 0.0,
      stream.length)
  }

  /** Friendly-named tags from the comment header packet — `OpusTags`
    * (RFC 7845 §5.2) or the Vorbis comment header (`vorbis`),
    * both carrying the shared Xiph comment struct. The comment packet
    * lives on the granule-0 pages after BOS; absent → empty.
    */
  def readTags(bytes: Array[Byte]): Seq[(String, String)] = {
    val ps = pages(bytes)
    if (ps.isEmpty) return Seq.empty
    val bos = ps.find(p => (p.headerType & 0x02) != 0).getOrElse(ps.head)
    ps.filter(p => p.serial == bos.serial && p.granule == 0 &&
      (p.headerType & 0x02) == 0).flatMap { p =>
      val len = p.payloadUntil - p.payloadFrom
      if (len >= 8 &&
        new String(bytes, p.payloadFrom, 8, "US-ASCII") == "OpusTags")
        VorbisComments.parse(bytes, p.payloadFrom + 8, p.payloadUntil)
      else if (len >= 7 && (bytes(p.payloadFrom) & 0xff) == 3 &&
        new String(bytes, p.payloadFrom + 1, 6, "US-ASCII") == "vorbis")
        VorbisComments.parse(bytes, p.payloadFrom + 7, p.payloadUntil)
      else Seq.empty
    }
  }

  /** Concatenated packet payload bytes of the identified stream past
    * the two header packets' pages — the codec hand-off twin of
    * `Mp4.extractAudioStream` (Opus/Vorbis decode is adjudicated).
    */
  def extractPackets(bytes: Array[Byte]): (String, Array[Byte]) = {
    val ps = pages(bytes)
    require(ps.nonEmpty, "no Ogg pages (truncated)")
    val bos = ps.find(p => (p.headerType & 0x02) != 0).getOrElse(ps.head)
    val codec = identify(bytes, bos).map(_._1).getOrElse("unknown")
    val out = new ByteArrayOutputStream()
    // header packets occupy the BOS page and (by convention) the pages
    // with granule 0 before audio; hand off everything with granule > 0
    ps.filter(p => p.serial == bos.serial && p.granule > 0)
      .foreach(p => out.write(bytes, p.payloadFrom, p.payloadUntil - p.payloadFrom))
    (codec, out.toByteArray)
  }

  /** Logical packets of the identified (BOS-serial) stream, split by the
    * segment-table lacing walk (RFC 3533 §5: a packet is a run of
    * segments ending with one < 255 bytes, continuing across pages when
    * a page ends on a 255 segment). This is the loss-free hand-off the
    * Vorbis decoder needs — `extractPackets` concatenates payloads and
    * drops boundaries. Corrupt headers end the walk (partial results).
    */
  def packetsOf(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var cur = new ByteArrayOutputStream()
    var serial = -1L
    var pos = 0
    while (pos + 27 <= bytes.length &&
      bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
      bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S' && bytes(pos + 4) == 0) {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val pSerial = b.getInt(pos + 14).toLong & 0xffffffffL
      val nSegs = bytes(pos + 26) & 0xff
      if (pos + 27 + nSegs > bytes.length) return out.toSeq
      if (serial < 0 && (bytes(pos + 5) & 0x02) != 0) serial = pSerial
      var segAt = pos + 27 + nSegs
      var i = 0
      var ok = true
      while (i < nSegs && ok) {
        val segLen = bytes(pos + 27 + i) & 0xff
        if (segAt + segLen > bytes.length) ok = false
        else {
          if (serial < 0 || pSerial == serial) {
            cur.write(bytes, segAt, segLen)
            if (segLen < 255) { out += cur.toByteArray; cur = new ByteArrayOutputStream() }
          }
          segAt += segLen
          i += 1
        }
      }
      if (!ok) return out.toSeq
      pos = segAt
    }
    out.toSeq
  }

  // --------------------------------------------------------------- writer

  /** Ogg page CRC-32: poly 0x04C11DB7, init 0, no reflection, no final
    * xor (RFC 3533 §6).
    */
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def crc(data: Array[Byte]): Int = {
    var r = 0
    var i = 0
    while (i < data.length) {
      r = (r << 8) ^ crcTable(((r >>> 24) ^ (data(i) & 0xff)) & 0xff)
      i += 1
    }
    r
  }

  private def page(headerType: Int, granule: Long, serial: Int, seq: Int,
      payload: Array[Byte]): Array[Byte] =
    pageOfPackets(headerType, granule, serial, seq, Seq(payload))

  /** One page carrying whole `packets` (each laced per RFC 3533 §5:
    * 255-segments then a final < 255 one). Multi-packet pages are how
    * Vorbis ships its comment + setup headers on one page.
    */
  private[functions] def pageOfPackets(headerType: Int, granule: Long,
      serial: Int, seq: Int, packets: Seq[Array[Byte]]): Array[Byte] = {
    val segTable = packets.flatMap { p =>
      val full = Array.fill(p.length / 255)(255.toByte)
      full :+ (p.length % 255).toByte
    }.toArray
    require(segTable.length <= 255, "page payload too large")
    val nSegs = segTable.length
    val payload = packets.toArray.flatten
    val head = ByteBuffer.allocate(27 + nSegs).order(ByteOrder.LITTLE_ENDIAN)
    head.put("OggS".getBytes("US-ASCII")).put(0.toByte)
      .put(headerType.toByte).putLong(granule).putInt(serial).putInt(seq)
      .putInt(0) // crc placeholder
      .put(nSegs.toByte).put(segTable)
    val full = head.array() ++ payload
    val c = crc(full)
    val out = full.clone()
    out(22) = (c & 0xff).toByte
    out(23) = ((c >> 8) & 0xff).toByte
    out(24) = ((c >> 16) & 0xff).toByte
    out(25) = ((c >> 24) & 0xff).toByte
    out
  }

  /** Synthetic but spec-conformant Ogg fixture: a real OpusHead or
    * Vorbis identification header on the BOS page (CRC'd per RFC 3533),
    * then `nPages` audio pages of junk payload whose granule positions
    * advance by `samplesPerPage` — enough structure for any
    * page-walking reader to report identity and timing.
    */
  def writeTestOgg(codec: String, channels: Int, sampleRate: Int,
      nPages: Int, samplesPerPage: Int, preSkip: Int = 0,
      tags: Seq[(String, String)] = Seq.empty): Array[Byte] = {
    val serial = 0x67726166 // 'graf'
    val header: Array[Byte] = codec match {
      case "opus" =>
        val b = ByteBuffer.allocate(19).order(ByteOrder.LITTLE_ENDIAN)
        b.put("OpusHead".getBytes("US-ASCII")).put(1.toByte)
          .put(channels.toByte).putShort(preSkip.toShort)
          .putInt(sampleRate).putShort(0.toShort).put(0.toByte)
        b.array()
      case "vorbis" =>
        val b = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte).put("vorbis".getBytes("US-ASCII")).putInt(0)
          .put(channels.toByte).putInt(sampleRate)
          .putInt(0).putInt(0).putInt(0).put(0xB8.toByte).put(1.toByte)
        b.array()
      case other => sys.error(s"unsupported test codec $other")
    }
    // comment header packet: OpusTags (RFC 7845 §5.2) or the type-3
    // vorbis comment header (with its trailing framing bit)
    val comment: Array[Byte] = codec match {
      case "opus" =>
        "OpusTags".getBytes("US-ASCII") ++ VorbisComments.write(tags)
      case _ =>
        Array[Byte](3) ++ "vorbis".getBytes("US-ASCII") ++
          VorbisComments.write(tags) ++ Array[Byte](1)
    }
    val out = new ByteArrayOutputStream()
    out.write(page(0x02, 0L, serial, 0, header)) // BOS, no audio yet
    out.write(page(0x00, 0L, serial, 1, comment)) // header packets end here
    val rnd = new scala.util.Random(serial)
    (1 to nPages).foreach { i =>
      val payload = Array.fill((samplesPerPage / 16 + 8).min(4000))(
        rnd.nextInt(256).toByte)
      val granule = preSkip.toLong + i.toLong * samplesPerPage
      out.write(page(if (i == nPages) 0x04 else 0x00, granule, serial, i + 1,
        payload))
    }
    out.toByteArray
  }
}
