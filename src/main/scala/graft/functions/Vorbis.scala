package graft.functions

/** Vorbis I PCM decode (Xiph.Org Vorbis I specification) — the first
  * COMPRESSED crawl-audio family with end-to-end waveforms. Unlike MP3
  * (whose ~2,000 Huffman entries are non-generative transcribed tables,
  * adjudicated out in COVERAGE), every Vorbis codebook, floor and
  * residue configuration travels INSIDE the stream's setup header, so a
  * zero-egress decoder needs only generative math: the canonical
  * Huffman codeword assignment (spec §3.2.1, pinned against the spec's
  * own worked example), the floor dB table 10^(-7·(255-i)/256) (§7.2.2,
  * table[255] = 1 exactly), the window sin(π/2·sin²(π(i+0.5)/n)) (§4.3.9)
  * and the type-IV MDCT basis cos(π/(2n)·(2j+1+n/2)·(2k+1)) (§4.3.6).
  *
  * Decode surfaces (reference decodes via pyav:
  * `/root/reference/pixeltable/functions/audio.py`,
  * `functions/video/iterators.py:41-123`):
  *   - `decodeOgg`   — Ogg/Vorbis (RFC 3533 pages → packets → PCM)
  *   - `Mkv.vorbisPackets` + `decode` — WebM/Matroska-carried Vorbis
  * wired into `Audio.decodePcm`, so `audio_splitter`, waveform ops and
  * whisper transcription run on compressed crawl audio.
  *
  * The encoder twin (`encodePackets` / `encodePcm`) emits minimal but
  * fully spec-conformant streams — real codebooks with complete prefix
  * codes, a floor1 whose rendered curve is EXACTLY 1.0 (Y=255 at both
  * range endpoints), residue type 2 with a zero-cascade class for
  * silence partitions, and square-polar coupling for stereo — the
  * q167/q180 mux-twin pattern. Scale shape: decode is map-only per
  * document; header metadata walks stay page/EBML-header-only.
  */
object Vorbis {

  // ------------------------------------------------------------ bits

  /** LSB-first bit reader (spec §2: the first bit of a byte is its
    * LSB). End-of-packet is a legal decode-stop condition (§3.1):
    * reads past the end return 0 with `eof` latched.
    */
  final class BitReader(bytes: Array[Byte], from: Int, until: Int) {
    def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)
    private var bitPos = from.toLong * 8
    private val bitEnd = until.toLong * 8
    var eof = false
    def readBit(): Int = {
      if (bitPos >= bitEnd) { eof = true; return 0 }
      val b = (bytes((bitPos >> 3).toInt) >> (bitPos & 7).toInt) & 1
      bitPos += 1
      b
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= readBit().toLong << i; i += 1 }
      v
    }
  }

  /** LSB-first bit writer (encoder twin). */
  final class BitWriter {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << nBits
      nBits += 1
      if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit(((v >> i) & 1L).toInt); i += 1 }
    }
    /** Huffman codewords transmit MSB-first (§3.2.1). */
    def writeCodeword(code: Int, len: Int): Unit = {
      var j = len - 1
      while (j >= 0) { writeBit((code >> j) & 1); j -= 1 }
    }
    def toBytes: Array[Byte] = {
      val tail = if (nBits > 0) Array(cur.toByte) else Array.empty[Byte]
      out.toArray ++ tail
    }
  }

  /** §9.2.1: smallest n with 2^n > x (bits to read for a bounded int). */
  def ilog(x: Int): Int = {
    var v = x
    var n = 0
    while (v > 0) { n += 1; v >>= 1 }
    n
  }

  /** §9.2.2 float32_unpack: 21-bit mantissa, 10-bit exponent biased by
    * 788, sign bit 31.
    */
  def float32Unpack(x: Long): Float = {
    val mant = (x & 0x1fffffL).toDouble
    val sign = if ((x & 0x80000000L) != 0) -1.0 else 1.0
    val exp = ((x & 0x7fe00000L) >> 21).toInt
    (sign * mant * math.pow(2.0, exp - 788)).toFloat
  }

  /** Inverse of float32Unpack for exactly-representable grid values
    * (powers of two × small integers — all the encoder twin emits).
    */
  def float32Pack(v: Float): Long = {
    if (v == 0f) return 0L
    val sign = if (v < 0) 0x80000000L else 0L
    var mant = math.abs(v.toDouble)
    var exp = 788
    while (mant < (1 << 20) && exp > 0) { mant *= 2; exp -= 1 }
    while (mant >= (1 << 21)) { mant /= 2; exp += 1 }
    require(mant == math.floor(mant), s"not grid-packable: $v")
    sign | (exp.toLong << 21) | mant.toLong
  }

  /** §9.2.3 lookup1_values: max v with v^dims <= entries. */
  def lookup1Values(entries: Int, dims: Int): Int = {
    var v = 0
    while (math.pow(v + 1, dims) <= entries) v += 1
    v
  }

  // ------------------------------------------------------------ codebook

  /** One codebook: prefix code over `entries`, optional VQ lookup
    * (§3.2). `lengths(i) == 0` marks an unused entry.
    */
  final case class Codebook(dims: Int, entries: Int, lengths: Array[Int],
      lookupType: Int, minValue: Float, deltaValue: Float,
      valueBits: Int, sequenceP: Boolean, mults: Array[Int]) {

    /** Canonical codeword per entry (spec §3.2.1 assignment: each used
      * entry, in order, takes the numerically smallest unused codeword
      * of its length). -1 = unused. Verified against the spec's worked
      * example in VorbisSpec.
      */
    val codewords: Array[Int] = {
      val out = Array.fill(entries)(-1)
      val avail = new Array[Long](33)
      var first = true
      var i = 0
      var valid = true
      while (i < entries && valid) {
        val l = lengths(i)
        if (l > 0) {
          if (first) {
            out(i) = 0
            var j = 1
            while (j <= l) { avail(j) = 1L << (32 - j); j += 1 }
            first = false
          } else {
            var z = l
            while (z > 0 && avail(z) == 0) z -= 1
            if (z == 0) valid = false
            else {
              val res = avail(z)
              avail(z) = 0
              out(i) = (res >>> (32 - l)).toInt
              var y = z + 1
              while (y <= l) { avail(y) = res + (1L << (32 - y)); y += 1 }
            }
          }
        }
        i += 1
      }
      require(valid, "over-subscribed huffman tree (undecodable stream)")
      out
    }

    private lazy val usedEntries = lengths.count(_ > 0)
    private lazy val singleEntry: Int = lengths.indexWhere(_ > 0)

    /** (len << 32 | code) → entry, for the bit-at-a-time tree walk. */
    private lazy val decodeMap: java.util.HashMap[Long, Integer] = {
      val m = new java.util.HashMap[Long, Integer](entries * 2)
      var i = 0
      while (i < entries) {
        if (lengths(i) > 0)
          m.put((lengths(i).toLong << 32) | (codewords(i).toLong & 0xffffffffL),
            Integer.valueOf(i))
        i += 1
      }
      m
    }

    /** Read one codeword (MSB of the codeword transmits first). -1 on
      * end-of-packet. Single-used-entry books read their length in bits
      * and return the entry regardless (§3.2.1 special case).
      */
    def decodeScalar(br: BitReader): Int = {
      if (usedEntries == 1) {
        br.readBits(lengths(singleEntry))
        return if (br.eof) -1 else singleEntry
      }
      var code = 0L
      var len = 0
      while (len < 32) {
        code = (code << 1) | br.readBit()
        len += 1
        if (br.eof) return -1
        val e = decodeMap.get((len.toLong << 32) | code)
        if (e != null) return e.intValue()
      }
      -1
    }

    /** VQ vector for an entry (§3.2.2 lookup types 1 and 2). */
    def vq(entry: Int): Array[Float] = {
      val v = new Array[Float](dims)
      var last = 0f
      if (lookupType == 1) {
        val lv = lookup1Values(entries, dims)
        var indexDivisor = 1
        var i = 0
        while (i < dims) {
          val off = (entry / indexDivisor) % lv
          v(i) = mults(off) * deltaValue + minValue + last
          if (sequenceP) last = v(i)
          indexDivisor *= lv
          i += 1
        }
      } else {
        var i = 0
        while (i < dims) {
          v(i) = mults(entry * dims + i) * deltaValue + minValue + last
          if (sequenceP) last = v(i)
          i += 1
        }
      }
      v
    }
  }

  def readCodebook(br: BitReader): Codebook = {
    require(br.readBits(24) == 0x564342, "bad codebook sync")
    val dims = br.readBits(16)
    val entries = br.readBits(24)
    require(entries <= (1 << 22) && dims <= (1 << 14), "codebook too large")
    val lengths = new Array[Int](entries)
    val ordered = br.readBit() == 1
    if (!ordered) {
      val sparse = br.readBit() == 1
      var i = 0
      while (i < entries) {
        if (!sparse || br.readBit() == 1) lengths(i) = br.readBits(5) + 1
        i += 1
      }
    } else {
      var cur = 0
      var len = br.readBits(5) + 1
      while (cur < entries) {
        val num = br.readBits(ilog(entries - cur))
        require(cur + num <= entries, "ordered codebook overrun")
        var i = 0
        while (i < num) { lengths(cur + i) = len; i += 1 }
        cur += num
        len += 1
        require(len <= 32 || cur >= entries, "codeword too long")
      }
    }
    val lookupType = br.readBits(4)
    require(lookupType <= 2, s"reserved codebook lookup type $lookupType")
    if (lookupType == 0)
      Codebook(dims, entries, lengths, 0, 0f, 0f, 0, sequenceP = false,
        Array.empty)
    else {
      val minV = float32Unpack(br.readBitsLong(32))
      val deltaV = float32Unpack(br.readBitsLong(32))
      val valueBits = br.readBits(4) + 1
      val seqP = br.readBit() == 1
      val nVals =
        if (lookupType == 1) lookup1Values(entries, dims) else entries * dims
      val mults = Array.fill(nVals)(br.readBits(valueBits))
      Codebook(dims, entries, lengths, lookupType, minV, deltaV, valueBits,
        seqP, mults)
    }
  }

  private def writeCodebook(bw: BitWriter, cb: Codebook): Unit = {
    bw.writeBits(0x564342, 24)
    bw.writeBits(cb.dims, 16)
    bw.writeBits(cb.entries, 24)
    bw.writeBit(0) // unordered
    bw.writeBit(0) // non-sparse
    cb.lengths.foreach(l => bw.writeBits(l - 1, 5))
    bw.writeBits(cb.lookupType, 4)
    if (cb.lookupType != 0) {
      bw.writeBits(float32Pack(cb.minValue), 32)
      bw.writeBits(float32Pack(cb.deltaValue), 32)
      bw.writeBits(cb.valueBits - 1, 4)
      bw.writeBit(if (cb.sequenceP) 1 else 0)
      cb.mults.foreach(m => bw.writeBits(m, cb.valueBits))
    }
  }

  // ------------------------------------------------------------ floor 1

  /** §7.2.2: inverse dB table, generative: table(i) = 10^(-7·(255-i)/256)
    * — table(255) = 1 exactly; table(0) = 1.0649863e-07 (the spec's
    * first literal). Pinned against transcribed literals in VorbisSpec.
    */
  val floor1InverseDbTable: Array[Float] =
    Array.tabulate(256)(i => math.pow(10.0, -7.0 * (255 - i) / 256).toFloat)

  final case class Floor1(partitionClasses: Array[Int],
      classDims: Array[Int], classSubclasses: Array[Int],
      classMasterbooks: Array[Int], subclassBooks: Array[Array[Int]],
      multiplier: Int, rangebits: Int, xList: Array[Int]) {
    val values: Int = xList.length
    /** X-sorted point order (index into xList), precomputed. */
    val sortOrder: Array[Int] =
      xList.indices.sortBy(xList(_)).toArray
  }

  def readFloor1(br: BitReader): Floor1 = {
    val partitions = br.readBits(5)
    val partitionClasses = Array.fill(partitions)(br.readBits(4))
    val maxClass = if (partitions == 0) -1 else partitionClasses.max
    val classDims = new Array[Int](maxClass + 1)
    val classSub = new Array[Int](maxClass + 1)
    val masterbooks = Array.fill(maxClass + 1)(-1)
    val subBooks = new Array[Array[Int]](maxClass + 1)
    var j = 0
    while (j <= maxClass) {
      classDims(j) = br.readBits(3) + 1
      classSub(j) = br.readBits(2)
      if (classSub(j) != 0) masterbooks(j) = br.readBits(8)
      subBooks(j) = Array.fill(1 << classSub(j))(br.readBits(8) - 1)
      j += 1
    }
    val multiplier = br.readBits(2) + 1
    val rangebits = br.readBits(4)
    val xs = scala.collection.mutable.ArrayBuffer(0, 1 << rangebits)
    var i = 0
    while (i < partitions) {
      var k = 0
      while (k < classDims(partitionClasses(i))) {
        xs += br.readBits(rangebits)
        k += 1
      }
      i += 1
    }
    require(xs.distinct.length == xs.length, "floor1 X values not unique")
    Floor1(partitionClasses, classDims, classSub, masterbooks, subBooks,
      multiplier, rangebits, xs.toArray)
  }

  private val Floor1Ranges = Array(256, 128, 86, 64)

  /** §7.2.3/§7.2.4: decode one channel's floor packet data and render
    * the curve into `n2` bins. None = "unused" (zero channel).
    */
  def decodeFloor1Curve(br: BitReader, fl: Floor1, books: Array[Codebook],
      n2: Int): Option[Array[Float]] = {
    if (br.readBit() != 1) return None
    val range = Floor1Ranges(fl.multiplier - 1)
    val yBits = ilog(range - 1)
    val y = new Array[Int](fl.values)
    y(0) = br.readBits(yBits)
    y(1) = br.readBits(yBits)
    var offset = 2
    var i = 0
    while (i < fl.partitionClasses.length) {
      val cls = fl.partitionClasses(i)
      val cdim = fl.classDims(cls)
      val cbits = fl.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) {
        cval = books(fl.classMasterbooks(cls)).decodeScalar(br)
        if (cval < 0) return None
      }
      var j2 = 0
      while (j2 < cdim) {
        val book = fl.subclassBooks(cls)(cval & csub)
        cval >>= cbits
        if (book >= 0) {
          val v = books(book).decodeScalar(br)
          if (v < 0) return None
          y(offset + j2) = v
        } else y(offset + j2) = 0
        j2 += 1
      }
      offset += cdim
      i += 1
    }
    if (br.eof) return None
    // ---- §7.2.4 step 1: amplitude synthesis with neighbor prediction
    val finalY = new Array[Int](fl.values)
    val step2 = new Array[Boolean](fl.values)
    step2(0) = true; step2(1) = true
    finalY(0) = y(0); finalY(1) = y(1)
    def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
      val dy = y1 - y0
      val adx = x1 - x0
      val off = (math.abs(dy) * (x - x0)) / adx
      if (dy < 0) y0 - off else y0 + off
    }
    i = 2
    while (i < fl.values) {
      // low/high neighbors: among indices < i, the closest X below/above
      var lo = 0; var hi = 1
      var k = 0
      while (k < i) {
        if (fl.xList(k) < fl.xList(i) && fl.xList(k) > fl.xList(lo)) lo = k
        if (fl.xList(k) > fl.xList(i) &&
          (fl.xList(hi) <= fl.xList(i) || fl.xList(k) < fl.xList(hi))) hi = k
        k += 1
      }
      val predicted = renderPoint(fl.xList(lo), finalY(lo),
        fl.xList(hi), finalY(hi), fl.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = math.min(highroom, lowroom) * 2
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - (v - highroom) - 1
          } else if (v % 2 == 1) predicted - (v + 1) / 2
          else predicted + v / 2
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      i += 1
    }
    // ---- §7.2.4 step 2: curve synthesis (integer Bresenham lines)
    val out = new Array[Float](n2)
    val yv = new Array[Int](n2)
    def renderLine(x0: Int, y0: Int, x1: Int, y1: Int): Unit = {
      val dy = y1 - y0
      val adx = x1 - x0
      var ady = math.abs(dy)
      val base = dy / adx
      var x = x0
      var yy = y0
      var err = 0
      val sy = if (dy < 0) base - 1 else base + 1
      ady -= math.abs(base) * adx
      if (x < n2) yv(x) = yy
      x = x0 + 1
      while (x < math.min(x1, n2)) {
        err += ady
        if (err >= adx) { err -= adx; yy += sy } else yy += base
        yv(x) = yy
        x += 1
      }
    }
    var lx = 0
    var ly = finalY(fl.sortOrder(0)) * fl.multiplier
    var si = 0
    while (si < fl.values) {
      val pi = fl.sortOrder(si)
      if (step2(pi)) {
        val hx = fl.xList(pi)
        val hy = finalY(pi) * fl.multiplier
        if (hx > lx) renderLine(lx, ly, hx, hy)
        else if (hx == 0) yv(0) = hy
        lx = hx; ly = hy
      }
      si += 1
    }
    if (lx < n2) {
      var x = lx
      while (x < n2) { yv(x) = ly; x += 1 }
    }
    var b = 0
    while (b < n2) {
      out(b) = floor1InverseDbTable(math.max(0, math.min(255, yv(b))))
      b += 1
    }
    Some(out)
  }

  // ------------------------------------------------------------ residue

  final case class Residue(resType: Int, begin: Int, end: Int,
      partitionSize: Int, classifications: Int, classbook: Int,
      cascade: Array[Int], books: Array[Array[Int]])

  def readResidue(br: BitReader): Residue = {
    val t = br.readBits(16)
    require(t <= 2, s"reserved residue type $t")
    val begin = br.readBits(24)
    val end = br.readBits(24)
    val psize = br.readBits(24) + 1
    val classifications = br.readBits(6) + 1
    val classbook = br.readBits(8)
    val cascade = Array.tabulate(classifications) { _ =>
      val low = br.readBits(3)
      val high = if (br.readBit() == 1) br.readBits(5) else 0
      high * 8 + low
    }
    val books = cascade.map { c =>
      Array.tabulate(8)(j => if ((c & (1 << j)) != 0) br.readBits(8) else -1)
    }
    Residue(t, begin, end, psize, classifications, classbook, cascade, books)
  }

  /** §8.6.2-8.6.4: decode residue vectors for `ch` channels of spectral
    * half-size `n2`. `doNotDecode(j)` marks floor-unused channels. Types
    * 0/1 decode per channel; type 2 interleaves all channels into one
    * vector first.
    */
  def decodeResidue(br: BitReader, r: Residue, books: Array[Codebook],
      ch: Int, n2: Int, doNotDecode: Array[Boolean]): Array[Array[Float]] = {
    val out = Array.fill(ch)(new Array[Float](n2))
    if (r.resType == 2) {
      if (doNotDecode.forall(identity)) return out
      val big = new Array[Float](ch * n2)
      decodeResidueVectors(br, r, books, Array(big), Array(false),
        format1 = true)
      var i = 0
      while (i < ch * n2) {
        out(i % ch)(i / ch) = big(i)
        i += 1
      }
      out
    } else {
      decodeResidueVectors(br, r, books,
        out.asInstanceOf[Array[Array[Float]]], doNotDecode,
        format1 = r.resType == 1)
      out
    }
  }

  private def decodeResidueVectors(br: BitReader, r: Residue,
      books: Array[Codebook], vecs: Array[Array[Float]],
      doNotDecode: Array[Boolean], format1: Boolean): Unit = {
    val actualSize = vecs(0).length
    val begin = math.min(r.begin, actualSize)
    val end = math.min(r.end, actualSize)
    val nToRead = end - begin
    if (nToRead == 0) return
    val partitionsToRead = nToRead / r.partitionSize
    val classbook = books(r.classbook)
    val cw = classbook.dims
    val nV = vecs.length
    val classifs = Array.ofDim[Int](nV, partitionsToRead + cw)
    var pass = 0
    while (pass < 8) {
      var pc = 0
      while (pc < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < nV) {
            if (!doNotDecode(j)) {
              var temp = classbook.decodeScalar(br)
              if (temp < 0) return
              var i = cw - 1
              while (i >= 0) {
                classifs(j)(i + pc) = temp % r.classifications
                temp /= r.classifications
                i -= 1
              }
            }
            j += 1
          }
        }
        var i = 0
        while (i < cw && pc < partitionsToRead) {
          var j = 0
          while (j < nV) {
            if (!doNotDecode(j)) {
              val vqClass = classifs(j)(pc)
              val vqBook = r.books(vqClass)(pass)
              if (vqBook >= 0) {
                val b = books(vqBook)
                val offset = begin + pc * r.partitionSize
                if (format1) {
                  // format 1: sequential add
                  var k = 0
                  while (k < r.partitionSize) {
                    val e = b.decodeScalar(br)
                    if (e < 0) return
                    val v = b.vq(e)
                    var d = 0
                    while (d < b.dims && k < r.partitionSize) {
                      vecs(j)(offset + k) += v(d)
                      k += 1; d += 1
                    }
                  }
                } else {
                  // format 0: interleaved add
                  val step = r.partitionSize / b.dims
                  var s = 0
                  while (s < step) {
                    val e = b.decodeScalar(br)
                    if (e < 0) return
                    val v = b.vq(e)
                    var d = 0
                    while (d < b.dims) {
                      vecs(j)(offset + s + d * step) += v(d)
                      d += 1
                    }
                    s += 1
                  }
                }
              }
            }
            j += 1
          }
          pc += 1
          i += 1
        }
      }
      pass += 1
    }
  }

  // ------------------------------------------------------------ mapping / mode

  final case class Mapping(couplingMag: Array[Int], couplingAng: Array[Int],
      mux: Array[Int], submapFloor: Array[Int], submapResidue: Array[Int])

  final case class Mode(blockflag: Int, mapping: Int)

  def readMapping(br: BitReader, channels: Int): Mapping = {
    require(br.readBits(16) == 0, "reserved mapping type")
    val submaps = if (br.readBit() == 1) br.readBits(4) + 1 else 1
    var mags = Array.empty[Int]
    var angs = Array.empty[Int]
    if (br.readBit() == 1) {
      val steps = br.readBits(8) + 1
      val bits = ilog(channels - 1)
      mags = new Array[Int](steps)
      angs = new Array[Int](steps)
      var i = 0
      while (i < steps) {
        mags(i) = br.readBits(bits)
        angs(i) = br.readBits(bits)
        require(mags(i) != angs(i) && mags(i) < channels &&
          angs(i) < channels, "bad coupling step")
        i += 1
      }
    }
    require(br.readBits(2) == 0, "mapping reserved bits set")
    val mux =
      if (submaps > 1) Array.fill(channels)(br.readBits(4))
      else new Array[Int](channels)
    val fl = new Array[Int](submaps)
    val rs = new Array[Int](submaps)
    var i = 0
    while (i < submaps) {
      br.readBits(8) // unused time configuration
      fl(i) = br.readBits(8)
      rs(i) = br.readBits(8)
      i += 1
    }
    Mapping(mags, angs, mux, fl, rs)
  }

  // ------------------------------------------------------------ setup

  final case class Info(channels: Int, sampleRate: Int, blocksize0: Int,
      blocksize1: Int)

  final case class Setup(books: Array[Codebook], floors: Array[Floor1],
      residues: Array[Residue], mappings: Array[Mapping],
      modes: Array[Mode])

  def parseIdent(pkt: Array[Byte]): Info = {
    require(pkt.length >= 30 && (pkt(0) & 0xff) == 1 &&
      new String(pkt, 1, 6, "US-ASCII") == "vorbis",
      "not a vorbis identification header")
    val br = new BitReader(pkt, 7, pkt.length)
    require(br.readBitsLong(32) == 0L, "unsupported vorbis version")
    val ch = br.readBits(8)
    val rate = br.readBitsLong(32).toInt
    br.readBitsLong(32); br.readBitsLong(32); br.readBitsLong(32) // bitrates
    val bs0 = 1 << br.readBits(4)
    val bs1 = 1 << br.readBits(4)
    require(br.readBit() == 1, "ident framing bit unset")
    require(ch > 0 && rate > 0, "bad vorbis identity")
    require(bs0 >= 64 && bs1 <= 8192 && bs0 <= bs1, s"bad blocksizes $bs0/$bs1")
    Info(ch, rate, bs0, bs1)
  }

  def parseSetup(pkt: Array[Byte], info: Info): Setup = {
    require(pkt.length >= 7 && (pkt(0) & 0xff) == 5 &&
      new String(pkt, 1, 6, "US-ASCII") == "vorbis",
      "not a vorbis setup header")
    val br = new BitReader(pkt, 7, pkt.length)
    val books = Array.fill(br.readBits(8) + 1)(readCodebook(br))
    // time domain transforms: placeholders, must read as zero
    val timeCount = br.readBits(6) + 1
    (0 until timeCount).foreach(_ =>
      require(br.readBits(16) == 0, "reserved time transform"))
    val floors = Array.fill(br.readBits(6) + 1) {
      val t = br.readBits(16)
      require(t == 1, s"floor type $t unsupported (floor0 is legacy)")
      readFloor1(br)
    }
    val residues = Array.fill(br.readBits(6) + 1)(readResidue(br))
    val mappings = Array.fill(br.readBits(6) + 1)(readMapping(br, info.channels))
    val modes = Array.fill(br.readBits(6) + 1) {
      val blockflag = br.readBit()
      require(br.readBits(16) == 0, "reserved window type")
      require(br.readBits(16) == 0, "reserved transform type")
      Mode(blockflag, br.readBits(8))
    }
    require(br.readBit() == 1 && !br.eof, "setup framing bit unset")
    Setup(books, floors, residues, mappings, modes)
  }

  // ------------------------------------------------------------ transform

  /** §4.3.9 window slope: w(i) = sin(π/2 · sin²(π(i+0.5)/n)). */
  def window(n: Int): Array[Float] = windowCache.computeIfAbsent(n, { _ =>
    Array.tabulate(n) { i =>
      val s = math.sin(math.Pi * (i + 0.5) / n)
      math.sin(math.Pi / 2 * s * s).toFloat
    }
  })
  private val windowCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Float]]()

  /** Rising lap slope of length L (§4.3.9): the first half of the
    * full-size window generalized to any lap length —
    * s(j) = sin(π/2 · sin²(π(j+0.5)/(2L))).
    */
  def slope(j: Int, L: Int): Float = {
    val s = math.sin(math.Pi * (j + 0.5) / (2 * L))
    math.sin(math.Pi / 2 * s * s).toFloat
  }

  /** §4.3.8 piecewise window in place: zero before `leftStart`, rising
    * slope over [leftStart, leftEnd), 1 over [leftEnd, rightStart),
    * falling slope over [rightStart, rightEnd), zero after. A
    * fixed-blocksize frame (ls=0, le=n/2, rs=n/2, re=n) reproduces
    * `window(n)` exactly; a long block next to a short one uses the
    * SHORT slope centered in its half.
    */
  def applyPiecewiseWindow(y: Array[Float], leftStart: Int, leftEnd: Int,
      rightStart: Int, rightEnd: Int): Unit = {
    val n = y.length
    val lLen = leftEnd - leftStart
    val rLen = rightEnd - rightStart
    var i = 0
    while (i < leftStart) { y(i) = 0f; i += 1 }
    while (i < leftEnd) { y(i) *= slope(i - leftStart, lLen); i += 1 }
    i = rightStart
    while (i < rightEnd) { y(i) *= slope(rightEnd - 1 - i, rLen); i += 1 }
    while (i < n) { y(i) = 0f; i += 1 }
  }

  /** §4.3.6 inverse MDCT, exactly the spec formula:
    * y(j) = Σ_{k<n/2} X(k)·cos(π/(2n)·(2j+1+n/2)·(2k+1)). Direct
    * evaluation over a cached cos table — O(n²) per block, cached
    * per blocksize; fixture-tier blocks are 256 so a packet costs
    * 32k mults. (A split-radix FFT formulation drops in behind the
    * same signature if decode ever becomes a measured bottleneck.)
    */
  def imdct(spec: Array[Float], n: Int): Array[Float] = {
    val n2 = n / 2
    val tab = cosTable(n)
    val out = new Array[Float](n)
    var j = 0
    while (j < n) {
      var acc = 0.0
      val row = tab(j)
      var k = 0
      while (k < n2) { acc += spec(k) * row(k); k += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    out
  }

  /** Forward MDCT (encoder twin): X(k) = (4/n)·Σ_j w(j)·x(j)·c(j,k) —
    * the normalization that makes the spec's unnormalized IMDCT +
    * windowed overlap-add an exact reconstruction (TDAC; pinned in
    * VorbisSpec).
    */
  def mdct(frame: Array[Float], n: Int): Array[Float] = {
    val w = window(n)
    mdctRaw(Array.tabulate(n)(j => w(j) * frame(j)), n)
  }

  /** Forward MDCT of an ALREADY-WINDOWED frame (mixed-blocksize
    * analysis applies the piecewise window first).
    */
  def mdctRaw(windowed: Array[Float], n: Int): Array[Float] = {
    val n2 = n / 2
    val tab = cosTable(n)
    val out = new Array[Float](n2)
    var k = 0
    while (k < n2) {
      var acc = 0.0
      var j = 0
      while (j < n) { acc += windowed(j) * tab(j)(k); j += 1 }
      out(k) = (4.0 / n * acc).toFloat
      k += 1
    }
    out
  }

  private val cosCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def cosTable(n: Int): Array[Array[Double]] =
    cosCache.computeIfAbsent(n, { _ =>
      val n2 = n / 2
      Array.tabulate(n)(j => Array.tabulate(n2)(k =>
        math.cos(math.Pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))))
    })

  // ------------------------------------------------------------ decode

  final case class Decoded(info: Info,
      pcm: Array[Array[Float]], // per channel
      nAudioPackets: Int,
      residueSums: Array[Long]) // per channel, post-coupling integer sum

  /** Decode a full packet sequence (3 headers + audio packets). Fixed
    * and mixed blocksizes both work; output per packet is
    * (prevN + curN)/4 samples once the overlap is primed (§4.3.8).
    */
  def decode(packets: Seq[Array[Byte]]): Decoded = {
    require(packets.length >= 3, "need ident/comment/setup packets")
    val info = parseIdent(packets.head)
    val setup = parseSetup(packets(2), info)
    val ch = info.channels
    val pcmOut = Array.fill(ch)(
      scala.collection.mutable.ArrayBuffer.empty[Float])
    val resSums = new Array[Long](ch)
    var prevRight: Array[Array[Float]] = null // per ch, n_prev/2 samples
    var nAudio = 0
    packets.drop(3).foreach { pkt =>
      val br = new BitReader(pkt)
      if (pkt.nonEmpty && br.readBit() == 0) {
        val modeN = br.readBits(ilog(setup.modes.length - 1))
        val mode = setup.modes(modeN)
        val n = if (mode.blockflag == 1) info.blocksize1 else info.blocksize0
        var prevFlag = 1
        var nextFlag = 1
        if (mode.blockflag == 1) {
          // window shape flags (§4.3.1): 0 = the adjacent block is
          // short, so that lap uses the SHORT slope centered in this
          // half (§4.3.8)
          prevFlag = br.readBit()
          nextFlag = br.readBit()
        }
        val n2 = n / 2
        val n0 = info.blocksize0
        val isLong = mode.blockflag == 1 && n != n0
        val leftStart = if (isLong && prevFlag == 0) (n - n0) / 4 else 0
        val leftEnd = if (isLong && prevFlag == 0) (n + n0) / 4 else n2
        val rightStart =
          if (isLong && nextFlag == 0) (3 * n - n0) / 4 else n2
        val rightEnd = if (isLong && nextFlag == 0) (3 * n + n0) / 4 else n
        val mapping = setup.mappings(mode.mapping)
        // floors
        val floorCurves = new Array[Option[Array[Float]]](ch)
        var j = 0
        while (j < ch) {
          val fl = setup.floors(mapping.submapFloor(mapping.mux(j)))
          floorCurves(j) = decodeFloor1Curve(br, fl, setup.books, n2)
          j += 1
        }
        // nonzero propagation through coupling (§4.3.2 step 5)
        val noResidue = floorCurves.map(_.isEmpty)
        var s = 0
        while (s < mapping.couplingMag.length) {
          if (!noResidue(mapping.couplingMag(s)) ||
            !noResidue(mapping.couplingAng(s))) {
            noResidue(mapping.couplingMag(s)) = false
            noResidue(mapping.couplingAng(s)) = false
          }
          s += 1
        }
        // residues per submap
        val residueVecs = Array.fill(ch)(new Array[Float](n2))
        val nSubmaps = mapping.submapFloor.length
        var sm = 0
        while (sm < nSubmaps) {
          val chIdx = (0 until ch).filter(mapping.mux(_) == sm)
          val dnd = chIdx.map(noResidue(_)).toArray
          val r = setup.residues(mapping.submapResidue(sm))
          val decoded = decodeResidue(br, r, setup.books, chIdx.length, n2, dnd)
          chIdx.zipWithIndex.foreach { case (cj, k) =>
            residueVecs(cj) = decoded(k)
          }
          sm += 1
        }
        // inverse coupling (§4.3.5), last step first
        s = mapping.couplingMag.length - 1
        while (s >= 0) {
          val mV = residueVecs(mapping.couplingMag(s))
          val aV = residueVecs(mapping.couplingAng(s))
          var i = 0
          while (i < n2) {
            val m = mV(i); val a = aV(i)
            if (m > 0) {
              if (a > 0) { aV(i) = m - a }
              else { aV(i) = m; mV(i) = m + a }
            } else {
              if (a > 0) { aV(i) = m + a }
              else { aV(i) = m; mV(i) = m - a }
            }
            i += 1
          }
          s -= 1
        }
        j = 0
        while (j < ch) {
          var i = 0
          while (i < n2) {
            resSums(j) += math.round(residueVecs(j)(i)).toLong
            i += 1
          }
          j += 1
        }
        // dot product + IMDCT + piecewise window + overlap-add
        // (§4.3.8: add the previous frame's saved tail at this frame's
        // left lap; finished samples span [leftStart, rightStart); the
        // new tail is [rightStart, rightEnd))
        val rights = new Array[Array[Float]](ch)
        j = 0
        while (j < ch) {
          val spec = new Array[Float](n2)
          floorCurves(j) match {
            case Some(fc) =>
              var i = 0
              while (i < n2) { spec(i) = fc(i) * residueVecs(j)(i); i += 1 }
            case None => // spectral zeros
          }
          val y = imdct(spec, n)
          applyPiecewiseWindow(y, leftStart, leftEnd, rightStart, rightEnd)
          if (prevRight != null) {
            val pr = prevRight(j)
            var k = 0
            while (k < pr.length && leftStart + k < n) {
              y(leftStart + k) += pr(k)
              k += 1
            }
            k = leftStart
            while (k < rightStart) { pcmOut(j) += y(k); k += 1 }
          }
          rights(j) = java.util.Arrays.copyOfRange(y, rightStart, rightEnd)
          j += 1
        }
        prevRight = rights
        nAudio += 1
      }
    }
    Decoded(info, pcmOut.map(_.toArray), nAudio, resSums)
  }

  /** Ogg/Vorbis → Decoded (page walk → packet lacing → decode). */
  def decodeOgg(bytes: Array[Byte]): Decoded = decode(Ogg.packetsOf(bytes))

  /** Interleave float PCM to the PCM-16 interchange grid:
    * clamp(round(x·32767)).
    */
  def toPcm16(pcm: Array[Array[Float]]): Array[Short] = {
    val ch = pcm.length
    val nSamp = if (ch == 0) 0 else pcm(0).length
    val out = new Array[Short](ch * nSamp)
    var i = 0
    while (i < nSamp) {
      var j = 0
      while (j < ch) {
        val v = math.round(pcm(j)(i) * 32767f)
        out(i * ch + j) = math.max(-32768, math.min(32767, v)).toShort
        j += 1
      }
      i += 1
    }
    out
  }

  // ------------------------------------------------------------ encoder twin

  /** Fixture blocksize: 256 (128 spectral bins per packet). */
  val N = 256
  private val N2 = N / 2

  /** Kraft-complete code lengths for n entries: start at ceil(log2 n),
    * promote the first entries one bit shorter until Σ2^-l = 1 — a
    * COMPLETE prefix code (Vorbis forbids over-subscription; an
    * underfull tree wastes bits and trips strict decoders).
    */
  def completeLengths(n: Int): Array[Int] = {
    if (n == 1) return Array(1)
    val lmax = 32 - Integer.numberOfLeadingZeros(n - 1) // ceil(log2 n)
    val lens = Array.fill(n)(lmax)
    var slack = (1L << lmax) - n // promotions available at lmax
    var i = 0
    while (slack > 0 && i < n) {
      lens(i) = lmax - 1 // frees 2^-lmax of code space per promotion
      slack -= 1
      i += 1
    }
    lens
  }

  /** The twin's two codebooks for `ch` channels:
    * book 0 = scalar classbook (16 entries, dims 4, classifications 2);
    * book 1 = pair VQ book over the integer grid {-4..4}² (81 entries,
    * lookup type 2, min -4·scale, delta scale).
    */
  private def twinBooks(scale: Float): (Codebook, Codebook) = {
    val classbook = Codebook(4, 16, Array.fill(16)(4), 0, 0f, 0f, 0,
      sequenceP = false, Array.empty)
    val mults = Array.tabulate(81 * 2) { i =>
      val e = i / 2
      if (i % 2 == 0) e / 9 else e % 9
    }
    val valueBook = Codebook(2, 81, completeLengths(81), 2,
      -4f * scale, scale, 4, sequenceP = false, mults)
    (classbook, valueBook)
  }

  /** Identification header packet. */
  def identPacket(channels: Int, rate: Int, bs0Exp: Int = 8,
      bs1Exp: Int = 8): Array[Byte] = {
    val bw = new BitWriter
    bw.writeBits(1, 8)
    "vorbis".getBytes("US-ASCII").foreach(b => bw.writeBits(b & 0xffL, 8))
    bw.writeBits(0, 32) // version
    bw.writeBits(channels, 8)
    bw.writeBits(rate.toLong, 32)
    bw.writeBits(0, 32); bw.writeBits(0, 32); bw.writeBits(0, 32)
    bw.writeBits(bs0Exp, 4)
    bw.writeBits(bs1Exp, 4)
    bw.writeBit(1) // framing
    bw.toBytes
  }

  def commentPacket(tags: Seq[(String, String)]): Array[Byte] =
    Array[Byte](3) ++ "vorbis".getBytes("US-ASCII") ++
      VorbisComments.write(tags) ++ Array[Byte](1)

  /** Setup header: the two codebooks, one flat-capable floor1 (X = {0,
    * 128, 64}; Y read raw at the endpoints, the interior point
    * bookless so it follows the interpolation), one type-2 residue
    * (partition 8, class 0 = zero-cascade silence, class 1 = pass-0
    * coded), one mapping (square-polar coupled for stereo), one mode.
    */
  def setupPacket(channels: Int, scale: Float,
      mixed: Boolean = false): Array[Byte] = {
    val bw = new BitWriter
    bw.writeBits(5, 8)
    "vorbis".getBytes("US-ASCII").foreach(b => bw.writeBits(b & 0xffL, 8))
    val (classbook, valueBook) = twinBooks(scale)
    bw.writeBits(2 - 1, 8)
    writeCodebook(bw, classbook)
    writeCodebook(bw, valueBook)
    bw.writeBits(0, 6); bw.writeBits(0, 16) // one zero time transform
    // ---- floor
    bw.writeBits(0, 6) // floor_count - 1
    bw.writeBits(1, 16) // floor type 1
    bw.writeBits(1, 5) // partitions
    bw.writeBits(0, 4) // partition class 0
    bw.writeBits(0, 3) // class 0 dims - 1 = 0 → 1
    bw.writeBits(0, 2) // subclasses 0
    bw.writeBits(0, 8) // subclass book 0 → -1 (interior point bookless)
    bw.writeBits(0, 2) // multiplier - 1
    bw.writeBits(7, 4) // rangebits → X[1] = 128 = n/2
    bw.writeBits(64, 7) // X[2]
    // ---- residue
    bw.writeBits(0, 6) // residue_count - 1
    bw.writeBits(2, 16) // type 2
    bw.writeBits(0, 24) // begin
    bw.writeBits(channels * N2, 24) // end
    bw.writeBits(8 - 1, 24) // partition size
    bw.writeBits(2 - 1, 6) // classifications
    bw.writeBits(0, 8) // classbook = book 0
    bw.writeBits(0, 3); bw.writeBit(0) // class 0 cascade 0 (silence)
    bw.writeBits(1, 3); bw.writeBit(0) // class 1 cascade 1 (pass 0)
    bw.writeBits(1, 8) // class 1 pass 0 → book 1
    // ---- mapping
    bw.writeBits(0, 6) // mapping_count - 1
    bw.writeBits(0, 16) // type 0
    bw.writeBit(0) // one submap
    if (channels == 2) {
      bw.writeBit(1) // coupling present
      bw.writeBits(0, 8) // steps - 1
      bw.writeBit(0) // magnitude = ch 0 (ilog(1) = 1 bit)
      bw.writeBit(1) // angle = ch 1
    } else bw.writeBit(0)
    bw.writeBits(0, 2) // reserved
    bw.writeBits(0, 8) // time config (discarded)
    bw.writeBits(0, 8) // floor 0
    bw.writeBits(0, 8) // residue 0
    // ---- modes: mode 0 short; with `mixed`, mode 1 long (same mapping)
    bw.writeBits(if (mixed) 1 else 0, 6) // mode_count - 1
    bw.writeBit(0) // blockflag
    bw.writeBits(0, 16); bw.writeBits(0, 16) // window/transform type
    bw.writeBits(0, 8) // mapping
    if (mixed) {
      bw.writeBit(1) // blockflag (long)
      bw.writeBits(0, 16); bw.writeBits(0, 16)
      bw.writeBits(0, 8)
    }
    bw.writeBit(1) // framing
    bw.toBytes
  }

  /** One audio packet from a CODED type-2 interleaved integer vector
    * (`coded.length == channels·128`, values in [-4, 4]; for stereo
    * these are the pre-inverse-coupling magnitude/angle integers).
    * Partitions that are all-zero take class 0 and cost no value
    * codewords — the real-Vorbis silence shape.
    */
  def audioPacket(channels: Int, coded: Array[Int], scale: Float = 1f,
      nModes: Int = 1, blockflag: Int = 0, prevFlag: Int = 1,
      nextFlag: Int = 1): Array[Byte] = {
    require(coded.length == channels * N2, "coded vector size mismatch")
    require(coded.forall(v => v >= -4 && v <= 4), "coded value off-grid")
    val (classbook, valueBook) = twinBooks(scale)
    val bw = new BitWriter
    bw.writeBit(0) // audio packet
    // mode number (mode index == blockflag in the twin's mode table);
    // long blocks carry the two window-shape flags (§4.3.1)
    if (nModes > 1) {
      bw.writeBits(blockflag, ilog(nModes - 1))
      if (blockflag == 1) { bw.writeBit(prevFlag); bw.writeBit(nextFlag) }
    }
    var c = 0
    while (c < channels) { // floor per channel: flat at exactly 1.0
      bw.writeBit(1) // nonzero
      bw.writeBits(255, 8) // Y[0]
      bw.writeBits(255, 8) // Y[1]
      // interior point: bookless → no bits
      c += 1
    }
    // residue type 2, one pseudo-channel
    val nPart = channels * N2 / 8
    val classes = Array.tabulate(nPart) { p =>
      val allZero = (0 until 8).forall(i => coded(p * 8 + i) == 0)
      if (allZero) 0 else 1
    }
    var pc = 0
    while (pc < nPart) {
      // classword groups of 4 (classbook dims)
      var temp = 0
      var i = 0
      while (i < 4) { temp = temp * 2 + classes(pc + i); i += 1 }
      bw.writeCodeword(classbook.codewords(temp), classbook.lengths(temp))
      i = 0
      while (i < 4 && pc < nPart) {
        if (classes(pc) == 1) {
          var k = 0
          while (k < 8) {
            val a = coded(pc * 8 + k) + 4
            val b = coded(pc * 8 + k + 1) + 4
            val e = a * 9 + b
            bw.writeCodeword(valueBook.codewords(e), valueBook.lengths(e))
            k += 2
          }
        }
        pc += 1
        i += 1
      }
    }
    bw.toBytes
  }

  /** Full packet stream (3 headers + audio) for explicit coded residue
    * vectors — the oracle-gate surface: decoded post-coupling residue
    * integers are an exact closed form of these inputs.
    */
  def encodePackets(channels: Int, rate: Int,
      codedVectors: Seq[Array[Int]],
      tags: Seq[(String, String)] = Seq.empty): Seq[Array[Byte]] =
    Seq(identPacket(channels, rate), commentPacket(tags),
      setupPacket(channels, 1f)) ++
      codedVectors.map(v => audioPacket(channels, v))

  /** Mono PCM → packets: windowed MDCT analysis at hop 128, per-stream
    * power-of-two scale (exactly float32-packable) so quantized
    * coefficients sit on the codebook grid {-4..4}·scale.
    */
  def encodePcm(pcm: Array[Float], rate: Int,
      tags: Seq[(String, String)] = Seq.empty): Seq[Array[Byte]] = {
    val w = window(N)
    val nFrames = math.max(1, (pcm.length + N2 - 1) / N2 + 1)
    val frames = (0 until nFrames).map { t =>
      val frame = new Array[Float](N)
      var j = 0
      while (j < N) {
        val src = (t - 1) * N2 + j // frame t covers [(t-1)·128, (t+1)·128)
        frame(j) = if (src >= 0 && src < pcm.length) pcm(src) else 0f
        j += 1
      }
      mdct(frame, N)
    }
    val peak = frames.flatten.map(math.abs).foldLeft(1e-9f)(math.max)
    val scale = math.pow(2.0,
      math.ceil(math.log(peak / 4.0) / math.log(2.0))).toFloat
    val coded = frames.map(cs =>
      cs.map(v => math.max(-4, math.min(4, math.round(v / scale)))))
    Seq(identPacket(1, rate), commentPacket(tags), setupPacket(1, scale)) ++
      coded.map(v => audioPacket(1, v, scale))
  }

  /** Ogg mux: BOS page (ident), one header page (comment + setup), then
    * one audio packet per page; granule = samples decodable through the
    * page (the first audio packet primes the lap and emits none).
    */
  def muxOgg(packets: Seq[Array[Byte]], serial: Int = 0x56524253):
      Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Ogg.pageOfPackets(0x02, 0L, serial, 0, Seq(packets.head)))
    out.write(Ogg.pageOfPackets(0x00, 0L, serial, 1,
      Seq(packets(1), packets(2))))
    val audio = packets.drop(3)
    audio.zipWithIndex.foreach { case (pkt, i) =>
      val granule = i.toLong * N2 // samples out after packet i (0-based)
      val hdr = if (i == audio.length - 1) 0x04 else 0x00
      out.write(Ogg.pageOfPackets(hdr, granule, serial, 2 + i, Seq(pkt)))
    }
    out.toByteArray
  }
}
