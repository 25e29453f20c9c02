package graft.functions

/** Pure-JVM FLAC codec — the lossless audio format real ASR corpora ship
  * (LibriSpeech/MLS-style distributions), which the reference decodes via
  * libav (`/root/reference/pixeltable/functions/audio.py`). Implemented
  * from the public format specification; being lossless, every path here
  * is bit-exact and gate-able with closed-form oracles.
  *
  * Decoder: STREAMINFO + metadata skip, frame headers (UTF-8 coded frame
  * numbers, CRC-8 verified), subframe types CONSTANT / VERBATIM / FIXED
  * (orders 0-4) / LPC (any order, signed quantized coefficients), rice
  * residuals (4- and 5-bit parameter widths, escape partitions, partition
  * orders), wasted-bits, channel assignments independent / left-side /
  * right-side / mid-side, frame CRC-16 verified, STREAMINFO MD5 verified
  * against the decoded stream when present.
  *
  * Encoder (fixture/sink surface): mono or independent stereo, 16-bit,
  * CONSTANT / VERBATIM / FIXED 0-2 chosen per block by residual cost, one
  * rice partition per subframe, correct CRCs and stream MD5 — enough to
  * produce real FLAC files any decoder accepts, and an explicit LPC mode
  * (caller-provided integer coefficients + shift) so the decoder's LPC
  * path round-trips under test.
  */
object Flac {

  // ---------------- bit I/O (MSB-first, per the format) ----------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
    }
    def write(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while (nbits != 0) writeBit(0)
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int = 0) {
    private var bit = 0
    def bytePos: Int = pos
    def readBit(): Int = {
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def read(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = read(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---------------- CRCs (format-specified polynomials) ----------------

  private[functions] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[functions] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---------------- rice coding ----------------

  private def riceWrite(w: BitWriter, v: Long, param: Int): Unit = {
    // zigzag fold: non-negative → 2v, negative → -2v-1
    val u = if (v >= 0) v << 1 else ((-v) << 1) - 1
    w.writeUnary((u >>> param).toInt)
    if (param > 0) w.write(u & ((1L << param) - 1), param)
  }

  private def riceRead(r: BitReader, param: Int): Long = {
    val q = r.readUnary().toLong
    val u = (q << param) | (if (param > 0) r.read(param) else 0L)
    if ((u & 1) == 0) u >>> 1 else -((u >>> 1) + 1)
  }

  private def riceCost(vs: Array[Long], from: Int, param: Int): Long = {
    var bits = 0L
    var i = from
    while (i < vs.length) {
      val v = vs(i)
      val u = if (v >= 0) v << 1 else ((-v) << 1) - 1
      bits += (u >>> param) + 1 + param
      i += 1
    }
    bits
  }

  private def bestRiceParam(vs: Array[Long], from: Int): Int =
    (0 to 14).minBy(p => riceCost(vs, from, p))

  // ---------------- UTF-8 coded frame number ----------------

  private def writeUtf8(w: BitWriter, n: Long): Unit = {
    if (n < 0x80) w.write(n, 8)
    else {
      val thresholds = Seq(0x80L, 0x800L, 0x10000L, 0x200000L, 0x4000000L,
        0x80000000L)
      val k = thresholds.indexWhere(n < _) // continuation bytes needed
      val lead = (0xfe << (6 - k)) & 0xff
      w.write((lead | (n >>> (6 * k)).toInt).toLong & 0xff, 8)
      var i = k - 1
      while (i >= 0) {
        w.write(0x80L | ((n >>> (6 * i)) & 0x3f), 8)
        i -= 1
      }
    }
  }

  private def readUtf8(r: BitReader): Long = {
    val b0 = r.read(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var k = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { k += 1; mask >>= 1 }
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < k) {
      val c = r.read(8).toInt
      require((c & 0xc0) == 0x80, "malformed UTF-8 frame number")
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  // ---------------- fixed predictors ----------------

  /** residuals of FIXED order `o` over x[from..): e[i] = Δ^o x */
  private def fixedResiduals(x: Array[Int], order: Int): Array[Long] = {
    val n = x.length - order
    val out = new Array[Long](math.max(n, 0))
    var i = order
    while (i < x.length) {
      out(i - order) = order match {
        case 0 => x(i).toLong
        case 1 => x(i).toLong - x(i - 1)
        case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
        case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
        case 4 => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) -
          4L * x(i - 3) + x(i - 4)
      }
      i += 1
    }
    out
  }

  private def fixedReconstruct(order: Int, warm: Array[Int],
      res: Array[Long]): Array[Int] = {
    val x = new Array[Int](order + res.length)
    System.arraycopy(warm, 0, x, 0, order)
    var i = order
    while (i < x.length) {
      val e = res(i - order)
      x(i) = (order match {
        case 0 => e
        case 1 => e + x(i - 1)
        case 2 => e + 2L * x(i - 1) - x(i - 2)
        case 3 => e + 3L * x(i - 1) - 3L * x(i - 2) + x(i - 3)
        case 4 => e + 4L * x(i - 1) - 6L * x(i - 2) + 4L * x(i - 3) - x(i - 4)
      }).toInt
      i += 1
    }
    x
  }

  // ---------------- encoder ----------------

  /** Explicit LPC request for tests: quantized integer coefficients
    * (newest-first, as the format stores them) and the right shift.
    */
  final case class LpcSpec(coefs: Array[Int], shift: Int, precision: Int)

  /** Quantized LPC via windowed autocorrelation + Levinson-Durbin — the
    * encoder's real compression path (FIXED stays the cheap fallback;
    * round-trip exactness never depends on coefficient quality, only
    * compression does).
    */
  private def analyzeLpc(x: Array[Int], maxOrder: Int = 8,
      precision: Int = 12): Option[LpcSpec] = {
    val n = x.length
    if (n < maxOrder * 4) return None
    val w = new Array[Double](n)
    var i = 0
    while (i < n) { // Welch window
      val t = (i - (n - 1) / 2.0) / ((n + 1) / 2.0)
      w(i) = x(i) * (1.0 - t * t)
      i += 1
    }
    val ac = new Array[Double](maxOrder + 1)
    var lag = 0
    while (lag <= maxOrder) {
      var s = 0.0
      var j = lag
      while (j < n) { s += w(j) * w(j - lag); j += 1 }
      ac(lag) = s
      lag += 1
    }
    if (ac(0) <= 0) return None
    val lpc = new Array[Double](maxOrder)
    var err = ac(0)
    var m = 0
    while (m < maxOrder) {
      var k = ac(m + 1)
      var j = 0
      while (j < m) { k -= lpc(j) * ac(m - j); j += 1 }
      k /= err
      val prev = lpc.clone()
      lpc(m) = k
      j = 0
      while (j < m) { lpc(j) = prev(j) - k * prev(m - 1 - j); j += 1 }
      err *= 1 - k * k
      if (err <= 0 || err.isNaN) return None
      m += 1
    }
    val maxc = lpc.map(math.abs).max
    if (maxc == 0 || maxc.isNaN || maxc.isInfinite) return None
    var shift = 14
    while (shift > 0 && maxc * (1L << shift) >= (1L << (precision - 1)) - 1)
      shift -= 1
    if (shift == 0) return None
    val q = lpc.map(c => math.max(-(1 << (precision - 1)),
      math.min((1 << (precision - 1)) - 1, math.round(c * (1L << shift)).toInt)))
    if (q.forall(_ == 0)) None else Some(LpcSpec(q, shift, precision))
  }

  private def lpcResiduals(x: Array[Int], spec: LpcSpec): Array[Long] = {
    val order = spec.coefs.length
    val res = new Array[Long](math.max(x.length - order, 0))
    var i = order
    while (i < x.length) {
      var pred = 0L
      var j = 0
      while (j < order) { pred += spec.coefs(j).toLong * x(i - 1 - j); j += 1 }
      res(i - order) = x(i) - (pred >> spec.shift)
      i += 1
    }
    res
  }

  /** Encode 16-bit PCM to a FLAC stream. `channels` interleaved in
    * `samples`; mono or independent stereo. `lpc` forces every subframe
    * through the LPC path (test surface for the decoder).
    */
  def encode(samples: Array[Short], channels: Int, sampleRate: Int,
      blockSize: Int = 4096, lpc: Option[LpcSpec] = None): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels=$channels")
    require(samples.nonEmpty, "empty input")
    require(samples.length % channels == 0, "ragged interleave")
    // bsCode 7 writes (bs-1) as a 16-bit field: larger blocks would
    // silently truncate and corrupt the stream, so fail fast
    require(blockSize >= 1 && blockSize <= 65536,
      s"blockSize must be in [1, 65536], got $blockSize")
    val perChannel = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    // STREAMINFO (last-metadata flag set, type 0, length 34)
    val si = new BitWriter
    si.write(1, 1); si.write(0, 7); si.write(34, 24)
    si.write(blockSize.toLong, 16); si.write(blockSize.toLong, 16)
    si.write(0, 24); si.write(0, 24) // min/max frame size unknown
    si.write(sampleRate.toLong, 20)
    si.write((channels - 1).toLong, 3)
    si.write(15, 5) // bits per sample - 1
    si.write(perChannel.toLong, 36)
    val md5 = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bb.putShort)
      d.digest(bb.array())
    }
    out.write(si.toBytes)
    out.write(md5)

    var frameNo = 0L
    var off = 0
    while (off < perChannel) {
      val bs = math.min(blockSize, perChannel - off)
      // header bytes first (tiny), so the CRC-8 can cover them
      val bsCode = if (bs == blockSize && bs == 4096) 12 else 7 // 16-bit follows
      val hw = new BitWriter
      hw.write(0x3ffe, 14); hw.write(0, 1); hw.write(0, 1)
      hw.write(bsCode.toLong, 4); hw.write(0, 4)
      hw.write((channels - 1).toLong, 4); hw.write(4, 3); hw.write(0, 1)
      writeUtf8(hw, frameNo)
      if (bsCode == 7) hw.write((bs - 1).toLong, 16)
      val hb = hw.toBytes
      val frame = new BitWriter
      hb.foreach(b => frame.write((b & 0xff).toLong, 8))
      frame.write(crc8(hb, 0, hb.length).toLong, 8)
      // subframes
      var ch = 0
      while (ch < channels) {
        val x = new Array[Int](bs)
        var i = 0
        while (i < bs) { x(i) = samples((off + i) * channels + ch); i += 1 }
        writeSubframe(frame, x, lpc)
        ch += 1
      }
      frame.alignByte()
      val fb = frame.toBytes
      out.write(fb)
      // CRC-16 over the whole frame incl. header
      val c16 = crc16(fb, 0, fb.length)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      frameNo += 1
      off += bs
    }
    out.toByteArray
  }

  private def emitLpcSubframe(w: BitWriter, x: Array[Int],
      spec: LpcSpec): Unit = {
    val order = spec.coefs.length
    w.write(0, 1)
    w.write((0x20 | (order - 1)).toLong, 6) // LPC, order bits = order-1
    w.write(0, 1) // no wasted bits
    var i = 0
    while (i < order) { w.write(x(i).toLong & 0xffff, 16); i += 1 }
    w.write((spec.precision - 1).toLong, 4)
    w.write(spec.shift.toLong, 5)
    spec.coefs.foreach(c => w.write(c.toLong & ((1L << spec.precision) - 1),
      spec.precision))
    writeResiduals(w, lpcResiduals(x, spec))
  }

  private def writeSubframe(w: BitWriter, x: Array[Int],
      lpc: Option[LpcSpec]): Unit = {
    lpc match {
      case Some(spec) if x.length > spec.coefs.length =>
        emitLpcSubframe(w, x, spec)
      case _ =>
        // constant?
        if (x.forall(_ == x(0))) {
          w.write(0, 1); w.write(0, 6); w.write(0, 1)
          w.write(x(0).toLong & 0xffff, 16)
          return
        }
        // candidates by exact bit cost: FIXED 0-2, analyzed LPC, VERBATIM
        val fixedCands = (0 to 2).filter(_ < x.length).map { o =>
          val res = fixedResiduals(x, o)
          val p = if (res.isEmpty) 0 else bestRiceParam(res, 0)
          (o, p, 16L * o + riceCost(res, 0, p))
        }
        val (order, param, fixedCost) = fixedCands.minBy(_._3)
        val lpcCand = analyzeLpc(x).map { spec =>
          val res = lpcResiduals(x, spec)
          val p = bestRiceParam(res, 0)
          (spec, 16L * spec.coefs.length + 9L +
            spec.precision.toLong * spec.coefs.length + riceCost(res, 0, p))
        }
        val verbatimCost = 16L * x.length
        if (lpcCand.exists(c => c._2 < fixedCost && c._2 < verbatimCost)) {
          emitLpcSubframe(w, x, lpcCand.get._1)
        } else if (fixedCost > verbatimCost) {
          w.write(0, 1); w.write(1, 6); w.write(0, 1)
          x.foreach(v => w.write(v.toLong & 0xffff, 16))
        } else {
          w.write(0, 1)
          w.write((0x08 | order).toLong, 6) // FIXED
          w.write(0, 1)
          var i = 0
          while (i < order) { w.write(x(i).toLong & 0xffff, 16); i += 1 }
          writeResiduals(w, fixedResiduals(x, order), Some(param))
        }
    }
  }

  private def writeResiduals(w: BitWriter, res: Array[Long],
      param0: Option[Int] = None): Unit = {
    val p = param0.getOrElse(if (res.isEmpty) 0 else bestRiceParam(res, 0))
    w.write(0, 2) // rice method 1 (4-bit params)
    w.write(0, 4) // partition order 0 → one partition
    w.write(p.toLong, 4)
    res.foreach(riceWrite(w, _, p))
  }

  // ---------------- decoder ----------------

  final case class FlacStream(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, samples: Array[Int],
      md5Ok: Boolean)

  def decode(bytes: Array[Byte]): FlacStream = {
    require(bytes.length > 42 && new String(bytes, 0, 4) == "fLaC",
      "not a FLAC stream")
    var pos = 4
    var sampleRate = 0; var channels = 0; var bps = 0
    var total = 0L
    var md5: Array[Byte] = null
    var last = false
    var sawStreamInfo = false
    while (!last) {
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      if (btype == 0) {
        sawStreamInfo = true
        val r = new BitReader(bytes, pos + 4)
        r.read(16); r.read(16); r.read(24); r.read(24)
        sampleRate = r.read(20).toInt
        channels = r.read(3).toInt + 1
        bps = r.read(5).toInt + 1
        total = r.read(36)
        md5 = java.util.Arrays.copyOfRange(bytes, pos + 4 + 18, pos + 4 + 34)
      }
      pos += 4 + len
    }
    require(sawStreamInfo, "FLAC without STREAMINFO")
    require(bps >= 4 && bps <= 32, s"bad FLAC bit depth $bps")
    require(total > 0, "FLAC stream with unknown total samples unsupported")
    val out = new java.io.ByteArrayOutputStream() // little-endian pcm for md5
    val all = new scala.collection.mutable.ArrayBuilder.ofInt
    var decoded = 0L
    while (decoded < total && pos + 2 < bytes.length) {
      val r = new BitReader(bytes, pos)
      val frameStart = pos
      require(r.read(14) == 0x3ffe, s"lost frame sync at byte $pos")
      r.read(1) // reserved
      r.read(1) // blocking strategy
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      val chanAsgn = r.read(4).toInt
      val ssCode = r.read(3).toInt
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case other =>
          throw new IllegalArgumentException(s"bad sample size code $other")
      }
      r.read(1)
      readUtf8(r)
      val bs = bsCode match {
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case n if n >= 8 => 256 << (n - 8)
        case _ => throw new IllegalArgumentException(s"bad blocksize code $bsCode")
      }
      srCode match {
        case 0 => // STREAMINFO
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case _ => // table codes carry no extra bytes
      }
      val headerEnd = r.bytePos
      val hcrc = r.read(8).toInt
      require(hcrc == crc8(bytes, frameStart, headerEnd),
        s"frame header CRC mismatch at byte $frameStart")
      val nch = chanAsgn match {
        case n if n <= 7 => n + 1
        case _ => 2 // stereo decorrelation modes
      }
      require(nch == channels, s"frame channels $nch != stream $channels")
      val chanSamples = Array.ofDim[Array[Int]](nch)
      var ch = 0
      while (ch < nch) {
        // stereo decorrelation: the difference channel carries one extra bit
        val extra = chanAsgn match {
          case 8 => if (ch == 1) 1 else 0  // left-side
          case 9 => if (ch == 0) 1 else 0  // right-side
          case 10 => if (ch == 1) 1 else 0 // mid-side
          case _ => 0
        }
        chanSamples(ch) = readSubframe(r, bs, frameBps + extra)
        ch += 1
      }
      // undo decorrelation
      val pcm: Array[Array[Int]] = chanAsgn match {
        case 8 => // left-side: right = left - side
          val l = chanSamples(0); val s = chanSamples(1)
          Array(l, Array.tabulate(bs)(i => l(i) - s(i)))
        case 9 => // right-side: left = right + side
          val s = chanSamples(0); val rgt = chanSamples(1)
          Array(Array.tabulate(bs)(i => rgt(i) + s(i)), rgt)
        case 10 => // mid-side
          val m = chanSamples(0); val s = chanSamples(1)
          val left = new Array[Int](bs); val right = new Array[Int](bs)
          var i = 0
          while (i < bs) {
            var mid = m(i) << 1
            mid |= s(i) & 1
            left(i) = (mid + s(i)) >> 1
            right(i) = (mid - s(i)) >> 1
            i += 1
          }
          Array(left, right)
        case _ => chanSamples
      }
      r.alignByte()
      val frameEnd = r.bytePos
      val fcrc = r.read(16).toInt
      require(fcrc == crc16(bytes, frameStart, frameEnd),
        s"frame CRC-16 mismatch at byte $frameStart")
      pos = r.bytePos
      // interleave; MD5 stream is little-endian at the declared bit depth
      val bytesPer = (bps + 7) / 8
      var i = 0
      while (i < bs) {
        var c = 0
        while (c < channels) {
          val v = pcm(c)(i)
          all += v
          var bi = 0
          while (bi < bytesPer) { out.write((v >> (8 * bi)) & 0xff); bi += 1 }
          c += 1
        }
        i += 1
      }
      decoded += bs
    }
    val pcmAll = all.result()
    val md5Ok = md5 == null || md5.forall(_ == 0) || {
      java.util.Arrays.equals(
        java.security.MessageDigest.getInstance("MD5").digest(out.toByteArray),
        md5)
    }
    FlacStream(sampleRate, channels, bps, total, pcmAll, md5Ok)
  }

  private def readSubframe(r: BitReader, bs: Int, bps: Int): Array[Int] = {
    require(r.read(1) == 0, "subframe padding bit set")
    val t = r.read(6).toInt
    val wasted = if (r.read(1) == 1) r.readUnary() + 1 else 0
    val eff = bps - wasted
    val x: Array[Int] = t match {
      case 0 => // CONSTANT
        val v = r.readSigned(eff).toInt
        Array.fill(bs)(v)
      case 1 => // VERBATIM
        Array.fill(bs)(r.readSigned(eff).toInt)
      case n if (n & 0x38) == 0x08 => // FIXED, order in low 3 bits
        val order = n & 0x07
        require(order <= 4, s"bad fixed order $order")
        val warm = Array.fill(order)(r.readSigned(eff).toInt)
        val res = readResiduals(r, bs, order)
        fixedReconstruct(order, warm, res)
      case n if (n & 0x20) != 0 => // LPC
        val order = (n & 0x1f) + 1
        val warm = Array.fill(order)(r.readSigned(eff).toInt)
        val precision = r.read(4).toInt + 1
        require(precision <= 15, "forbidden LPC precision")
        val shift = r.readSigned(5).toInt
        require(shift >= 0, "negative LPC shift")
        val coefs = Array.fill(order)(r.readSigned(precision).toInt)
        val res = readResiduals(r, bs, order)
        val out = new Array[Int](bs)
        System.arraycopy(warm, 0, out, 0, order)
        var i = order
        while (i < bs) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) = (res(i - order) + (pred >> shift)).toInt
          i += 1
        }
        out
      case other => throw new IllegalArgumentException(s"bad subframe type $other")
    }
    if (wasted > 0) x.map(_ << wasted) else x
  }

  private def readResiduals(r: BitReader, bs: Int, order: Int): Array[Long] = {
    val method = r.read(2).toInt
    require(method <= 1, s"bad residual method $method")
    val pbits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val po = r.read(4).toInt
    val parts = 1 << po
    val out = new Array[Long](bs - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (bs >> po) - (if (p == 0) order else 0)
      val param = r.read(pbits).toInt
      if (param == escape) {
        val width = r.read(5).toInt
        var i = 0
        while (i < count) { out(idx) = r.readSigned(width); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) { out(idx) = riceRead(r, param); idx += 1; i += 1 }
      }
      p += 1
    }
    out
  }

  // ---------------- metadata blocks (tags) ----------------

  /** (lastFlag, type, bodyFrom, bodyUntil) for each metadata block. */
  private def metadataBlocks(bytes: Array[Byte]): Seq[(Boolean, Int, Int, Int)] = {
    val out = Seq.newBuilder[(Boolean, Int, Int, Int)]
    var pos = 4
    var last = false
    while (!last && pos + 4 <= bytes.length) {
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val len = ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      if (pos + 4 + len > bytes.length) return out.result()
      out += ((last, hdr & 0x7f, pos + 4, pos + 4 + len))
      pos += 4 + len
    }
    out.result()
  }

  /** Friendly-named tags from the VORBIS_COMMENT metadata block (type 4,
    * the FLAC tag standard); no block → empty.
    */
  def readTags(bytes: Array[Byte]): Seq[(String, String)] = {
    require(bytes.length > 8 && new String(bytes, 0, 4) == "fLaC",
      "not a FLAC stream")
    metadataBlocks(bytes).collectFirst { case (_, 4, f, u) =>
      VorbisComments.parse(bytes, f, u)
    }.getOrElse(Seq.empty)
  }

  /** Splice a VORBIS_COMMENT block after the existing metadata (clears
    * the previous last-block flag) — the tagging twin of `Mp3.writeId3v2`
    * and the MP4 ilst writer.
    */
  def withTags(bytes: Array[Byte], tags: Seq[(String, String)]): Array[Byte] = {
    require(bytes.length > 8 && new String(bytes, 0, 4) == "fLaC",
      "not a FLAC stream")
    val blocks = metadataBlocks(bytes)
    require(blocks.nonEmpty, "FLAC without metadata blocks")
    val (_, _, _, lastEnd) = blocks.last
    val body = VorbisComments.write(tags)
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, lastEnd)
    // clear the last-block flag on what was the final block
    val patched = out.toByteArray
    blocks.foreach { case (wasLast, _, f, _) =>
      if (wasLast) patched(f - 4) = (patched(f - 4) & 0x7f).toByte
    }
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(patched, 0, patched.length)
    out2.write(0x80 | 4) // last + VORBIS_COMMENT
    out2.write((body.length >> 16) & 0xff)
    out2.write((body.length >> 8) & 0xff)
    out2.write(body.length & 0xff)
    out2.write(body, 0, body.length)
    out2.write(bytes, lastEnd, bytes.length - lastEnd) // audio frames
    out2.toByteArray
  }
}
