package graft.functions

/** JPEG 2000 Part 1 (ITU-T T.800) baseline codec — the PDF `JPXDecode`
  * filter for image XObjects (the reference decodes them via pdfium,
  * `/root/reference/pixeltable/functions/document.py:488`). Everything
  * here is built from the public T.800 spec; the MQ arithmetic coder is
  * shared with JBIG2 (`Jbig2.ArithDecoder`/`ArithEncoder` — T.88 Annex E
  * and T.800 Annex C define the identical state machine).
  *
  * Scope (decode): reversible 5/3 wavelet (lossless) AND the
  * irreversible 9/7 path (float lifting, scalar-expounded or no-quant
  * dequantization with midpoint reconstruction, ICT), MULTI-TILE
  * images on a grid anchored at the canvas origin (each tile an
  * independent DWT/packet space, one tile-part per tile, raster SOT
  * order not required), LRCP/RLCP progression, default precincts
  * (PPx = 15, one precinct per resolution), arbitrary decomposition
  * levels and code-block sizes, 1..4 components with the reversible
  * multiple-component transform (RCT), any number of quality layers
  * (per-block segments concatenate into one MQ codeword segment — the
  * default no-termination mode). Named skips: multiple tile-parts per
  * tile (TPsot > 0), derived quantization, precinct partitioning,
  * SOP/EPH, and coding-style extensions (bypass/termination/causal/
  * segmentation symbols) — each raises with a `jpx-...` message the
  * callers surface as notes.
  *
  * The encoder twin emits the same restricted codestream (one layer,
  * all passes included, 5/3 + optional RCT; `encodeTiled` for the
  * multi-tile form) so gates decode synthesized images bit-exactly
  * (the q189/q195 fixture pattern).
  */
object Jpeg2000 {
  import Jbig2.{ArithDecoder, ArithEncoder, Contexts}

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("jpx-" + msg)

  // ================= packet-header bit I/O (B.10.1 stuffing) =========

  /** MSB-first bit reader with JPEG 2000 header bit-stuffing: after a
    * consumed 0xFF byte, the next byte carries only 7 bits (its MSB is
    * a stuffed 0).
    */
  final class HdrBitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    private var lastByte = 0
    def bit(): Int = {
      if (cnt == 0) {
        val b = if (pos < data.length) data(pos) & 0xff else 0
        pos += 1
        if (lastByte == 0xff) { buf = b; cnt = 7 } // MSB is the stuffed 0
        else { buf = b; cnt = 8 }
        lastByte = b
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** End of a packet header: discard pad bits; a trailing 0xFF is
      * followed by a stuffed byte that belongs to the header.
      */
    def alignEnd(): Int = {
      cnt = 0
      if (lastByte == 0xff) { pos += 1; lastByte = 0 }
      pos
    }
  }

  /** Twin writer: emits the stuffed form `HdrBitReader` consumes. */
  final class HdrBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0
    private var cnt = 0
    private var lastByte = 0
    private def cap: Int = if (lastByte == 0xff) 7 else 8
    def bit(d: Int): Unit = {
      buf = (buf << 1) | (d & 1)
      cnt += 1
      if (cnt == cap) { out.write(buf); lastByte = buf; buf = 0; cnt = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def alignEnd(): Array[Byte] = {
      while (cnt != 0) bit(0)
      if (lastByte == 0xff) { out.write(0); lastByte = 0 }
      out.toByteArray
    }
  }

  // ========================= tag trees (B.10.2) ======================

  /** Tag tree over a w×h grid of leaf values. Decode and encode share
    * the node layout: level 0 = leaves, each higher level halves both
    * dimensions (ceil), root 1×1.
    */
  final class TagTree(val w: Int, val h: Int) {
    private val dims = {
      val b = Vector.newBuilder[(Int, Int)]
      var cw = w; var ch = h
      b += ((cw, ch))
      while (cw > 1 || ch > 1) {
        cw = (cw + 1) / 2; ch = (ch + 1) / 2
        b += ((cw, ch))
      }
      b.result()
    }
    private val offs = dims.scanLeft(0) { case (o, (cw, ch)) => o + cw * ch }
    private val n = offs.last
    val value = new Array[Int](n) // encoder: set leaves, call buildUp()
    private val low = new Array[Int](n)
    private val known = new Array[Boolean](n)

    private def nodePath(x: Int, y: Int): Seq[Int] = {
      var cx = x; var cy = y
      val path = (0 until dims.length).map { lvl =>
        val id = offs(lvl) + cy * dims(lvl)._1 + cx
        cx /= 2; cy /= 2
        id
      }
      path.reverse // root first
    }

    /** Encoder: fill internal nodes with the min of their children. */
    def buildUp(): Unit = {
      var lvl = 1
      while (lvl < dims.length) {
        val (cw, ch) = dims(lvl)
        val (pw, ph) = dims(lvl - 1)
        var y = 0
        while (y < ch) {
          var x = 0
          while (x < cw) {
            var m = Int.MaxValue
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val px = 2 * x + dx; val py = 2 * y + dy
                if (px < pw && py < ph)
                  m = math.min(m, value(offs(lvl - 1) + py * pw + px))
                dx += 1
              }
              dy += 1
            }
            value(offs(lvl) + y * cw + x) = m
            x += 1
          }
          y += 1
        }
        lvl += 1
      }
    }

    /** Decode: is leaf (x,y)'s value < threshold? Reveals bits as the
      * spec's procedure does; call with increasing thresholds only.
      */
    def decodeLess(br: HdrBitReader, x: Int, y: Int, threshold: Int)
        : Boolean = {
      var lo = 0
      var leafKnown = false
      var leafVal = 0
      nodePath(x, y).foreach { k =>
        if (low(k) < lo) low(k) = lo
        while (!known(k) && low(k) < threshold) {
          if (br.bit() == 1) known(k) = true else low(k) += 1
        }
        lo = low(k)
        leafKnown = known(k)
        leafVal = low(k)
      }
      leafKnown && leafVal < threshold
    }

    /** Decode the full value at a leaf (raise thresholds until known). */
    def decodeValue(br: HdrBitReader, x: Int, y: Int): Int = {
      var t = 1
      while (!decodeLess(br, x, y, t)) {
        t += 1
        if (t > (1 << 24)) fail("tagtree-unbounded")
      }
      t - 1
    }

    /** Encode: reveal enough bits that the decoder learns whether the
      * leaf value < threshold (call buildUp() first).
      */
    def encodeLess(bw: HdrBitWriter, x: Int, y: Int, threshold: Int)
        : Unit = {
      var lo = 0
      nodePath(x, y).foreach { k =>
        if (low(k) < lo) low(k) = lo
        while (!known(k) && low(k) < threshold) {
          if (low(k) == value(k)) { bw.bit(1); known(k) = true }
          else { bw.bit(0); low(k) += 1 }
        }
        lo = math.max(low(k), if (known(k)) value(k) else low(k))
      }
    }

    /** Encode the full value at a leaf. */
    def encodeValue(bw: HdrBitWriter, x: Int, y: Int): Unit = {
      val v = value(offs(0) + y * w + x)
      encodeLess(bw, x, y, v + 1)
    }
  }

  // ================= Tier-1 code-block coder (Annex D) ===============

  // context indices: 0-8 zero coding, 9-13 sign coding, 14-16 magnitude
  // refinement, 17 run-length, 18 uniform
  private val CtxRl = 17
  private val CtxUni = 18
  private val NumCtx = 19

  private def freshT1Contexts(): Contexts = {
    val cx = new Contexts(NumCtx)
    cx.i(0) = 4 // ZC context 0
    cx.i(CtxRl) = 3
    cx.i(CtxUni) = 46
    cx
  }

  // band orientation: 0 = LL, 1 = HL, 2 = LH, 3 = HH
  private def zcCtx(band: Int, h0: Int, v0: Int, d: Int): Int = {
    // Table D.1: HL swaps the roles of H and V; HH keys on D
    val (h, v) = if (band == 1) (v0, h0) else (h0, v0)
    if (band == 3) {
      if (d >= 3) 8
      else if (d == 2) { if (h + v >= 1) 7 else 6 }
      else if (d == 1) { if (h + v >= 2) 5 else if (h + v == 1) 4 else 3 }
      else { if (h + v >= 2) 2 else if (h + v == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else { // h == 0
        if (v == 2) 4
        else if (v == 1) 3
        else if (d >= 2) 2
        else if (d == 1) 1
        else 0
      }
    }
  }

  /** Sign-coding context and XOR bit from the clamped horizontal and
    * vertical sign contributions (Table D.3).
    */
  private def scCtx(hc: Int, vc: Int): (Int, Int) = (hc, vc) match {
    case (1, 1) => (13, 0)
    case (1, 0) => (12, 0)
    case (1, -1) => (11, 0)
    case (0, 1) => (10, 0)
    case (0, 0) => (9, 0)
    case (0, -1) => (10, 1)
    case (-1, 1) => (11, 1)
    case (-1, 0) => (12, 1)
    case (-1, -1) => (13, 1)
    case other => throw new IllegalStateException(other.toString)
  }

  /** Mutable per-code-block T1 state shared by encode and decode so the
    * context walks are identical by construction.
    */
  private final class T1Block(val w: Int, val h: Int, val band: Int) {
    val mag = new Array[Int](w * h)
    val neg = new Array[Boolean](w * h)
    val sig = new Array[Boolean](w * h)
    val visited = new Array[Boolean](w * h)
    val refined = new Array[Boolean](w * h)

    @inline def sigAt(x: Int, y: Int): Boolean =
      x >= 0 && y >= 0 && x < w && y < h && sig(y * w + x)
    @inline private def signC(x: Int, y: Int): Int =
      if (!sigAt(x, y)) 0 else if (neg(y * w + x)) -1 else 1

    def zcAt(x: Int, y: Int): Int = {
      val hh = (if (sigAt(x - 1, y)) 1 else 0) + (if (sigAt(x + 1, y)) 1 else 0)
      val vv = (if (sigAt(x, y - 1)) 1 else 0) + (if (sigAt(x, y + 1)) 1 else 0)
      val dd = (if (sigAt(x - 1, y - 1)) 1 else 0) +
        (if (sigAt(x + 1, y - 1)) 1 else 0) +
        (if (sigAt(x - 1, y + 1)) 1 else 0) +
        (if (sigAt(x + 1, y + 1)) 1 else 0)
      zcCtx(band, hh, vv, dd)
    }

    def scAt(x: Int, y: Int): (Int, Int) = {
      val hc = math.max(-1, math.min(1, signC(x - 1, y) + signC(x + 1, y)))
      val vc = math.max(-1, math.min(1, signC(x, y - 1) + signC(x, y + 1)))
      scCtx(hc, vc)
    }

    def mrCtx(x: Int, y: Int): Int =
      if (refined(y * w + x)) 16
      else if (zcAt(x, y) != 0) 15
      else 14
  }

  /** Decode `numPasses` coding passes of a code block whose most
    * significant magnitude bitplane is `planes - 1`. Returns
    * (magnitudes, negative flags).
    */
  def t1Decode(data: Array[Byte], from: Int, until: Int, w: Int, h: Int,
      band: Int, planes: Int, numPasses: Int)
      : (Array[Int], Array[Boolean]) = {
    val t = new T1Block(w, h, band)
    val ad = new ArithDecoder(data, from, until)
    val cx = freshT1Contexts()
    var passes = 0
    var p = planes - 1
    def decodeSign(x: Int, y: Int): Unit = {
      val (ctx, xor) = t.scAt(x, y)
      t.neg(y * w + x) = (ad.decode(cx, ctx) ^ xor) == 1
    }
    def spp(): Unit = stripes { (x, y) =>
      val i = y * w + x
      if (!t.sig(i)) {
        val ctx = t.zcAt(x, y)
        if (ctx != 0) {
          if (ad.decode(cx, ctx) == 1) {
            decodeSign(x, y)
            t.sig(i) = true
            t.mag(i) = 1 << p
          }
          t.visited(i) = true
        }
      }
    }
    def mrp(): Unit = stripes { (x, y) =>
      val i = y * w + x
      if (t.sig(i) && !t.visited(i)) {
        val bit = ad.decode(cx, t.mrCtx(x, y))
        t.refined(i) = true
        t.mag(i) |= bit << p
        t.visited(i) = true
      }
    }
    def cup(): Unit = {
      var y0 = 0
      while (y0 < h) {
        val sh = math.min(4, h - y0)
        var x = 0
        while (x < w) {
          var start = 0
          var runMode = sh == 4
          var yy = 0
          while (runMode && yy < 4) {
            val i = (y0 + yy) * w + x
            if (t.sig(i) || t.visited(i) || t.zcAt(x, y0 + yy) != 0)
              runMode = false
            yy += 1
          }
          if (runMode) {
            if (ad.decode(cx, CtxRl) == 0) start = 4 // whole column skipped
            else {
              val r = (ad.decode(cx, CtxUni) << 1) | ad.decode(cx, CtxUni)
              val i = (y0 + r) * w + x
              decodeSign(x, y0 + r)
              t.sig(i) = true
              t.mag(i) = 1 << p
              start = r + 1
            }
          }
          var y = start
          while (y < sh) {
            val i = (y0 + y) * w + x
            if (!t.sig(i) && !t.visited(i)) {
              if (ad.decode(cx, t.zcAt(x, y0 + y)) == 1) {
                decodeSign(x, y0 + y)
                t.sig(i) = true
                t.mag(i) = 1 << p
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
      java.util.Arrays.fill(t.visited, false)
    }
    def stripes(f: (Int, Int) => Unit): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) { f(x, y); y += 1 }
          x += 1
        }
        y0 += 4
      }
    }
    if (planes > 0 && numPasses > 0) {
      cup(); passes += 1 // the first pass of the MSB plane is a cleanup
      while (passes < numPasses && p > 0) {
        p -= 1
        if (passes < numPasses) { spp(); passes += 1 }
        if (passes < numPasses) { mrp(); passes += 1 }
        if (passes < numPasses) { cup(); passes += 1 }
      }
    }
    (t.mag, t.neg)
  }

  /** Encoder twin of `t1Decode`: codes EVERY pass of every nonzero
    * bitplane (single-layer lossless). Returns (codeword bytes,
    * planes, numPasses).
    */
  def t1Encode(coeffs: Array[Int], w: Int, h: Int, band: Int)
      : (Array[Byte], Int, Int) = {
    val t = new T1Block(w, h, band)
    var i = 0
    var maxMag = 0
    while (i < coeffs.length) {
      t.mag(i) = math.abs(coeffs(i))
      t.neg(i) = coeffs(i) < 0
      maxMag = math.max(maxMag, t.mag(i))
      i += 1
    }
    val planes = 32 - Integer.numberOfLeadingZeros(maxMag)
    if (planes == 0) return (Array.emptyByteArray, 0, 0)
    // live significance/visited state rebuilt during the pass walk;
    // t.mag/t.neg hold the TRUTH the passes reveal
    val truthMag = t.mag.clone()
    val truthNeg = t.neg.clone()
    java.util.Arrays.fill(t.mag, 0)
    java.util.Arrays.fill(t.neg, false)
    val enc = new ArithEncoder
    val cx = freshT1Contexts()
    var p = planes - 1
    def encodeSign(x: Int, y: Int): Unit = {
      val (ctx, xor) = t.scAt(x, y)
      enc.encode(cx, ctx, (if (truthNeg(y * w + x)) 1 else 0) ^ xor)
      t.neg(y * w + x) = truthNeg(y * w + x)
    }
    def bitAt(i: Int): Int = (truthMag(i) >> p) & 1
    def spp(): Unit = stripes { (x, y) =>
      val i = y * w + x
      if (!t.sig(i)) {
        val ctx = t.zcAt(x, y)
        if (ctx != 0) {
          val b = bitAt(i)
          enc.encode(cx, ctx, b)
          if (b == 1) {
            encodeSign(x, y)
            t.sig(i) = true
            t.mag(i) = 1 << p
          }
          t.visited(i) = true
        }
      }
    }
    def mrp(): Unit = stripes { (x, y) =>
      val i = y * w + x
      if (t.sig(i) && !t.visited(i)) {
        enc.encode(cx, t.mrCtx(x, y), bitAt(i))
        t.refined(i) = true
        t.mag(i) |= bitAt(i) << p
        t.visited(i) = true
      }
    }
    def cup(): Unit = {
      var y0 = 0
      while (y0 < h) {
        val sh = math.min(4, h - y0)
        var x = 0
        while (x < w) {
          var start = 0
          var runMode = sh == 4
          var yy = 0
          while (runMode && yy < 4) {
            val i = (y0 + yy) * w + x
            if (t.sig(i) || t.visited(i) || t.zcAt(x, y0 + yy) != 0)
              runMode = false
            yy += 1
          }
          if (runMode) {
            var r = -1
            var yy2 = 0
            while (r < 0 && yy2 < 4) {
              if (bitAt((y0 + yy2) * w + x) == 1) r = yy2
              yy2 += 1
            }
            if (r < 0) { enc.encode(cx, CtxRl, 0); start = 4 }
            else {
              enc.encode(cx, CtxRl, 1)
              enc.encode(cx, CtxUni, (r >> 1) & 1)
              enc.encode(cx, CtxUni, r & 1)
              val i = (y0 + r) * w + x
              encodeSign(x, y0 + r)
              t.sig(i) = true
              t.mag(i) = 1 << p
              start = r + 1
            }
          }
          var y = start
          while (y < sh) {
            val i = (y0 + y) * w + x
            if (!t.sig(i) && !t.visited(i)) {
              val b = bitAt(i)
              enc.encode(cx, t.zcAt(x, y0 + y), b)
              if (b == 1) {
                encodeSign(x, y0 + y)
                t.sig(i) = true
                t.mag(i) = 1 << p
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
      java.util.Arrays.fill(t.visited, false)
    }
    def stripes(f: (Int, Int) => Unit): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) { f(x, y); y += 1 }
          x += 1
        }
        y0 += 4
      }
    }
    cup()
    var passes = 1
    while (p > 0) {
      p -= 1
      spp(); mrp(); cup()
      passes += 3
    }
    (enc.flush(), planes, passes)
  }

  // ================= reversible 5/3 wavelet (Annex F) ================

  @inline private def reflect(i: Int, n: Int): Int =
    if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i

  /** In-place forward 5/3 lifting on one interleaved line (even = low
    * phase). After the call, even indices hold the low band, odd the
    * high band (still interleaved).
    */
  private def fwd53(n: Int, get: Int => Int,
      set: (Int, Int) => Unit): Unit = {
    if (n <= 1) return
    def at(i: Int): Int = get(reflect(i, n))
    var i = 1
    while (i < n) { // predict odds from original evens
      set(i, get(i) - Math.floorDiv(at(i - 1) + at(i + 1), 2))
      i += 2
    }
    i = 0
    while (i < n) { // update evens from lifted odds
      set(i, get(i) + Math.floorDiv(at(i - 1) + at(i + 1) + 2, 4))
      i += 2
    }
  }

  /** In-place inverse 5/3 lifting (mirror of `fwd53`). */
  private def inv53(n: Int, get: Int => Int,
      set: (Int, Int) => Unit): Unit = {
    if (n <= 1) return
    def at(i: Int): Int = get(reflect(i, n))
    var i = 0
    while (i < n) { // un-update evens from odds
      set(i, get(i) - Math.floorDiv(at(i - 1) + at(i + 1) + 2, 4))
      i += 2
    }
    i = 1
    while (i < n) { // un-predict odds from restored evens
      set(i, get(i) + Math.floorDiv(at(i - 1) + at(i + 1), 2))
      i += 2
    }
  }

  /** Forward 2D DWT over the top-left cw×ch region of `a` (row stride
    * `stride`), one level, leaving subbands INTERLEAVED (even/even LL,
    * odd-x HL, odd-y LH, odd/odd HH). Columns first, then rows — the
    * inverse applies rows first.
    */
  def fwdDwtLevel(a: Array[Int], stride: Int, cw: Int, ch: Int): Unit = {
    var x = 0
    while (x < cw) {
      val c = x
      fwd53(ch, i => a(i * stride + c), (i, v) => a(i * stride + c) = v)
      x += 1
    }
    var y = 0
    while (y < ch) {
      val r = y * stride
      fwd53(cw, i => a(r + i), (i, v) => a(r + i) = v)
      y += 1
    }
  }

  /** Inverse of `fwdDwtLevel`. */
  def invDwtLevel(a: Array[Int], stride: Int, cw: Int, ch: Int): Unit = {
    var y = 0
    while (y < ch) {
      val r = y * stride
      inv53(cw, i => a(r + i), (i, v) => a(r + i) = v)
      y += 1
    }
    var x = 0
    while (x < cw) {
      val c = x
      inv53(ch, i => a(i * stride + c), (i, v) => a(i * stride + c) = v)
      x += 1
    }
  }

  /** De-interleave one level's subbands out of the top-left cw×ch
    * region: returns (LL, HL, LH, HH) with LL left in place semantics
    * delegated to the caller via the returned arrays.
    */
  def deinterleave(a: Array[Int], stride: Int, cw: Int, ch: Int)
      : (Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val lw = (cw + 1) / 2; val lh = (ch + 1) / 2
    val hw = cw / 2; val hh = ch / 2
    val ll = new Array[Int](lw * lh)
    val hl = new Array[Int](hw * lh)
    val lhB = new Array[Int](lw * hh)
    val hhB = new Array[Int](hw * hh)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        val v = a(y * stride + x)
        if ((x & 1) == 0 && (y & 1) == 0) ll((y / 2) * lw + x / 2) = v
        else if ((x & 1) == 1 && (y & 1) == 0) hl((y / 2) * hw + x / 2) = v
        else if ((x & 1) == 0) lhB((y / 2) * lw + x / 2) = v
        else hhB((y / 2) * hw + x / 2) = v
        x += 1
      }
      y += 1
    }
    (ll, hl, lhB, hhB)
  }

  /** Interleave subbands back into the top-left cw×ch region. */
  def interleave(a: Array[Int], stride: Int, cw: Int, ch: Int,
      ll: Array[Int], hl: Array[Int], lh: Array[Int],
      hh: Array[Int]): Unit = {
    val lw = (cw + 1) / 2
    val hw = cw / 2
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        val v =
          if ((x & 1) == 0 && (y & 1) == 0) ll((y / 2) * lw + x / 2)
          else if ((x & 1) == 1 && (y & 1) == 0) hl((y / 2) * hw + x / 2)
          else if ((x & 1) == 0) lh((y / 2) * lw + x / 2)
          else hh((y / 2) * hw + x / 2)
        a(y * stride + x) = v
        x += 1
      }
      y += 1
    }
  }

  // ================= reversible component transform (G.2) ============

  /** Forward RCT in place over three equal-length component planes. */
  def fwdRct(c0: Array[Int], c1: Array[Int], c2: Array[Int]): Unit = {
    var i = 0
    while (i < c0.length) {
      val r = c0(i); val g = c1(i); val b = c2(i)
      c0(i) = Math.floorDiv(r + 2 * g + b, 4)
      c1(i) = b - g
      c2(i) = r - g
      i += 1
    }
  }

  /** Inverse RCT in place. */
  def invRct(c0: Array[Int], c1: Array[Int], c2: Array[Int]): Unit = {
    var i = 0
    while (i < c0.length) {
      val y = c0(i); val u = c1(i); val v = c2(i)
      val g = y - Math.floorDiv(u + v, 4)
      c1(i) = g
      c0(i) = v + g
      c2(i) = u + g
      i += 1
    }
  }

  // ============== irreversible 9/7 wavelet + ICT (F.4.8, G.3) ========

  private val A97 = -1.586134342059924
  private val B97 = -0.052980118572961
  private val G97 = 0.882911075530934
  private val D97 = 0.443506852043971
  private val K97 = 1.230174104914001

  private def fwd97(n: Int, get: Int => Double,
      set: (Int, Double) => Unit): Unit = {
    if (n <= 1) return
    def at(i: Int): Double = get(reflect(i, n))
    def lift(phase: Int, c: Double): Unit = {
      var i = phase
      while (i < n) { set(i, get(i) + c * (at(i - 1) + at(i + 1))); i += 2 }
    }
    lift(1, A97); lift(0, B97); lift(1, G97); lift(0, D97)
    var i = 0
    while (i < n) { set(i, get(i) / K97); i += 2 }
    i = 1
    while (i < n) { set(i, get(i) * K97); i += 2 }
  }

  private def inv97(n: Int, get: Int => Double,
      set: (Int, Double) => Unit): Unit = {
    if (n <= 1) return
    def at(i: Int): Double = get(reflect(i, n))
    var i = 0
    while (i < n) { set(i, get(i) * K97); i += 2 }
    i = 1
    while (i < n) { set(i, get(i) / K97); i += 2 }
    def lift(phase: Int, c: Double): Unit = {
      var j = phase
      while (j < n) { set(j, get(j) - c * (at(j - 1) + at(j + 1))); j += 2 }
    }
    lift(0, D97); lift(1, G97); lift(0, B97); lift(1, A97)
  }

  def fwdDwt97Level(a: Array[Double], stride: Int, cw: Int,
      ch: Int): Unit = {
    var x = 0
    while (x < cw) {
      val c = x
      fwd97(ch, i => a(i * stride + c), (i, v) => a(i * stride + c) = v)
      x += 1
    }
    var y = 0
    while (y < ch) {
      val r = y * stride
      fwd97(cw, i => a(r + i), (i, v) => a(r + i) = v)
      y += 1
    }
  }

  def invDwt97Level(a: Array[Double], stride: Int, cw: Int,
      ch: Int): Unit = {
    var y = 0
    while (y < ch) {
      val r = y * stride
      inv97(cw, i => a(r + i), (i, v) => a(r + i) = v)
      y += 1
    }
    var x = 0
    while (x < cw) {
      val c = x
      inv97(ch, i => a(i * stride + c), (i, v) => a(i * stride + c) = v)
      x += 1
    }
  }

  /** Irreversible color transform (G.3): RGB → YCbCr, floats. */
  def fwdIct(c0: Array[Double], c1: Array[Double],
      c2: Array[Double]): Unit = {
    var i = 0
    while (i < c0.length) {
      val r = c0(i); val g = c1(i); val b = c2(i)
      c0(i) = 0.299 * r + 0.587 * g + 0.114 * b
      c1(i) = -0.16875 * r - 0.33126 * g + 0.5 * b
      c2(i) = 0.5 * r - 0.41869 * g - 0.08131 * b
      i += 1
    }
  }

  def invIct(c0: Array[Double], c1: Array[Double],
      c2: Array[Double]): Unit = {
    var i = 0
    while (i < c0.length) {
      val y = c0(i); val cb = c1(i); val cr = c2(i)
      c0(i) = y + 1.402 * cr
      c1(i) = y - 0.34413 * cb - 0.71414 * cr
      c2(i) = y + 1.772 * cb
      i += 1
    }
  }

  // ===================== codestream (Annex A/B) ======================

  /** Band geometry: orientation (0 LL / 1 HL / 2 LH / 3 HH), width,
    * height; plus the packet-order listing for a resolution.
    */
  private final case class Band(orient: Int, w: Int, h: Int)

  private def dimAt(n: Int, k: Int): Int = {
    var v = n
    var i = 0
    while (i < k) { v = (v + 1) / 2; i += 1 }
    v
  }

  /** Bands of resolution r (0..NL) for a w×h component. */
  private def bandsOf(w: Int, h: Int, nl: Int, r: Int): Seq[Band] =
    if (r == 0) Seq(Band(0, dimAt(w, nl), dimAt(h, nl)))
    else {
      val l = nl - r + 1 // decomposition level these bands belong to
      val pw = dimAt(w, l - 1); val ph = dimAt(h, l - 1)
      val lw = dimAt(w, l); val lh = dimAt(h, l)
      Seq(Band(1, pw - lw, lh), Band(2, lw, ph - lh),
        Band(3, pw - lw, ph - lh))
    }

  /** Decoded image: per-component sample planes (already DC-shifted
    * back and clamped), full resolution.
    */
  final case class JpxImage(width: Int, height: Int, depth: Int,
      comps: Array[Array[Int]])

  private final class BlockState {
    var included = false
    var lblock = 3
    var zbp = 0
    var passes = 0
    val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val bytes = new java.io.ByteArrayOutputStream()
  }

  /** Decode a raw JPEG 2000 codestream (SOC..EOC — the form a PDF
    * JPXDecode stream carries directly or inside a JP2 wrapper, which
    * `decode` unwraps).
    */
  def decode(data0: Array[Byte]): JpxImage = {
    val data = unwrapJp2(data0)
    var p = 0
    def u16(i: Int): Int =
      if (i + 2 <= data.length) ((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)
      else fail("truncated")
    def u32(i: Int): Long =
      if (i + 4 <= data.length)
        ((data(i) & 0xffL) << 24) | ((data(i + 1) & 0xffL) << 16) |
          ((data(i + 2) & 0xffL) << 8) | (data(i + 3) & 0xffL)
      else fail("truncated")
    if (u16(0) != 0xff4f) fail("no-soc")
    p = 2
    var w = 0; var h = 0; var comps = 0; var depth = 0
    var nl = -1; var cbw = 0; var cbh = 0; var layers = 1; var mct = 0
    var prog = 0
    var guard = 0
    var irrev = false
    var exps: Array[Int] = null
    var mus: Array[Int] = null
    var sotAt = -1
    var xtSiz = 0; var ytSiz = 0
    while (sotAt < 0) {
      val mk = u16(p)
      mk match {
        case 0xff51 => // SIZ
          val len = u16(p + 2)
          w = u32(p + 6).toInt; h = u32(p + 10).toInt
          val xo = u32(p + 14).toInt; val yo = u32(p + 18).toInt
          val xt = u32(p + 22).toInt; val yt = u32(p + 26).toInt
          val xto = u32(p + 30).toInt; val yto = u32(p + 34).toInt
          comps = u16(p + 38)
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) fail("dims")
          if (xo != 0 || yo != 0 || xto != 0 || yto != 0) fail("grid-offset")
          if (xt <= 0 || yt <= 0) fail("tile-size")
          xtSiz = xt; ytSiz = yt
          if (comps < 1 || comps > 4) fail("components")
          if (p + 40 + 3 * comps > data.length) fail("truncated")
          val ssiz = data(p + 40) & 0xff
          if ((ssiz & 0x80) != 0) fail("signed-samples")
          depth = (ssiz & 0x7f) + 1
          if (depth > 16) fail("depth")
          var c = 0
          while (c < comps) {
            if ((data(p + 40 + 3 * c) & 0xff) != ssiz) fail("mixed-depth")
            if ((data(p + 41 + 3 * c) & 0xff) != 1 ||
              (data(p + 42 + 3 * c) & 0xff) != 1) fail("subsampled")
            c += 1
          }
          p += 2 + len
        case 0xff52 => // COD
          val len = u16(p + 2)
          if (p + 14 > data.length) fail("truncated")
          val scod = data(p + 4) & 0xff
          if ((scod & 1) != 0) fail("precincts")
          if ((scod & 6) != 0) fail("sop-eph")
          prog = data(p + 5) & 0xff
          if (prog > 1) fail(s"progression-$prog")
          layers = u16(p + 6)
          mct = data(p + 8) & 0xff
          nl = data(p + 9) & 0xff
          if (nl > 16) fail("levels")
          cbw = 1 << ((data(p + 10) & 0x0f) + 2)
          cbh = 1 << ((data(p + 11) & 0x0f) + 2)
          if (cbw.toLong * cbh > 4096) fail("cb-size")
          if ((data(p + 12) & 0xff) != 0) fail("cb-style")
          irrev = (data(p + 13) & 0xff) match {
            case 0 => true // 9/7 irreversible
            case 1 => false // 5/3 reversible
            case other => fail(s"wavelet-$other")
          }
          p += 2 + len
        case 0xff5c => // QCD
          val len = u16(p + 2)
          if (len < 3 || p + 2 + len > data.length) fail("truncated")
          val sq = data(p + 4) & 0xff
          guard = sq >> 5
          (sq & 0x1f) match {
            case 0 => // no quantization (reversible): 1-byte exponents
              exps = (0 until len - 3)
                .map(i => (data(p + 5 + i) & 0xff) >> 3).toArray
              mus = Array.fill(exps.length)(0)
            case 2 => // scalar expounded: 16-bit (exp, mantissa) pairs
              val n = (len - 3) / 2
              exps = (0 until n).map(i => u16(p + 5 + 2 * i) >> 11).toArray
              mus = (0 until n).map(i => u16(p + 5 + 2 * i) & 0x7ff).toArray
            case 1 => fail("quant-derived")
            case other => fail(s"quant-style-$other")
          }
          p += 2 + len
        case 0xff53 | 0xff5d => fail("per-component-coding") // COC/QCC
        case 0xff90 => // SOT: main header complete; tile loop takes over
          sotAt = p
        case 0xff64 | 0xff55 | 0xff57 | 0xff58 | 0xff60 | 0xff61 |
            0xff63 => // COM/TLM/PLM/PLT/PPM/PPT/CRG: skip by length
          if (mk == 0xff60 || mk == 0xff61) fail("packed-headers")
          p += 2 + u16(p + 2)
        case other => fail(f"marker-$other%04x")
      }
    }
    if (nl < 0 || exps == null) fail("missing-cod-qcd")
    if (exps.length < 3 * nl + 1) fail("qcd-bands")
    val nbands = 3 * nl + 1
    val xTiles = ((w.toLong + xtSiz - 1) / xtSiz).toInt
    val yTiles = ((h.toLong + ytSiz - 1) / ytSiz).toInt
    if (xTiles.toLong * yTiles > 4096) fail("tile-count")
    // collect tile-parts in stream order: one part per tile (TPsot > 0
    // is a named skip), each SOT..SOD header directly followed by its
    // packet body, terminated by the next SOT or EOC
    val parts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    p = sotAt
    var more = true
    while (more) {
      if (p + 12 > data.length || u16(p) != 0xff90) fail("no-sot")
      val lsot = u16(p + 2)
      val isot = u16(p + 4)
      val psot = u32(p + 6)
      if ((data(p + 10) & 0xff) != 0 || (data(p + 11) & 0xff) > 1)
        fail("tile-parts")
      if (isot >= xTiles * yTiles) fail("tile-index")
      val tEnd: Int =
        if (psot == 0) data.length
        else if (psot < 14 || p + psot > data.length) fail("tile-length")
        else (p + psot).toInt
      val q = p + 2 + lsot
      if (q + 2 > data.length || u16(q) != 0xff93) fail("no-sod")
      parts += ((isot, q + 2, tEnd))
      p = tEnd
      more = p + 2 <= data.length && u16(p) == 0xff90
    }
    // ------- per-tile decode: the parameters SHADOW the image dims so
    // the band/packet/T1/DWT machinery below operates on the tile grid
    def decodeTile(w: Int, h: Int, pFrom: Int, pUntil: Int)
        : Array[Either[Array[Double], Array[Int]]] = {
    var p = pFrom
    val end = math.min(pUntil,
      // EOC terminates; packet bodies never contain FF D9 (bit stuffing
      // keeps coded bytes <= FF8F after FF)
      data.length - 2)
    // per component/band/block decode state
    def expOf(r: Int, bi: Int): Int =
      exps(if (r == 0) 0 else 1 + 3 * (r - 1) + bi)
    val state = Array.tabulate(comps) { _ =>
      (0 to nl).map { r =>
        bandsOf(w, h, nl, r).map { b =>
          val nbx = if (b.w == 0) 0 else (b.w + cbw - 1) / cbw
          val nby = if (b.h == 0) 0 else (b.h + cbh - 1) / cbh
          (b, Array.fill(nby, nbx)(new BlockState),
            new TagTree(math.max(nbx, 1), math.max(nby, 1)),
            new TagTree(math.max(nbx, 1), math.max(nby, 1)))
        }
      }
    }
    // packet walk: LRCP or RLCP — identical inner packet structure
    val order =
      if (prog == 0)
        for (l <- 0 until layers; r <- 0 to nl; c <- 0 until comps)
          yield (l, r, c)
      else
        for (r <- 0 to nl; l <- 0 until layers; c <- 0 until comps)
          yield (l, r, c)
    order.foreach { case (layer, r, c) =>
      if (p < end) {
        val br = new HdrBitReader(data, p)
        if (br.bit() == 1) {
          val bodies =
            scala.collection.mutable.ArrayBuffer.empty[(BlockState, Int)]
          state(c)(r).foreach { case (band, blocks, incl, zb) =>
            for (by <- blocks.indices; bx <- blocks(by).indices) {
              val st = blocks(by)(bx)
              val included =
                if (!st.included) incl.decodeLess(br, bx, by, layer + 1)
                else br.bit() == 1
              if (included) {
                if (!st.included) {
                  st.zbp = zb.decodeValue(br, bx, by)
                  st.included = true
                }
                val np = {
                  if (br.bit() == 0) 1
                  else if (br.bit() == 0) 2
                  else {
                    val v = br.bits(2)
                    if (v < 3) 3 + v
                    else {
                      val v2 = br.bits(5)
                      if (v2 < 31) 6 + v2 else 37 + br.bits(7)
                    }
                  }
                }
                while (br.bit() == 1) st.lblock += 1
                val lenBits = st.lblock +
                  (31 - Integer.numberOfLeadingZeros(np))
                val byteLen = br.bits(lenBits)
                if (byteLen < 0 || byteLen > (1 << 24)) fail("seg-length")
                st.passes += np
                st.segs += ((np, byteLen))
                bodies += ((st, byteLen))
              }
            }
          }
          p = br.alignEnd()
          bodies.foreach { case (st, len) =>
            if (p + len > data.length) fail("truncated-body")
            st.bytes.write(data, p, len)
            p += len
          }
        } else p = br.alignEnd()
      }
    }
    // Tier-1 decode + assemble subbands, then inverse DWT per component
    val out = Array.tabulate[Either[Array[Double], Array[Int]]](comps) { c =>
      val bandCoeffs = (0 to nl).map { r =>
        state(c)(r).map { case (band, blocks, _, _) =>
          val coeffs = new Array[Int](math.max(band.w * band.h, 0))
          for (by <- blocks.indices; bx <- blocks(by).indices) {
            val st = blocks(by)(bx)
            val x0 = bx * cbw; val y0 = by * cbh
            val bw = math.min(cbw, band.w - x0)
            val bh = math.min(cbh, band.h - y0)
            if (st.included && st.passes > 0) {
              val mb = guard + expOf(r, band.orient match {
                case 0 => 0
                case o => o - 1
              }) - 1
              val planes = mb - st.zbp
              if (planes < 0 || planes > 31) fail("planes")
              val seg = st.bytes.toByteArray
              val (mags, negs) =
                t1Decode(seg, 0, seg.length, bw, bh, band.orient, planes,
                  st.passes)
              var yy = 0
              while (yy < bh) {
                var xx = 0
                while (xx < bw) {
                  val m = mags(yy * bw + xx)
                  coeffs((y0 + yy) * band.w + x0 + xx) =
                    if (negs(yy * bw + xx)) -m else m
                  xx += 1
                }
                yy += 1
              }
            }
          }
          (band, coeffs)
        }
      }
      if (!irrev) {
        // iterative synthesis: LL_nl + level bands -> full plane
        var cur = bandCoeffs(0).head._2
        var lvl = nl
        while (lvl >= 1) {
          val r = nl - lvl + 1
          val cw = dimAt(w, lvl - 1); val ch = dimAt(h, lvl - 1)
          val a = new Array[Int](cw * ch)
          val Seq((_, hl), (_, lh), (_, hh)) = bandCoeffs(r)
          interleave(a, cw, cw, ch, cur, hl, lh, hh)
          invDwtLevel(a, cw, cw, ch)
          cur = a
          lvl -= 1
        }
        Right(cur)
      } else {
        // 9/7: dequantize (midpoint reconstruction) to doubles, then
        // float synthesis
        def dequant(r: Int, orient: Int, q: Array[Int]): Array[Double] = {
          val bi = if (orient == 0) 0 else orient - 1
          val gain = orient match {
            case 0 => 0
            case 3 => 2
            case _ => 1
          }
          val qi = if (r == 0) 0 else 1 + 3 * (r - 1) + bi
          val delta = math.pow(2.0, (depth + gain) - exps(qi)) *
            (1.0 + mus(qi) / 2048.0)
          q.map { v =>
            if (v == 0) 0.0
            else if (v > 0) (v + 0.5) * delta
            else (v - 0.5) * delta
          }
        }
        var cur = dequant(0, 0, bandCoeffs(0).head._2)
        var lvl = nl
        while (lvl >= 1) {
          val r = nl - lvl + 1
          val cw = dimAt(w, lvl - 1); val ch = dimAt(h, lvl - 1)
          val a = new Array[Double](cw * ch)
          val Seq((b1, hlQ), (b2, lhQ), (b3, hhQ)) = bandCoeffs(r)
          val hl = dequant(r, b1.orient, hlQ)
          val lh = dequant(r, b2.orient, lhQ)
          val hh = dequant(r, b3.orient, hhQ)
          val lw = (cw + 1) / 2
          val hw = cw / 2
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              a(y * cw + x) =
                if ((x & 1) == 0 && (y & 1) == 0) cur((y / 2) * lw + x / 2)
                else if ((x & 1) == 1 && (y & 1) == 0)
                  hl((y / 2) * hw + x / 2)
                else if ((x & 1) == 0) lh((y / 2) * lw + x / 2)
                else hh((y / 2) * hw + x / 2)
              x += 1
            }
            y += 1
          }
          invDwt97Level(a, cw, cw, ch)
          cur = a
          lvl -= 1
        }
        Left(cur)
      }
    }
    out
    } // decodeTile
    // assemble tiles into full-image planes (missing tiles stay zero →
    // mid-gray after the DC shift, fail-soft for truncated streams)
    val out: Array[Either[Array[Double], Array[Int]]] =
      Array.tabulate(comps) { _ =>
        if (irrev) Left(new Array[Double](w * h))
        else Right(new Array[Int](w * h))
      }
    parts.foreach { case (isot, from, until) =>
      val ti = isot % xTiles; val tj = isot / xTiles
      val tx0 = ti * xtSiz; val ty0 = tj * ytSiz
      val tw = math.min(xtSiz, w - tx0); val th = math.min(ytSiz, h - ty0)
      if (tw <= 0 || th <= 0) fail("tile-index")
      val tileOut = decodeTile(tw, th, from, until)
      var c = 0
      while (c < comps) {
        (out(c), tileOut(c)) match {
          case (Right(dst), Right(src)) =>
            var y = 0
            while (y < th) {
              System.arraycopy(src, y * tw, dst, (ty0 + y) * w + tx0, tw)
              y += 1
            }
          case (Left(dst), Left(src)) =>
            var y = 0
            while (y < th) {
              System.arraycopy(src, y * tw, dst, (ty0 + y) * w + tx0, tw)
              y += 1
            }
          case _ => fail("tile-mix")
        }
        c += 1
      }
    }
    val off = 1 << (depth - 1)
    val maxV = (1 << depth) - 1
    val planesOut: Array[Array[Int]] =
      if (!irrev) {
        val ints = out.map(_.toOption.get)
        if (mct == 1) {
          if (comps < 3) fail("mct-components")
          invRct(ints(0), ints(1), ints(2))
        }
        ints
      } else {
        val dbls = out.map(_.swap.toOption.get)
        if (mct == 1) {
          if (comps < 3) fail("mct-components")
          invIct(dbls(0), dbls(1), dbls(2))
        }
        dbls.map(_.map(v => math.round(v).toInt))
      }
    planesOut.foreach { plane =>
      var i = 0
      while (i < plane.length) {
        plane(i) = math.max(0, math.min(maxV, plane(i) + off))
        i += 1
      }
    }
    JpxImage(w, h, depth, planesOut)
  }

  /** A PDF JPXDecode stream may carry the raw codestream or a JP2 box
    * wrapper — find the `jp2c` contiguous-codestream box.
    */
  private def unwrapJp2(data: Array[Byte]): Array[Byte] = {
    if (data.length >= 2 && (data(0) & 0xff) == 0xff &&
      (data(1) & 0xff) == 0x4f) return data
    var p = 0
    while (p + 8 <= data.length) {
      val len = ((data(p) & 0xffL) << 24) | ((data(p + 1) & 0xffL) << 16) |
        ((data(p + 2) & 0xffL) << 8) | (data(p + 3) & 0xffL)
      val typ = new String(data, p + 4, 4, "ISO-8859-1")
      val (from, until) =
        if (len == 1) {
          if (p + 16 > data.length) fail("jp2-box")
          var xl = 0L
          var i = 0
          while (i < 8) { xl = (xl << 8) | (data(p + 8 + i) & 0xffL); i += 1 }
          (p + 16, p + math.min(xl, data.length.toLong).toInt)
        } else if (len == 0) (p + 8, data.length)
        else (p + 8, p + math.min(len, data.length.toLong).toInt)
      if (typ == "jp2c")
        return java.util.Arrays.copyOfRange(data, from,
          math.max(from, until))
      if (until <= p) fail("jp2-box")
      p = until
    }
    fail("no-codestream")
  }

  // ======================== encoder twin =============================

  /** Encode component planes (unsigned `depth`-bit samples, full
    * resolution, length w*h each) as a single-tile, single-layer,
    * lossless 5/3 codestream. `useRct` applies the reversible color
    * transform (requires exactly 3 components).
    */
  def encode(planes: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int, cbExp: Int = 6, useRct: Boolean = false): Array[Byte] = {
    require(planes.nonEmpty && planes.forall(_.length == w * h))
    require(!useRct || planes.length == 3)
    require(levels >= 0 && levels <= 16 && cbExp >= 2 && cbExp <= 6)
    val comps = planes.length
    val off = 1 << (depth - 1)
    val work = planes.map(_.map(_ - off))
    if (useRct) fwdRct(work(0), work(1), work(2))
    emitCodestream(w, h, depth, comps, levels, cbExp,
      mct = if (useRct) 1 else 0, irrev = false,
      bands53(work, w, h, levels), eps = null)
  }

  /** Forward 5/3 DWT per component → per-resolution band arrays. */
  private def bands53(work: Array[Array[Int]], w: Int, h: Int,
      levels: Int): IndexedSeq[IndexedSeq[Seq[Array[Int]]]] = {
    val bandCoeffs = work.map { plane =>
      var cur = plane
      var cw = w; var ch = h
      val perLevel =
        scala.collection.mutable.ArrayBuffer
          .empty[(Array[Int], Array[Int], Array[Int])]
      var l = 1
      while (l <= levels) {
        fwdDwtLevel(cur, cw, cw, ch)
        val (ll, hl, lh, hh) = deinterleave(cur, cw, cw, ch)
        perLevel += ((hl, lh, hh))
        cur = ll
        cw = (cw + 1) / 2; ch = (ch + 1) / 2
        l += 1
      }
      (cur, perLevel.toSeq) // (LL_levels, bands for level 1..levels)
    }
    work.indices.map { c =>
      (0 to levels).map { r =>
        if (r == 0) Seq(bandCoeffs(c)._1)
        else {
          val (hl, lh, hh) = bandCoeffs(c)._2(levels - r)
          Seq(hl, lh, hh)
        }
      }
    }
  }

  /** Encode component planes as a MULTI-TILE lossless 5/3 codestream:
    * the image splits on a (tileW, tileH) grid anchored at the origin,
    * each tile DWT-coded independently (raster-order SOT tile-parts),
    * QCD exponents global. The DC shift and RCT are pointwise, so they
    * apply before tiling.
    */
  def encodeTiled(planes: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int, tileW: Int, tileH: Int, cbExp: Int = 6,
      useRct: Boolean = false): Array[Byte] = {
    require(planes.nonEmpty && planes.forall(_.length == w * h))
    require(!useRct || planes.length == 3)
    require(levels >= 0 && levels <= 16 && cbExp >= 2 && cbExp <= 6)
    require(tileW > 0 && tileH > 0)
    val comps = planes.length
    val off = 1 << (depth - 1)
    val work = planes.map(_.map(_ - off))
    if (useRct) fwdRct(work(0), work(1), work(2))
    val xTiles = (w + tileW - 1) / tileW
    val yTiles = (h + tileH - 1) / tileH
    val tiles = (for (tj <- 0 until yTiles; ti <- 0 until xTiles) yield {
      val tx0 = ti * tileW; val ty0 = tj * tileH
      val tw = math.min(tileW, w - tx0); val th = math.min(tileH, h - ty0)
      val sub = work.map { pl =>
        val a = new Array[Int](tw * th)
        var y = 0
        while (y < th) {
          System.arraycopy(pl, (ty0 + y) * w + tx0, a, y * tw, tw)
          y += 1
        }
        a
      }
      (tw, th, bands53(sub, tw, th, levels))
    }).toIndexedSeq
    emitCodestreamTiled(w, h, tileW, tileH, depth, comps, levels, cbExp,
      mct = if (useRct) 1 else 0, irrev = false, tiles, eps = null)
  }

  /** Encode component planes as a single-tile, single-layer
    * IRREVERSIBLE 9/7 codestream (scalar-expounded quantization with a
    * fine step ~1/4, so round trips are near-lossless but not exact).
    * `useIct` applies the irreversible color transform.
    */
  def encode97(planes: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int, cbExp: Int = 6, useIct: Boolean = false): Array[Byte] = {
    require(planes.nonEmpty && planes.forall(_.length == w * h))
    require(!useIct || planes.length == 3)
    require(levels >= 0 && levels <= 16 && cbExp >= 2 && cbExp <= 6)
    val comps = planes.length
    val off = 1 << (depth - 1)
    val work = planes.map(_.map(v => (v - off).toDouble))
    if (useIct) fwdIct(work(0), work(1), work(2))
    val eps = (0 to levels).map { r =>
      (0 until (if (r == 0) 1 else 3)).map { bi =>
        val gain = if (r == 0) 0 else bi match {
          case 2 => 2 // HH
          case _ => 1 // HL / LH
        }
        // delta = 2^(R_b - eps)(1 + mu/2^11); mu = 0, eps = R_b + 2
        // gives a fixed fine step of 1/4 in every band
        depth + gain + 2
      }
    }
    def deltaAt(r: Int, bi: Int): Double = {
      val gain = if (r == 0) 0 else (if (bi == 2) 2 else 1)
      math.pow(2.0, (depth + gain) - eps(r)(bi))
    }
    val bands = (0 until comps).map { c =>
      var cur = work(c)
      var cw = w; var ch = h
      val perLevel = scala.collection.mutable.ArrayBuffer
        .empty[(Array[Double], Array[Double], Array[Double])]
      var l = 1
      while (l <= levels) {
        fwdDwt97Level(cur, cw, cw, ch)
        // reuse the int de-interleave by shape: do it inline for doubles
        val lw = (cw + 1) / 2; val lh = (ch + 1) / 2
        val hw = cw / 2; val hhh = ch / 2
        val ll = new Array[Double](lw * lh)
        val hl = new Array[Double](hw * lh)
        val lhB = new Array[Double](lw * hhh)
        val hhB = new Array[Double](hw * hhh)
        var y = 0
        while (y < ch) {
          var x = 0
          while (x < cw) {
            val v = cur(y * cw + x)
            if ((x & 1) == 0 && (y & 1) == 0) ll((y / 2) * lw + x / 2) = v
            else if ((x & 1) == 1 && (y & 1) == 0) hl((y / 2) * hw + x / 2) = v
            else if ((x & 1) == 0) lhB((y / 2) * lw + x / 2) = v
            else hhB((y / 2) * hw + x / 2) = v
            x += 1
          }
          y += 1
        }
        perLevel += ((hl, lhB, hhB))
        // repack LL densely for the next level
        cur = ll
        cw = lw; ch = lh
        l += 1
      }
      def quant(a: Array[Double], r: Int, bi: Int): Array[Int] = {
        val d = deltaAt(r, bi)
        a.map { v =>
          val m = (math.abs(v) / d).toInt
          if (v < 0) -m else m
        }
      }
      (0 to levels).map { r =>
        if (r == 0) Seq(quant(cur, 0, 0))
        else {
          val (hl, lh, hh) = perLevel(levels - r)
          Seq(quant(hl, r, 0), quant(lh, r, 1), quant(hh, r, 2))
        }
      }
    }
    emitCodestream(w, h, depth, comps, levels, cbExp,
      mct = if (useIct) 1 else 0, irrev = true, bands, eps)
  }

  /** Shared codestream emitter: Tier-1 codes every band's blocks and
    * writes SOC..EOC. `eps` null → reversible (1-byte SPqcd, exponents
    * derived from actual magnitudes); non-null → irreversible
    * scalar-expounded (2-byte SPqcd entries, mu = 0).
    */
  private def emitCodestream(w: Int, h: Int, depth: Int, comps: Int,
      levels: Int, cbExp: Int, mct: Int, irrev: Boolean,
      bands: IndexedSeq[IndexedSeq[Seq[Array[Int]]]],
      eps: IndexedSeq[IndexedSeq[Int]]): Array[Byte] =
    emitCodestreamTiled(w, h, w, h, depth, comps, levels, cbExp, mct,
      irrev, IndexedSeq((w, h, bands)), eps)

  /** Multi-tile emitter: `tiles` carries (tw, th, per-comp bands) in
    * raster order over the (xt, yt) tile grid; QCD exponents are
    * codestream-global (maxed across tiles AND components), each tile
    * gets one SOT..SOD tile-part.
    */
  private def emitCodestreamTiled(w: Int, h: Int, xt: Int, yt: Int,
      depth: Int, comps: Int,
      levels: Int, cbExp: Int, mct: Int, irrev: Boolean,
      tiles: IndexedSeq[(Int, Int, IndexedSeq[IndexedSeq[Seq[Array[Int]]]])],
      eps: IndexedSeq[IndexedSeq[Int]]): Array[Byte] = {
    val cb = 1 << cbExp
    final case class CodedBlock(bx: Int, by: Int, bytes: Array[Byte],
      planes: Int, passes: Int)
    final case class CodedBand(orient: Int, bw: Int, bh: Int,
      blocks: Seq[CodedBlock], maxPlanes: Int)
    def codeBand(orient: Int, bw: Int, bh: Int,
        coeffs: Array[Int]): CodedBand = {
      val blocks =
        for (by <- 0 until math.max((bh + cb - 1) / cb, 0);
             bx <- 0 until math.max((bw + cb - 1) / cb, 0)) yield {
          val x0 = bx * cb; val y0 = by * cb
          val cbw2 = math.min(cb, bw - x0); val cbh2 = math.min(cb, bh - y0)
          val sub = new Array[Int](cbw2 * cbh2)
          var yy = 0
          while (yy < cbh2) {
            System.arraycopy(coeffs, (y0 + yy) * bw + x0, sub, yy * cbw2,
              cbw2)
            yy += 1
          }
          val (bytes, pl, np) = t1Encode(sub, cbw2, cbh2, orient)
          CodedBlock(bx, by, bytes, pl, np)
        }
      CodedBand(orient, bw, bh, blocks,
        if (blocks.isEmpty) 0 else blocks.map(_.planes).max)
    }
    // resolution r bands per tile per component
    val codedTiles = tiles.map { case (tw, th, bands) =>
      (0 until comps).map { c =>
        (0 to levels).map { r =>
          if (r == 0) {
            val bw = dimAt(tw, levels); val bh = dimAt(th, levels)
            Seq(codeBand(0, bw, bh, bands(c)(r).head))
          } else {
            bandsOf(tw, th, levels, r).zip(bands(c)(r)).map {
              case (b, arr) => codeBand(b.orient, b.w, b.h, arr)
            }
          }
        }
      }
    }
    def maxPlanesAt(r: Int, bi: Int): Int =
      codedTiles.flatMap(coded =>
        (0 until comps).map(c => coded(c)(r)(bi).maxPlanes)).max
    val guard =
      if (!irrev) 2
      else {
        var g = 2
        for (r <- 0 to levels; bi <- 0 until (if (r == 0) 1 else 3))
          g = math.max(g, maxPlanesAt(r, bi) + 1 - eps(r)(bi))
        math.min(g, 7)
      }
    // per band-position exponent so Mb = guard + exp - 1 >= maxPlanes,
    // maxed across components (QCD is codestream-global)
    val expAt =
      if (irrev) eps
      else (0 to levels).map { r =>
        (0 until (if (r == 0) 1 else 3)).map { bi =>
          math.max(1, maxPlanesAt(r, bi) + 1 - guard + 1) // +1 slack
        }
      }
    def mbAt(r: Int, bi: Int): Int = guard + expAt(r)(bi) - 1
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit = { w16((v >> 16).toInt); w16(v.toInt) }
    w16(0xff4f) // SOC
    w16(0xff51); w16(38 + 3 * comps); w16(0) // SIZ
    w32(w.toLong); w32(h.toLong); w32(0); w32(0)
    w32(xt.toLong); w32(yt.toLong); w32(0); w32(0)
    w16(comps)
    (0 until comps).foreach { _ => w8(depth - 1); w8(1); w8(1) }
    w16(0xff52); w16(12); w8(0) // COD, Scod=0
    w8(0) // LRCP
    w16(1) // layers
    w8(mct)
    w8(levels)
    w8(cbExp - 2); w8(cbExp - 2)
    w8(0) // code-block style
    w8(if (irrev) 0 else 1) // wavelet: 0 = 9/7, 1 = 5/3
    val nb = 3 * levels + 1
    if (irrev) {
      w16(0xff5c); w16(3 + 2 * nb) // QCD, scalar expounded
      w8((guard << 5) | 2)
      def entry(r: Int, bi: Int): Unit = w16(expAt(r)(bi) << 11) // mu = 0
      entry(0, 0)
      (1 to levels).foreach(r => (0 until 3).foreach(entry(r, _)))
    } else {
      w16(0xff5c); w16(3 + nb) // QCD, no quantization
      w8(guard << 5)
      w8(expAt(0)(0) << 3)
      (1 to levels).foreach(r => (0 until 3).foreach(bi =>
        w8(expAt(r)(bi) << 3)))
    }
    // tile parts: emit each tile's packets first to learn its Psot
    codedTiles.zipWithIndex.foreach { case (coded, tileIdx) =>
    val body = new java.io.ByteArrayOutputStream()
    for (r <- 0 to levels; c <- 0 until comps) {
      val bw = new HdrBitWriter
      bw.bit(1) // non-empty packet
      val bodies = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      coded(c)(r).zipWithIndex.foreach { case (band, bi) =>
        val nbx = math.max((band.bw + cb - 1) / cb, 0)
        val nby = math.max((band.bh + cb - 1) / cb, 0)
        val incl = new TagTree(math.max(nbx, 1), math.max(nby, 1))
        val zb = new TagTree(math.max(nbx, 1), math.max(nby, 1))
        band.blocks.foreach { blk =>
          val leaf = blk.by * math.max(nbx, 1) + blk.bx
          incl.value(leaf) = if (blk.passes > 0) 0 else 1
          zb.value(leaf) = math.max(mbAt(r, bi) - blk.planes, 0)
        }
        incl.buildUp(); zb.buildUp()
        band.blocks.foreach { blk =>
          incl.encodeLess(bw, blk.bx, blk.by, 1)
          if (blk.passes > 0) {
            zb.encodeValue(bw, blk.bx, blk.by)
            val np = blk.passes
            if (np == 1) bw.bit(0)
            else if (np == 2) { bw.bit(1); bw.bit(0) }
            else if (np <= 5) { bw.bits(3L, 2); bw.bits((np - 3).toLong, 2) }
            else if (np <= 36) {
              bw.bits(3L, 2); bw.bits(3L, 2); bw.bits((np - 6).toLong, 5)
            } else {
              bw.bits(3L, 2); bw.bits(3L, 2); bw.bits(31L, 5)
              bw.bits((np - 37).toLong, 7)
            }
            var lblock = 3
            val needed = math.max(1,
              32 - Integer.numberOfLeadingZeros(
                math.max(blk.bytes.length, 1)))
            val base = 31 - Integer.numberOfLeadingZeros(np)
            while (lblock + base < needed) { bw.bit(1); lblock += 1 }
            bw.bit(0)
            bw.bits(blk.bytes.length.toLong, lblock + base)
            bodies += blk.bytes
          }
        }
      }
      body.write(bw.alignEnd())
      bodies.foreach(b => body.write(b, 0, b.length))
    }
    val bodyBytes = body.toByteArray
    w16(0xff90); w16(10); w16(tileIdx) // SOT, tile index raster order
    w32(12L + 2 + bodyBytes.length) // Psot: SOT..next SOT/EOC
    w8(0); w8(1) // TPsot 0 of 1
    w16(0xff93) // SOD
    out.write(bodyBytes, 0, bodyBytes.length)
    } // codedTiles loop
    w16(0xffd9) // EOC
    out.toByteArray
  }
}
