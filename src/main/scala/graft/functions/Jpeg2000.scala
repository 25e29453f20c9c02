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
  * independent DWT/packet space, raster SOT order not required),
  * MULTIPLE TILE-PARTS per tile (TPsot > 0 — a tile's packet stream
  * is the concatenation of its tile-part bodies in TPsot order; tile
  * headers may carry PLT/COM), PER-COMPONENT coding and quantization
  * via main-header COC/QCC (decomposition levels, code-block size,
  * bypass flag, exponents all per component), SELECTIVE ARITHMETIC
  * BYPASS (cbstyle bit 0: raw SPP/MRP segments from the 5th bitplane,
  * per-segment lengths in the packet header, D.6 termination split),
  * LRCP/RLCP progression, default precincts (PPx = 15, one precinct
  * per resolution), arbitrary decomposition levels and code-block
  * sizes, 1..4 components with the reversible multiple-component
  * transform (RCT), any number of quality layers. Named skips:
  * derived quantization, precinct partitioning, SOP/EPH, packed
  * headers (PPM/PPT), tile-header COD/COC/QCD/QCC/POC, subsampled
  * components, and the remaining coding-style extensions (RESET/
  * TERMALL/causal/predictable-termination/segsym) — each raises with
  * a `jpx-...` message the callers surface as notes.
  *
  * The encoder twin emits the same codestream family (one layer, all
  * passes included, 5/3 + optional RCT; `encodeTiled` for the
  * multi-tile form, `encodeAdvanced` for COC/QCC + bypass +
  * multi-tile-part forms) so gates decode synthesized images
  * bit-exactly (the q189/q195 fixture pattern).
  */
object Jpeg2000 {
  import Jbig2.{ArithDecoder, ArithEncoder, Contexts}

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("jpx-" + msg)

  // ================= packet-header bit I/O (B.10.1 stuffing) =========

  /** MSB-first bit reader with JPEG 2000 header bit-stuffing: after a
    * consumed 0xFF byte, the next byte carries only 7 bits (its MSB is
    * a stuffed 0). The same stuffing rule governs RAW (arithmetic-
    * bypass) codeword segments (D.6), which pass an explicit `limit`
    * so a segment never reads its neighbour's bytes; past the limit
    * the reader feeds 0 bits (fail-soft on truncation).
    */
  final class HdrBitReader(data: Array[Byte], var pos: Int,
      limit: Int = -1) {
    private val lim =
      if (limit < 0) data.length else math.min(limit, data.length)
    private var buf = 0
    private var cnt = 0
    private var lastByte = 0
    def bit(): Int = {
      if (cnt == 0) {
        val b = if (pos < lim) data(pos) & 0xff else 0
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

  // ---- coding-pass taxonomy shared by coder, decoder and the packet
  // header's segment-length chunking (selective arithmetic bypass,
  // D.6): global pass index 0 is the cleanup of the MSB plane, then
  // (SPP, MRP, CUP) triplets per plane. With BYPASS set, SPP/MRP of
  // the 5th-and-later planes (pass index >= 10) are raw-coded; the MQ
  // coder terminates after the CUP at index 9 and after every later
  // MRP and CUP, so codeword segments alternate MQ | raw(SPP+MRP) |
  // MQ(CUP) | ... Each boundary is derivable from the pass index
  // alone, which is what lets the packet header signal one length per
  // segment and both sides agree on the split.
  @inline private def passKind(i: Int): Int =
    if (i == 0) 2 else (i - 1) % 3 // 0 = SPP, 1 = MRP, 2 = CUP
  @inline private def passIsRaw(bypass: Boolean, i: Int): Boolean =
    bypass && i >= 10 && passKind(i) != 2
  @inline private def termAfter(bypass: Boolean, i: Int): Boolean =
    bypass && i >= 9 && passKind(i) != 0

  /** Decode `numPasses` coding passes of a code block whose most
    * significant magnitude bitplane is `planes - 1`. Returns
    * (magnitudes, negative flags). Single MQ codeword segment
    * (cbstyle 0) — the bypass form goes through `t1DecodeSegs`.
    */
  def t1Decode(data: Array[Byte], from: Int, until: Int, w: Int, h: Int,
      band: Int, planes: Int, numPasses: Int)
      : (Array[Int], Array[Boolean]) =
    t1DecodeSegs(data, from, Seq(until - from), w, h, band, planes,
      numPasses, bypass = false)

  /** Segment-aware Tier-1 decode: `segLens` lists each codeword
    * segment's byte length in pass order starting at `base`. MQ
    * segments each get a fresh MQ decoder (contexts persist across
    * segments — BYPASS does not imply RESET); raw segments are
    * bit-unstuffed reads (significance bit, then the sign bit
    * directly, no prediction; refinement bits likewise).
    */
  def t1DecodeSegs(data: Array[Byte], base: Int, segLens: Seq[Int],
      w: Int, h: Int, band: Int, planes: Int, numPasses: Int,
      bypass: Boolean): (Array[Int], Array[Boolean]) = {
    val t = new T1Block(w, h, band)
    val cx = freshT1Contexts()
    val bounds = segLens.scanLeft(base)(_ + _).toArray
    var segIdx = 0
    var ad: ArithDecoder = null
    var raw: HdrBitReader = null
    def openSeg(isRaw: Boolean): Unit = {
      val from =
        if (segIdx < bounds.length) math.min(bounds(segIdx), data.length)
        else data.length
      val until =
        if (segIdx + 1 < bounds.length)
          math.min(bounds(segIdx + 1), data.length)
        else data.length
      if (isRaw) { raw = new HdrBitReader(data, from, until); ad = null }
      else { ad = new ArithDecoder(data, from, until); raw = null }
      segIdx += 1
    }
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
    def sppRaw(): Unit = stripes { (x, y) =>
      val i = y * w + x
      if (!t.sig(i)) {
        if (t.zcAt(x, y) != 0) {
          if (raw.bit() == 1) {
            t.neg(i) = raw.bit() == 1
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
    def mrpRaw(): Unit = stripes { (x, y) =>
      val i = y * w + x
      if (t.sig(i) && !t.visited(i)) {
        t.refined(i) = true
        t.mag(i) |= raw.bit() << p
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
      openSeg(passIsRaw(bypass, 0))
      var passIdx = 0
      var done = false
      while (!done && passIdx < numPasses) {
        passKind(passIdx) match {
          case 0 => if (passIsRaw(bypass, passIdx)) sppRaw() else spp()
          case 1 => if (passIsRaw(bypass, passIdx)) mrpRaw() else mrp()
          case _ => cup() // pass 0 is the cleanup of the MSB plane
        }
        if (passKind(passIdx) == 2) {
          if (p == 0) done = true else p -= 1
        }
        passIdx += 1
        if (!done && passIdx < numPasses && termAfter(bypass, passIdx - 1))
          openSeg(passIsRaw(bypass, passIdx))
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
    val (segs, planes, passes) =
      t1EncodeSegs(coeffs, w, h, band, bypass = false)
    val bytes =
      if (segs.isEmpty) Array.emptyByteArray
      else segs.map(_._1).reduce(_ ++ _)
    (bytes, planes, passes)
  }

  /** Segment-emitting encoder twin of `t1DecodeSegs`: codes every pass
    * of every nonzero bitplane and returns the codeword segments in
    * pass order as (bytes, passesInSegment) pairs plus (planes,
    * totalPasses). cbstyle 0 yields one MQ segment; `bypass` yields
    * the alternating MQ / raw split of `termAfter`.
    */
  def t1EncodeSegs(coeffs: Array[Int], w: Int, h: Int, band: Int,
      bypass: Boolean): (Seq[(Array[Byte], Int)], Int, Int) = {
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
    if (planes == 0) return (Seq.empty, 0, 0)
    // live significance/visited state rebuilt during the pass walk;
    // t.mag/t.neg hold the TRUTH the passes reveal
    val truthMag = t.mag.clone()
    val truthNeg = t.neg.clone()
    java.util.Arrays.fill(t.mag, 0)
    java.util.Arrays.fill(t.neg, false)
    var enc = new ArithEncoder
    var rawW: HdrBitWriter = null
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
    def sppRaw(): Unit = stripes { (x, y) =>
      val i = y * w + x
      if (!t.sig(i)) {
        if (t.zcAt(x, y) != 0) {
          val b = bitAt(i)
          rawW.bit(b)
          if (b == 1) {
            rawW.bit(if (truthNeg(i)) 1 else 0)
            t.neg(i) = truthNeg(i)
            t.sig(i) = true
            t.mag(i) = 1 << p
          }
          t.visited(i) = true
        }
      }
    }
    def mrpRaw(): Unit = stripes { (x, y) =>
      val i = y * w + x
      if (t.sig(i) && !t.visited(i)) {
        rawW.bit(bitAt(i))
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
    val numPasses = 1 + 3 * (planes - 1)
    val segs = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Int)]
    var segStartPass = 0
    def closeSeg(lastPass: Int): Unit = {
      val bytes =
        if (rawW != null) rawW.alignEnd()
        else {
          // a terminated MQ segment must not end with 0xFF (the byte
          // would fuse with the next segment's first byte under the
          // decoder's stuffing rule); the decoder 0xFF-fills past the
          // segment end, so the trailing 0xFF is redundant — drop it
          val b = enc.flush()
          if (b.nonEmpty && (b(b.length - 1) & 0xff) == 0xff)
            java.util.Arrays.copyOf(b, b.length - 1)
          else b
        }
      segs += ((bytes, lastPass - segStartPass + 1))
      segStartPass = lastPass + 1
      enc = null; rawW = null
    }
    def openSeg(firstPass: Int): Unit =
      if (passIsRaw(bypass, firstPass)) { rawW = new HdrBitWriter; enc = null }
      else { enc = new ArithEncoder; rawW = null }
    var passIdx = 0
    var done = false
    while (!done && passIdx < numPasses) {
      passKind(passIdx) match {
        case 0 => if (passIsRaw(bypass, passIdx)) sppRaw() else spp()
        case 1 => if (passIsRaw(bypass, passIdx)) mrpRaw() else mrp()
        case _ => cup()
      }
      if (passKind(passIdx) == 2) {
        if (p == 0) done = true else p -= 1
      }
      passIdx += 1
      if (done || passIdx >= numPasses) closeSeg(passIdx - 1)
      else if (termAfter(bypass, passIdx - 1)) {
        closeSeg(passIdx - 1)
        openSeg(passIdx)
      }
    }
    (segs.toSeq, planes, numPasses)
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
    // codeword-segment byte lengths in pass order (one entry per MQ or
    // raw segment, growing across layers); segOpen marks the last
    // entry unterminated, so a later packet's contribution extends it
    // instead of starting a new segment (B.10.7)
    val segLens = scala.collection.mutable.ArrayBuffer.empty[Int]
    var segOpen = false
    val bytes = new java.io.ByteArrayOutputStream()
  }

  /** Per-component coding parameters: COD defaults, COC overrides. */
  private final case class CompCod(nl: Int, cbw: Int, cbh: Int,
      irrev: Boolean, bypass: Boolean)

  /** Per-component quantization: QCD defaults, QCC overrides. */
  private final case class CompQcd(guard: Int, exps: Array[Int],
      mus: Array[Int])

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
    var layers = 1; var mct = 0
    var prog = 0
    var codDefault: CompCod = null
    var qcdDefault: CompQcd = null
    val cocMap = scala.collection.mutable.Map.empty[Int, CompCod]
    val qccMap = scala.collection.mutable.Map.empty[Int, CompQcd]
    var sotAt = -1
    var xtSiz = 0; var ytSiz = 0
    // SPcod/SPcoc: decomposition levels, code-block size, style,
    // transform — byte layout shared by COD and COC (A.6.1/A.6.2)
    def parseCodSp(at: Int): CompCod = {
      if (at + 5 > data.length) fail("truncated")
      val nlv = data(at) & 0xff
      if (nlv > 16) fail("levels")
      val cw = 1 << ((data(at + 1) & 0x0f) + 2)
      val chh = 1 << ((data(at + 2) & 0x0f) + 2)
      if (cw.toLong * chh > 4096) fail("cb-size")
      val style = data(at + 3) & 0xff
      // bit 0 = selective arithmetic bypass (supported); RESET/TERMALL/
      // causal/predictable-termination/segsym remain named skips
      if ((style & ~0x01) != 0) fail(f"cb-style-$style%02x")
      val irr = (data(at + 4) & 0xff) match {
        case 0 => true // 9/7 irreversible
        case 1 => false // 5/3 reversible
        case other => fail(s"wavelet-$other")
      }
      CompCod(nlv, cw, chh, irr, (style & 1) != 0)
    }
    // Sqcd/Sqcc + SPqcd/SPqcc: guard bits + per-band exponents
    def parseQuant(at: Int, segEnd: Int): CompQcd = {
      if (at >= segEnd || segEnd > data.length) fail("truncated")
      val sq = data(at) & 0xff
      val g = sq >> 5
      (sq & 0x1f) match {
        case 0 => // no quantization (reversible): 1-byte exponents
          val es = (0 until segEnd - at - 1)
            .map(i => (data(at + 1 + i) & 0xff) >> 3).toArray
          CompQcd(g, es, Array.fill(es.length)(0))
        case 2 => // scalar expounded: 16-bit (exp, mantissa) pairs
          val n = (segEnd - at - 1) / 2
          CompQcd(g,
            (0 until n).map(i => u16(at + 1 + 2 * i) >> 11).toArray,
            (0 until n).map(i => u16(at + 1 + 2 * i) & 0x7ff).toArray)
        case 1 => fail("quant-derived")
        case other => fail(s"quant-style-$other")
      }
    }
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
          codDefault = parseCodSp(p + 9)
          p += 2 + len
        case 0xff53 => // COC: per-component coding-style override
          val len = u16(p + 2)
          if (comps == 0) fail("coc-before-siz")
          if (p + 2 + len > data.length) fail("truncated")
          val cLen = if (comps < 257) 1 else 2
          val c = if (cLen == 1) data(p + 4) & 0xff else u16(p + 4)
          if (c >= comps) fail("coc-component")
          val scoc = data(p + 4 + cLen) & 0xff
          if ((scoc & 1) != 0) fail("precincts")
          cocMap(c) = parseCodSp(p + 5 + cLen)
          p += 2 + len
        case 0xff5c => // QCD
          val len = u16(p + 2)
          if (len < 3 || p + 2 + len > data.length) fail("truncated")
          qcdDefault = parseQuant(p + 4, p + 2 + len)
          p += 2 + len
        case 0xff5d => // QCC: per-component quantization override
          val len = u16(p + 2)
          if (comps == 0) fail("qcc-before-siz")
          if (p + 2 + len > data.length) fail("truncated")
          val cLen = if (comps < 257) 1 else 2
          val c = if (cLen == 1) data(p + 4) & 0xff else u16(p + 4)
          if (c >= comps) fail("qcc-component")
          qccMap(c) = parseQuant(p + 4 + cLen, p + 2 + len)
          p += 2 + len
        case 0xff90 => // SOT: main header complete; tile loop takes over
          sotAt = p
        case 0xff64 | 0xff55 | 0xff57 | 0xff58 | 0xff60 | 0xff61 |
            0xff63 => // COM/TLM/PLM/PLT/PPM/PPT/CRG: skip by length
          if (mk == 0xff60 || mk == 0xff61) fail("packed-headers")
          p += 2 + u16(p + 2)
        case other => fail(f"marker-$other%04x")
      }
    }
    if (codDefault == null || qcdDefault == null) fail("missing-cod-qcd")
    val cod = Array.tabulate(comps)(c => cocMap.getOrElse(c, codDefault))
    val qcd = Array.tabulate(comps)(c => qccMap.getOrElse(c, qcdDefault))
    var ci = 0
    while (ci < comps) {
      if (qcd(ci).exps.length < 3 * cod(ci).nl + 1) fail("qcd-bands")
      ci += 1
    }
    if (mct == 1) {
      if (comps < 3) fail("mct-components")
      if (cod(1).irrev != cod(0).irrev || cod(2).irrev != cod(0).irrev)
        fail("mct-mixed")
    }
    val maxNl = cod.map(_.nl).max
    val xTiles = ((w.toLong + xtSiz - 1) / xtSiz).toInt
    val yTiles = ((h.toLong + ytSiz - 1) / ytSiz).toInt
    if (xTiles.toLong * yTiles > 4096) fail("tile-count")
    // collect tile-parts in stream order; a tile's packet stream is the
    // CONCATENATION of its tile-part bodies in TPsot order (TPsot > 0
    // supported — multiple tile-parts per tile). Tile headers may carry
    // PLT/COM (skipped by length); in-tile COD/COC/QCD/QCC/POC remain
    // named skips.
    val partsByTile = Array.fill(xTiles * yTiles)(
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int)])
    p = sotAt
    var more = true
    while (more) {
      if (p + 12 > data.length || u16(p) != 0xff90) fail("no-sot")
      val lsot = u16(p + 2)
      val isot = u16(p + 4)
      val psot = u32(p + 6)
      val tpsot = data(p + 10) & 0xff
      val tnsot = data(p + 11) & 0xff
      if (isot >= xTiles * yTiles) fail("tile-index")
      if (tpsot != partsByTile(isot).length) fail("tile-part-order")
      if (tnsot != 0 && tpsot >= tnsot) fail("tile-part-count")
      val tEnd: Int =
        if (psot == 0) {
          // Psot 0: the (single, last) tile-part extends to EOC
          if (data.length < 2) fail("truncated")
          data.length - 2
        } else if (psot < 14 || p + psot > data.length) fail("tile-length")
        else (p + psot).toInt
      var q = p + 2 + lsot
      var sod = false
      while (!sod) {
        if (q + 2 > data.length) fail("no-sod")
        u16(q) match {
          case 0xff93 => sod = true
          case 0xff58 | 0xff64 => q += 2 + u16(q + 2) // PLT / COM
          case 0xff52 | 0xff53 | 0xff5c | 0xff5d =>
            fail("tile-header-coding")
          case 0xff5f => fail("tile-poc")
          case 0xff61 => fail("packed-headers") // PPT
          case other => fail(f"tile-marker-$other%04x")
        }
      }
      partsByTile(isot) +=
        ((q + 2, math.max(q + 2, math.min(tEnd, data.length))))
      p = tEnd
      more = p + 2 <= data.length && u16(p) == 0xff90
    }
    // ------- per-tile decode over the concatenated tile-part body; the
    // tile dims SHADOW the image dims so the band/packet/T1/DWT
    // machinery operates on the tile grid
    def decodeTile(tw: Int, th: Int, body: Array[Byte])
        : Array[Either[Array[Double], Array[Int]]] = {
      var bp = 0
      val end = body.length
      // per component/band/block decode state
      val state = Array.tabulate(comps) { c =>
        val pc = cod(c)
        (0 to pc.nl).map { r =>
          bandsOf(tw, th, pc.nl, r).map { b =>
            val nbx = if (b.w == 0) 0 else (b.w + pc.cbw - 1) / pc.cbw
            val nby = if (b.h == 0) 0 else (b.h + pc.cbh - 1) / pc.cbh
            (b, Array.fill(nby, nbx)(new BlockState),
              new TagTree(math.max(nbx, 1), math.max(nby, 1)),
              new TagTree(math.max(nbx, 1), math.max(nby, 1)))
          }
        }
      }
      // packet walk: LRCP or RLCP — with per-component decomposition
      // levels, resolution r > nl(c) contributes no packet for c
      val order =
        if (prog == 0)
          for (l <- 0 until layers; r <- 0 to maxNl; c <- 0 until comps
               if r <= cod(c).nl) yield (l, r, c)
        else
          for (r <- 0 to maxNl; l <- 0 until layers; c <- 0 until comps
               if r <= cod(c).nl) yield (l, r, c)
      order.foreach { case (layer, r, c) =>
        if (bp < end) {
          val bypass = cod(c).bypass
          val br = new HdrBitReader(body, bp)
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
                  // segment-length signalling (B.10.7): the new passes
                  // split at termination boundaries; one length per
                  // segment contribution, bits = lblock +
                  // floor(log2(passes in the contribution))
                  var first = st.passes
                  var remaining = np
                  while (remaining > 0) {
                    var cp = 0
                    var term = false
                    while (!term && cp < remaining) {
                      term = termAfter(bypass, first + cp)
                      cp += 1
                    }
                    val lenBits = st.lblock +
                      (31 - Integer.numberOfLeadingZeros(cp))
                    if (lenBits > 31) fail("seg-length")
                    val byteLen = br.bits(lenBits)
                    if (byteLen < 0 || byteLen > (1 << 24))
                      fail("seg-length")
                    if (st.segOpen && st.segLens.nonEmpty)
                      st.segLens(st.segLens.length - 1) += byteLen
                    else st.segLens += byteLen
                    st.segOpen = !term
                    bodies += ((st, byteLen))
                    first += cp
                    remaining -= cp
                  }
                  st.passes += np
                }
              }
            }
            bp = br.alignEnd()
            bodies.foreach { case (st, len) =>
              if (bp + len > end) fail("truncated-body")
              st.bytes.write(body, bp, len)
              bp += len
            }
          } else bp = br.alignEnd()
        }
      }
      // Tier-1 decode + assemble subbands, then inverse DWT per comp
      Array.tabulate[Either[Array[Double], Array[Int]]](comps) { c =>
        val pc = cod(c)
        val qc = qcd(c)
        def expOf(r: Int, bi: Int): Int =
          qc.exps(if (r == 0) 0 else 1 + 3 * (r - 1) + bi)
        val bandCoeffs = (0 to pc.nl).map { r =>
          state(c)(r).map { case (band, blocks, _, _) =>
            val coeffs = new Array[Int](math.max(band.w * band.h, 0))
            for (by <- blocks.indices; bx <- blocks(by).indices) {
              val st = blocks(by)(bx)
              val x0 = bx * pc.cbw; val y0 = by * pc.cbh
              val bw = math.min(pc.cbw, band.w - x0)
              val bh = math.min(pc.cbh, band.h - y0)
              if (st.included && st.passes > 0) {
                val mb = qc.guard + expOf(r, band.orient match {
                  case 0 => 0
                  case o => o - 1
                }) - 1
                val planes = mb - st.zbp
                if (planes < 0 || planes > 31) fail("planes")
                val seg = st.bytes.toByteArray
                val (mags, negs) = t1DecodeSegs(seg, 0, st.segLens.toSeq,
                  bw, bh, band.orient, planes, st.passes, pc.bypass)
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
        if (!pc.irrev) {
          // iterative synthesis: LL_nl + level bands -> full plane
          var cur = bandCoeffs(0).head._2
          var lvl = pc.nl
          while (lvl >= 1) {
            val r = pc.nl - lvl + 1
            val cw = dimAt(tw, lvl - 1); val ch = dimAt(th, lvl - 1)
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
            val delta = math.pow(2.0, (depth + gain) - qc.exps(qi)) *
              (1.0 + qc.mus(qi) / 2048.0)
            q.map { v =>
              if (v == 0) 0.0
              else if (v > 0) (v + 0.5) * delta
              else (v - 0.5) * delta
            }
          }
          var cur = dequant(0, 0, bandCoeffs(0).head._2)
          var lvl = pc.nl
          while (lvl >= 1) {
            val r = pc.nl - lvl + 1
            val cw = dimAt(tw, lvl - 1); val ch = dimAt(th, lvl - 1)
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
    } // decodeTile
    // assemble tiles into full-image planes (missing tiles stay zero ->
    // mid-gray after the DC shift, fail-soft for truncated streams)
    val out: Array[Either[Array[Double], Array[Int]]] =
      Array.tabulate(comps) { c =>
        if (cod(c).irrev) Left(new Array[Double](w * h))
        else Right(new Array[Int](w * h))
      }
    var tIdx = 0
    while (tIdx < xTiles * yTiles) {
      val parts = partsByTile(tIdx)
      if (parts.nonEmpty) {
        val ti = tIdx % xTiles; val tj = tIdx / xTiles
        val tx0 = ti * xtSiz; val ty0 = tj * ytSiz
        val tw = math.min(xtSiz, w - tx0)
        val th = math.min(ytSiz, h - ty0)
        if (tw <= 0 || th <= 0) fail("tile-index")
        val totalLen = parts.map { case (f, u) => math.max(u - f, 0) }.sum
        if (totalLen > (1 << 26)) fail("tile-body")
        val body = new Array[Byte](totalLen)
        var o = 0
        parts.foreach { case (f, u) =>
          val n = math.max(u - f, 0)
          System.arraycopy(data, f, body, o, n)
          o += n
        }
        val tileOut = decodeTile(tw, th, body)
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
      tIdx += 1
    }
    val off = 1 << (depth - 1)
    val maxV = (1 << depth) - 1
    if (mct == 1) {
      if (!cod(0).irrev)
        invRct(out(0).toOption.get, out(1).toOption.get,
          out(2).toOption.get)
      else
        invIct(out(0).swap.toOption.get, out(1).swap.toOption.get,
          out(2).swap.toOption.get)
    }
    val planesOut: Array[Array[Int]] = out.map {
      case Right(ints) => ints
      case Left(dbls) => dbls.map(v => math.round(v).toInt)
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
    emitCodestreamTiled(w, h, tileW, tileH, depth, comps,
      Array.fill(comps)(levels), Array.fill(comps)(cbExp),
      Array.fill(comps)(false),
      mct = if (useRct) 1 else 0, irrev = false, tiles, eps = null,
      perComp = false, tileParts = 1)
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
    emitCodestreamTiled(w, h, w, h, depth, comps,
      Array.fill(comps)(levels), Array.fill(comps)(cbExp),
      Array.fill(comps)(false), mct, irrev,
      IndexedSeq((w, h, bands)), eps, perComp = false, tileParts = 1)

  /** Encode component planes as a lossless 5/3 codestream exercising
    * the real-encoder forms the decoder supports: PER-COMPONENT
    * decomposition levels / code-block sizes / selective arithmetic
    * bypass (COC + QCC markers for every component whose parameters or
    * exponents differ from component 0), an optional tile grid, and
    * each tile's packet stream split into `tileParts` tile-parts
    * (TPsot 0..n-1 of TNsot = n, split at packet boundaries).
    */
  def encodeAdvanced(planes: Array[Array[Int]], w: Int, h: Int,
      depth: Int, levels: Array[Int], cbExps: Array[Int],
      bypass: Array[Boolean], tileW: Int = 0, tileH: Int = 0,
      tileParts: Int = 1, useRct: Boolean = false): Array[Byte] = {
    val comps = planes.length
    require(comps >= 1 && planes.forall(_.length == w * h))
    require(!useRct || comps == 3)
    require(levels.length == comps && cbExps.length == comps &&
      bypass.length == comps)
    require(levels.forall(l => l >= 0 && l <= 16))
    require(cbExps.forall(e => e >= 2 && e <= 6))
    require(tileParts >= 1)
    val off = 1 << (depth - 1)
    val work = planes.map(_.map(_ - off))
    if (useRct) fwdRct(work(0), work(1), work(2))
    val tw0 = if (tileW <= 0) w else tileW
    val th0 = if (tileH <= 0) h else tileH
    val xTiles = (w + tw0 - 1) / tw0
    val yTiles = (h + th0 - 1) / th0
    val tiles = (for (tj <- 0 until yTiles; ti <- 0 until xTiles) yield {
      val tx0 = ti * tw0; val ty0 = tj * th0
      val tw = math.min(tw0, w - tx0); val th = math.min(th0, h - ty0)
      val sub = work.map { pl =>
        val a = new Array[Int](tw * th)
        var y = 0
        while (y < th) {
          System.arraycopy(pl, (ty0 + y) * w + tx0, a, y * tw, tw)
          y += 1
        }
        a
      }
      // per-component decomposition: bands53 per comp with its levels
      val bands = (0 until comps).map { c =>
        bands53(Array(sub(c)), tw, th, levels(c)).head
      }
      (tw, th, bands)
    }).toIndexedSeq
    emitCodestreamTiled(w, h, tw0, th0, depth, comps, levels, cbExps,
      bypass, mct = if (useRct) 1 else 0, irrev = false, tiles,
      eps = null, perComp = true, tileParts = tileParts)
  }

  /** Multi-tile emitter: `tiles` carries (tw, th, per-comp bands) in
    * raster order over the (xt, yt) tile grid. With `perComp` false,
    * QCD exponents are codestream-global (maxed across tiles AND
    * components — the historical uniform form); with `perComp` true,
    * exponents are per-component and every component > 0 gets a QCC
    * (plus a COC when its coding parameters differ from component 0).
    * Each tile's packets are split into `tileParts` SOT..SOD parts.
    */
  private def emitCodestreamTiled(w: Int, h: Int, xt: Int, yt: Int,
      depth: Int, comps: Int,
      levelsA: Array[Int], cbExpA: Array[Int], bypassA: Array[Boolean],
      mct: Int, irrev: Boolean,
      tiles: IndexedSeq[(Int, Int, IndexedSeq[IndexedSeq[Seq[Array[Int]]]])],
      eps: IndexedSeq[IndexedSeq[Int]], perComp: Boolean,
      tileParts: Int): Array[Byte] = {
    require(!(perComp && irrev), "per-component 9/7 not emitted")
    val maxNl = levelsA.max
    final case class CodedBlock(bx: Int, by: Int,
      segs: Seq[(Array[Byte], Int)], planes: Int, passes: Int)
    final case class CodedBand(orient: Int, bw: Int, bh: Int,
      blocks: Seq[CodedBlock], maxPlanes: Int)
    def codeBand(c: Int, orient: Int, bw: Int, bh: Int,
        coeffs: Array[Int]): CodedBand = {
      val cb = 1 << cbExpA(c)
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
          val (segs, pl, np) = t1EncodeSegs(sub, cbw2, cbh2, orient,
            bypassA(c))
          CodedBlock(bx, by, segs, pl, np)
        }
      CodedBand(orient, bw, bh, blocks,
        if (blocks.isEmpty) 0 else blocks.map(_.planes).max)
    }
    // resolution r bands per tile per component
    val codedTiles = tiles.map { case (tw, th, bands) =>
      (0 until comps).map { c =>
        (0 to levelsA(c)).map { r =>
          if (r == 0) {
            val bw = dimAt(tw, levelsA(c)); val bh = dimAt(th, levelsA(c))
            Seq(codeBand(c, 0, bw, bh, bands(c)(r).head))
          } else {
            bandsOf(tw, th, levelsA(c), r).zip(bands(c)(r)).map {
              case (b, arr) => codeBand(c, b.orient, b.w, b.h, arr)
            }
          }
        }
      }
    }
    // max planes per band position: across tiles, and across components
    // too unless perComp (QCC then carries per-component exponents)
    def maxPlanesAt(cSel: Int, r: Int, bi: Int): Int =
      codedTiles.flatMap { coded =>
        val cs = if (perComp) Seq(cSel) else 0 until comps
        cs.filter(c => r <= levelsA(c)).map(c => coded(c)(r)(bi).maxPlanes)
      }.foldLeft(0)(math.max)
    val guard =
      if (!irrev) 2
      else {
        var g = 2
        for (r <- 0 to maxNl; bi <- 0 until (if (r == 0) 1 else 3))
          g = math.max(g, maxPlanesAt(0, r, bi) + 1 - eps(r)(bi))
        math.min(g, 7)
      }
    // per band-position exponent so Mb = guard + exp - 1 >= maxPlanes
    def expArr(c: Int): IndexedSeq[IndexedSeq[Int]] =
      if (irrev) eps
      else (0 to levelsA(c)).map { r =>
        (0 until (if (r == 0) 1 else 3)).map { bi =>
          math.max(1, maxPlanesAt(c, r, bi) + 1 - guard + 1) // +1 slack
        }
      }
    val expAt = (0 until comps).map(expArr)
    def mbAt(c: Int, r: Int, bi: Int): Int = guard + expAt(c)(r)(bi) - 1
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
    def codSp(c: Int): Unit = {
      w8(levelsA(c))
      w8(cbExpA(c) - 2); w8(cbExpA(c) - 2)
      w8(if (bypassA(c)) 1 else 0) // code-block style: bit 0 = bypass
      w8(if (irrev) 0 else 1) // wavelet: 0 = 9/7, 1 = 5/3
    }
    w16(0xff52); w16(12); w8(0) // COD, Scod=0
    w8(0) // LRCP
    w16(1) // layers
    w8(mct)
    codSp(0)
    if (perComp) {
      // COC for components whose coding parameters differ from comp 0
      (1 until comps).foreach { c =>
        if (levelsA(c) != levelsA(0) || cbExpA(c) != cbExpA(0) ||
          bypassA(c) != bypassA(0)) {
          w16(0xff53); w16(9) // Lcoc: Ccoc(1) + Scoc(1) + SPcoc(5)
          w8(c); w8(0) // single-byte Ccoc (comps <= 4), no precincts
          codSp(c)
        }
      }
    }
    def quantBody(c: Int): Unit = {
      val nb = 3 * levelsA(c) + 1
      if (irrev) {
        w8((guard << 5) | 2)
        def entry(r: Int, bi: Int): Unit = w16(expAt(c)(r)(bi) << 11)
        entry(0, 0)
        (1 to levelsA(c)).foreach(r => (0 until 3).foreach(entry(r, _)))
      } else {
        w8(guard << 5)
        w8(expAt(c)(0)(0) << 3)
        (1 to levelsA(c)).foreach(r => (0 until 3).foreach(bi =>
          w8(expAt(c)(r)(bi) << 3)))
      }
    }
    val nb0 = 3 * levelsA(0) + 1
    if (irrev) { w16(0xff5c); w16(3 + 2 * nb0) }
    else { w16(0xff5c); w16(3 + nb0) }
    quantBody(0)
    if (perComp) (1 until comps).foreach { c =>
      val nbC = 3 * levelsA(c) + 1
      w16(0xff5d); w16(4 + nbC) // Lqcc: Cqcc(1) + Sqcc(1) + SPqcc(nbC)
      w8(c)
      quantBody(c)
    }
    // tile parts: emit each tile's packets, then split at packet
    // boundaries into `tileParts` SOT..SOD parts
    codedTiles.zipWithIndex.foreach { case (coded, tileIdx) =>
      val packets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      for (r <- 0 to maxNl; c <- 0 until comps; if r <= levelsA(c)) {
        val cb = 1 << cbExpA(c)
        val pkt = new java.io.ByteArrayOutputStream()
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
            zb.value(leaf) = math.max(mbAt(c, r, bi) - blk.planes, 0)
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
              // one lblock per block, sized for EVERY segment's length
              var lblock = 3
              blk.segs.foreach { case (bs, snp) =>
                val needed = math.max(1,
                  32 - Integer.numberOfLeadingZeros(
                    math.max(bs.length, 1)))
                val base = 31 - Integer.numberOfLeadingZeros(snp)
                while (lblock + base < needed) lblock += 1
              }
              var sig = 3
              while (sig < lblock) { bw.bit(1); sig += 1 }
              bw.bit(0)
              blk.segs.foreach { case (bs, snp) =>
                val base = 31 - Integer.numberOfLeadingZeros(snp)
                bw.bits(bs.length.toLong, lblock + base)
                bodies += bs
              }
            }
          }
        }
        pkt.write(bw.alignEnd())
        bodies.foreach(b => pkt.write(b, 0, b.length))
        packets += pkt.toByteArray
      }
      val nParts = math.max(1, math.min(tileParts, packets.length))
      val cuts = (0 to nParts).map(k => k * packets.length / nParts)
      (0 until nParts).foreach { k =>
        val body = new java.io.ByteArrayOutputStream()
        (cuts(k) until cuts(k + 1)).foreach { i =>
          body.write(packets(i), 0, packets(i).length)
        }
        val bodyBytes = body.toByteArray
        w16(0xff90); w16(10); w16(tileIdx) // SOT, tile index raster order
        w32(12L + 2 + bodyBytes.length) // Psot: SOT..next SOT/EOC
        w8(k); w8(nParts) // TPsot k of TNsot
        w16(0xff93) // SOD
        out.write(bodyBytes, 0, bodyBytes.length)
      }
    } // codedTiles loop
    w16(0xffd9) // EOC
    out.toByteArray
  }
}
