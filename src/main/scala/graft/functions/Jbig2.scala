package graft.functions

/** JBIG2 (ITU-T T.88) generic-region decode — the other half of the
  * scanned-PDF corpus (CCITT G3/G4 is `CcittFax`; real-world scanned
  * PDFs split between the two; the reference renders them via pdfium,
  * `/root/reference/pixeltable/functions/document.py:488`).
  *
  * Scope: the arithmetic (MQ) entropy coder of Annex E with the 47-row
  * Qe state table (dual-transcribed and structurally pinned in
  * TableConformanceSpec), generic region decoding (§6.2) for all four
  * GBTEMPLATEs with arbitrary adaptive (AT) pixels and TPGDON typical
  * prediction (MMR generic regions route through the T.6 decoder in
  * `CcittFax`, per §6.2.6), the arithmetic integer decoding procedures
  * of Annex A (IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT/IAID), symbol
  * dictionaries (§6.5) and text regions (§6.4) — the segments real
  * scanner output predominantly uses — and the embedded-stream segment
  * layer (§7.2) a PDF `JBIG2Decode` filter carries, including
  * /JBIG2Globals streams holding shared dictionaries. Generic
  * refinement regions (§6.3, both GRTEMPLATEs with AT pixels) serve
  * refined text-region instances (§6.4.11), single-instance
  * refinement/aggregate symbol dictionaries (§6.5.8.2), and standalone
  * refinement region segments (§7.4.7, types 40/42/43) that refine the
  * page content composed so far — with TPGRON typical prediction and
  * the REPLACE external combination operator; regions compose onto the
  * page in stream order honoring each segment's external combination
  * operator (§8.2). Halftone regions (§6.6) decode their Annex C
  * gray-coded bitplanes over the referred pattern dictionary (§6.7).
  * Huffman-coded dictionaries/regions, multi-instance aggregates,
  * MMR-coded halftone planes, and HENABLESKIP remain named skips (the
  * `unsupported` channel reports them).
  *
  * Context labels: T.88 assigns each template pixel a fixed bit slot;
  * the decoder forms CONTEXT MSB-first over rows top-to-bottom, left to
  * right (row −2, then −1, then 0) with AT pixels in their nominal
  * slots. TPGDON's pseudo-pixel uses the spec's per-template constants
  * (0x9B25/0x0795/0x00E5/0x0195), which live in THIS labeling — the
  * labeling is load-bearing, not a free choice.
  *
  * The encoder twin emits spec-conformant embedded streams via the
  * Annex E encoder procedures (CODEMPS/CODELPS/BYTEOUT/FLUSH) so gates
  * decode closed-form bitmaps bit-exactly (the q189 CCITT pattern).
  */
object Jbig2 {

  /** Annex E Table E.1 — the MQ-coder probability state machine:
    * (Qe, NMPS, NLPS, SWITCH) per state index. Transcribed twice
    * (here and packed in TableConformanceSpec) with structural
    * invariants pinned there.
    */
  val QeTable: Array[(Int, Int, Int, Int)] = Array(
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0))

  private val Qe = QeTable.map(_._1)
  private val Nmps = QeTable.map(_._2)
  private val Nlps = QeTable.map(_._3)
  private val Switch = QeTable.map(_._4)

  /** Adaptive context bank: per context value, (state index, MPS). */
  final class Contexts(size: Int) {
    val i = new Array[Byte](size)
    val mps = new Array[Byte](size)
  }

  /** MQ arithmetic decoder (Annex E.3.2-E.3.4). Bytes past the end of
    * the data feed 0xFF (the marker rule then supplies 1-bits forever),
    * so truncated streams fail soft, never out-of-bounds.
    */
  final class ArithDecoder(data: Array[Byte], from: Int, until: Int) {
    def this(data: Array[Byte]) = this(data, 0, data.length)
    private def byteAt(i: Int): Int =
      if (i >= from && i < until) data(i) & 0xff else 0xff
    private var bp = from
    private var c: Long = byteAt(from).toLong << 16
    private var ct = 0
    byteIn()
    c = (c << 7) & 0xffffffffL
    ct -= 7
    private var a = 0x8000L

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    def decode(cx: Contexts, label: Int): Int = {
      val st = cx.i(label) & 0xff
      val qe = Qe(st)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS exchange (E.3.4)
        if (a < qe) { d = cx.mps(label); cx.i(label) = Nmps(st).toByte }
        else {
          d = 1 - cx.mps(label)
          if (Switch(st) == 1) cx.mps(label) = (1 - cx.mps(label)).toByte
          cx.i(label) = Nlps(st).toByte
        }
        a = qe
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000L) == 0) {
          // MPS exchange (E.3.3)
          if (a < qe) {
            d = 1 - cx.mps(label)
            if (Switch(st) == 1) cx.mps(label) = (1 - cx.mps(label)).toByte
            cx.i(label) = Nlps(st).toByte
          } else { d = cx.mps(label); cx.i(label) = Nmps(st).toByte }
          renorm()
        } else d = cx.mps(label)
      }
      d
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteIn()
        a = (a << 1) & 0xffffL
        c = (c << 1) & 0xffffffffL
        ct -= 1
        (a & 0x8000L) == 0
      }) ()
    }
  }

  /** MQ arithmetic encoder (Annex E.3.5-E.3.8) — the twin. A leading
    * dummy byte absorbs the (never-occurring) carry past the first
    * output byte; it is asserted zero and stripped at flush.
    */
  final class ArithEncoder {
    private val bytes = scala.collection.mutable.ArrayBuffer[Int](0)
    private var a = 0x8000L
    private var c = 0L
    private var ct = 12

    def encode(cx: Contexts, label: Int, d: Int): Unit = {
      val st = cx.i(label) & 0xff
      val qe = Qe(st)
      if (d == cx.mps(label)) {
        // CODEMPS
        a -= qe
        if ((a & 0x8000L) == 0) {
          if (a < qe) a = qe else c += qe
          cx.i(label) = Nmps(st).toByte
          renorm()
        } else c += qe
      } else {
        // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(st) == 1) cx.mps(label) = (1 - cx.mps(label)).toByte
        cx.i(label) = Nlps(st).toByte
        renorm()
      }
    }

    private def renorm(): Unit = {
      while ({
        a = (a << 1) & 0xffffL
        c = (c << 1) & 0xfffffffL
        ct -= 1
        if (ct == 0) byteOut()
        (a & 0x8000L) == 0
      }) ()
    }

    private def byteOut(): Unit = {
      if (bytes.last == 0xff) {
        bytes += ((c >> 20) & 0xff).toInt
        c &= 0xfffffL
        ct = 7
      } else if (c < 0x8000000L) {
        bytes += ((c >> 19) & 0xff).toInt
        c &= 0x7ffffL
        ct = 8
      } else {
        bytes(bytes.length - 1) += 1
        if (bytes.last == 0xff) {
          c &= 0x7ffffffL
          bytes += ((c >> 20) & 0xff).toInt
          c &= 0xfffffL
          ct = 7
        } else {
          bytes += ((c >> 19) & 0xff).toInt
          c &= 0x7ffffL
          ct = 8
        }
      }
    }

    def flush(): Array[Byte] = {
      // SETBITS (E.3.8): set as many LOW bits of C to 1 as the interval
      // [C, C+A) allows — the decoder 1-fills past the stream end, so a
      // flushed value sitting at the interval's zero-padded top decodes
      // out of range on short streams (A >= 0x8000 always, so -0x8000
      // stays inside the interval when the |0xffff overshoots).
      val tempC = c + a
      c |= 0xffffL
      if (c >= tempC) c -= 0x8000L
      c = (c << ct) & 0xfffffffL
      byteOut()
      c = (c << ct) & 0xfffffffL
      byteOut()
      // the dummy absorbs a carry when the FIRST byteOut happens at
      // flush time with code-value bit 27 set (possible on tiny
      // streams) — a nonzero dummy is then real data, not an error
      (if (bytes.head == 0) bytes.drop(1) else bytes.toSeq)
        .map(_.toByte).toArray
    }
  }

  // --------------------------------------------------------- generic region

  /** Template pixel slots, MSB-first (rows top to bottom, left to
    * right), with `null` marking AT slots in nominal position order
    * A1..A4 replaced by the actual AT coordinates at decode time.
    */
  private def templateSlots(template: Int,
      at: Array[(Int, Int)]): Array[(Int, Int)] = template match {
    case 0 => Array(
      at(3), (-1, -2), (0, -2), (1, -2), at(2),
      at(1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), at(0),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0))
    case 1 => Array(
      (-1, -2), (0, -2), (1, -2), (2, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), at(0),
      (-3, 0), (-2, 0), (-1, 0))
    case 2 => Array(
      (-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), at(0),
      (-2, 0), (-1, 0))
    case 3 => Array(
      (-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), at(0),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0))
    case other => throw new IllegalArgumentException(s"GBTEMPLATE $other")
  }

  /** Nominal AT pixel positions per template (§6.2.5.3): A1 is (3,-1)
    * for templates 0 and 1, (2,-1) for templates 2 and 3 (template 1's
    * fixed pixels already cover (2,-1), so a (2,-1) A1 would waste a
    * context bit). Decode always takes AT from the stream; these are
    * only the encoder-twin defaults.
    */
  def nominalAt(template: Int): Array[(Int, Int)] = template match {
    case 0 => Array((3, -1), (-3, -1), (2, -2), (-2, -2))
    case 1 => Array((3, -1))
    case _ => Array((2, -1))
  }

  /** TPGDON pseudo-pixel contexts (§6.2.5.7) — valid in the MSB-first
    * slot labeling above.
    */
  private val SltpContext = Array(0x9B25, 0x0795, 0x00E5, 0x0195)

  /** Packed bitmap: MSB-first rows, 1 = black (the JBIG2 convention). */
  final case class Bitmap(width: Int, height: Int, data: Array[Byte]) {
    val stride: Int = (width + 7) / 8
    def get(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= width || y >= height) 0
      else (data(y * stride + (x >> 3)) >> (7 - (x & 7))) & 1
    def set(x: Int, y: Int): Unit = {
      val i = y * stride + (x >> 3)
      data(i) = (data(i) | (1 << (7 - (x & 7)))).toByte
    }
    def put(x: Int, y: Int, v: Int): Unit = {
      val i = y * stride + (x >> 3)
      val m = 1 << (7 - (x & 7))
      data(i) = (if (v == 1) data(i) | m else data(i) & ~m).toByte
    }
    def blackCount: Int =
      (0 until height).map(y => (0 until width).count(get(_, y) == 1)).sum
  }
  object Bitmap {
    def empty(w: Int, h: Int): Bitmap =
      Bitmap(w, h, new Array[Byte](((w + 7) / 8) * h))
  }

  /** §6.2.5.7 generic region decoding procedure (arithmetic variant). */
  def decodeGeneric(ad: ArithDecoder, cx: Contexts, w: Int, h: Int,
      template: Int, at: Array[(Int, Int)], tpgdon: Boolean): Bitmap = {
    val bm = Bitmap.empty(w, h)
    val slots = templateSlots(template, at)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon && ad.decode(cx, SltpContext(template)) == 1) ltp = !ltp
      if (tpgdon && ltp) {
        // typical row: copy the row above (zeros for row 0)
        if (y > 0)
          System.arraycopy(bm.data, (y - 1) * bm.stride, bm.data,
            y * bm.stride, bm.stride)
      } else {
        var x = 0
        while (x < w) {
          var ctx = 0
          var s = 0
          while (s < slots.length) {
            ctx = (ctx << 1) | bm.get(x + slots(s)._1, y + slots(s)._2)
            s += 1
          }
          if (ad.decode(cx, ctx) == 1) bm.set(x, y)
          x += 1
        }
      }
      y += 1
    }
    bm
  }

  /** Encoder twin of `decodeGeneric` — identical context walk through
    * the Annex E encoder. With TPGDON, a row equal to its predecessor
    * is coded as typical (SLTP toggles the LTP state).
    */
  def encodeGeneric(bm: Bitmap, template: Int, at: Array[(Int, Int)],
      tpgdon: Boolean): Array[Byte] = {
    val enc = new ArithEncoder
    val cx = new Contexts(1 << 16)
    encodeGenericInto(enc, cx, bm, template, at, tpgdon)
    enc.flush()
  }

  /** Generic-region encode through a SHARED encoder + context bank —
    * the form symbol dictionaries use (§6.5.8.1 codes every symbol's
    * bitmap through one arithmetic coder and one GB bank).
    */
  def encodeGenericInto(enc: ArithEncoder, cx: Contexts, bm: Bitmap,
      template: Int, at: Array[(Int, Int)], tpgdon: Boolean): Unit = {
    val slots = templateSlots(template, at)
    var ltp = false
    var y = 0
    while (y < bm.height) {
      if (tpgdon) {
        val typical = y > 0 && java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(bm.data, (y - 1) * bm.stride,
            y * bm.stride),
          java.util.Arrays.copyOfRange(bm.data, y * bm.stride,
            (y + 1) * bm.stride))
        val sltp = if (typical != ltp) 1 else 0
        enc.encode(cx, SltpContext(template), sltp)
        if (sltp == 1) ltp = !ltp
      }
      if (!(tpgdon && ltp)) {
        var x = 0
        while (x < bm.width) {
          var ctx = 0
          var s = 0
          while (s < slots.length) {
            ctx = (ctx << 1) | bm.get(x + slots(s)._1, y + slots(s)._2)
            s += 1
          }
          enc.encode(cx, ctx, bm.get(x, y))
          x += 1
        }
      }
      y += 1
    }
  }

  // ------------------------------------------- integer arithmetic (Annex A)

  /** One arithmetic-integer context bank (IADH/IADW/IAEX/IADT/IAFS/...):
    * a 512-slot PREV tree per Annex A.2.
    */
  final class IntCtx { val cx = new Contexts(512) }

  /** A.2 arithmetic integer decoding. Returns None for OOB (the S=1,
    * V=0 codeword IADS uses to end a strip). Magnitudes in the 32-bit
    * bucket saturate at Int.MaxValue rather than wrapping.
    */
  def decodeInt(ad: ArithDecoder, c: IntCtx): Option[Int] = {
    var prev = 1
    def bit(): Int = {
      val d = ad.decode(c.cx, prev)
      prev =
        if (prev < 256) (prev << 1) | d
        else ((((prev << 1) | d) & 511) | 256)
      d
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    val s = bit()
    val v: Long =
      if (bit() == 0) bits(2)
      else if (bit() == 0) bits(4) + 4
      else if (bit() == 0) bits(6) + 20
      else if (bit() == 0) bits(8) + 84
      else if (bit() == 0) bits(12) + 340
      else bits(32) + 4436
    val m = math.min(v, Int.MaxValue.toLong).toInt
    if (s == 1 && m == 0) None else Some(if (s == 1) -m else m)
  }

  /** Encoder twin of `decodeInt` (None = OOB = the S=1,V=0 codeword). */
  def encodeInt(enc: ArithEncoder, c: IntCtx, value: Option[Int]): Unit = {
    val (s, m) = value match {
      case None => (1, 0)
      case Some(x) => (if (x < 0) 1 else 0, math.abs(x))
    }
    var prev = 1
    def bit(d: Int): Unit = {
      enc.encode(c.cx, prev, d)
      prev =
        if (prev < 256) (prev << 1) | d
        else ((((prev << 1) | d) & 511) | 256)
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    bit(s)
    if (m <= 3) { bit(0); bits(m, 2) }
    else if (m <= 19) { bit(1); bit(0); bits(m - 4L, 4) }
    else if (m <= 83) { bit(1); bit(1); bit(0); bits(m - 20L, 6) }
    else if (m <= 339) { bit(1); bit(1); bit(1); bit(0); bits(m - 84L, 8) }
    else if (m <= 4435) {
      bit(1); bit(1); bit(1); bit(1); bit(0); bits(m - 340L, 12)
    } else {
      bit(1); bit(1); bit(1); bit(1); bit(1); bits(m - 4436L, 32)
    }
  }

  /** A.3 symbol-ID decoding: `symCodeLen` raw bits through a PREV tree
    * over a bank of 1 << (symCodeLen+1) contexts.
    */
  def decodeIaid(ad: ArithDecoder, cx: Contexts, symCodeLen: Int): Int = {
    var prev = 1
    var i = 0
    while (i < symCodeLen) {
      prev = (prev << 1) | ad.decode(cx, prev)
      i += 1
    }
    prev - (1 << symCodeLen)
  }

  /** Encoder twin of `decodeIaid`. */
  def encodeIaid(enc: ArithEncoder, cx: Contexts, symCodeLen: Int,
      id: Int): Unit = {
    var prev = 1
    var i = symCodeLen - 1
    while (i >= 0) {
      val d = (id >> i) & 1
      enc.encode(cx, prev, d)
      prev = (prev << 1) | d
      i -= 1
    }
  }

  // ---------------------------------- generic refinement region (§6.3)

  /** Refinement template pixel slots: (plane, dx, dy) with plane 0 =
    * the bitmap being decoded (causal neighbors only) and plane 1 =
    * the reference bitmap (shifted by the refinement offset). Slot
    * order is the context bit order (MSB first), matching the
    * public-web pdf.js transcription of T.88 figures 12/14; AT slots
    * (A1 in the current plane, A2 in the reference plane — nominal
    * (-1,-1) both) complete template 0's 13 bits.
    */
  private def refineSlots(template: Int, at: Array[(Int, Int)])
      : Array[(Int, Int, Int)] = template match {
    case 0 => Array(
      (0, 0, -1), (0, 1, -1), (0, -1, 0), (0, at(0)._1, at(0)._2),
      (1, 0, -1), (1, 1, -1), (1, -1, 0), (1, 0, 0), (1, 1, 0),
      (1, -1, 1), (1, 0, 1), (1, 1, 1), (1, at(1)._1, at(1)._2))
    case 1 => Array(
      (0, -1, -1), (0, 0, -1), (0, 1, -1), (0, -1, 0),
      (1, 0, -1), (1, -1, 0), (1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1))
    case other => throw new IllegalArgumentException(s"GRTEMPLATE $other")
  }

  /** Nominal refinement AT pixels (§6.3.5.3). */
  def nominalRefineAt: Array[(Int, Int)] = Array((-1, -1), (-1, -1))

  /** TPGRON pseudo-pixel contexts (§6.3.5.6), in THIS slot labeling:
    * template 0 coding 000+0, reference 00010000+0; template 1 coding
    * 0000, reference 001000.
    */
  private def sltpRefineContext(template: Int): Int =
    if (template == 0) 0x0020 else 0x0008

  /** §6.3.5.6: a pixel is "typical" when its 3×3 reference
    * neighborhood is uniform; under LTP such pixels take the uniform
    * value without a decision. Returns -1 (not typical) or the value.
    */
  private def typicalValue(ref: Bitmap, rx: Int, ry: Int): Int = {
    val first = ref.get(rx - 1, ry - 1)
    var dy = -1
    while (dy <= 1) {
      var dx = -1
      while (dx <= 1) {
        if (ref.get(rx + dx, ry + dy) != first) return -1
        dx += 1
      }
      dy += 1
    }
    first
  }

  /** §6.3 generic refinement region decoding: decode a w×h bitmap
    * against `ref` shifted by (dx, dy) — the reference pixel for
    * output (x, y) is ref(x − dx, y − dy). With `tpgron`, each row
    * decodes an LTP flip first; while LTP is set, pixels whose 3×3
    * reference neighborhood is uniform take that value with no
    * decision (§6.3.5.6).
    */
  def decodeRefinement(ad: ArithDecoder, cx: Contexts, w: Int, h: Int,
      template: Int, at: Array[(Int, Int)], ref: Bitmap, dx: Int,
      dy: Int, tpgron: Boolean = false): Bitmap = {
    val bm = Bitmap.empty(w, h)
    val slots = refineSlots(template, at)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgron && ad.decode(cx, sltpRefineContext(template)) == 1)
        ltp = !ltp
      var x = 0
      while (x < w) {
        val tv = if (ltp) typicalValue(ref, x - dx, y - dy) else -1
        if (tv >= 0) {
          if (tv == 1) bm.set(x, y)
        } else {
          var ctx = 0
          var s = 0
          while (s < slots.length) {
            val (plane, sx, sy) = slots(s)
            val bit =
              if (plane == 0) bm.get(x + sx, y + sy)
              else ref.get(x - dx + sx, y - dy + sy)
            ctx = (ctx << 1) | bit
            s += 1
          }
          if (ad.decode(cx, ctx) == 1) bm.set(x, y)
        }
        x += 1
      }
      y += 1
    }
    bm
  }

  /** Encoder twin of `decodeRefinement`. With `tpgron`, a row is
    * marked typical exactly when every uniform-neighborhood pixel
    * already equals its prediction — LTP then skips those decisions.
    */
  def encodeRefinementInto(enc: ArithEncoder, cx: Contexts, bm: Bitmap,
      template: Int, at: Array[(Int, Int)], ref: Bitmap, dx: Int,
      dy: Int, tpgron: Boolean = false): Unit = {
    val slots = refineSlots(template, at)
    var ltp = false
    var y = 0
    while (y < bm.height) {
      if (tpgron) {
        var rowTypical = true
        var x = 0
        while (rowTypical && x < bm.width) {
          val tv = typicalValue(ref, x - dx, y - dy)
          if (tv >= 0 && tv != bm.get(x, y)) rowTypical = false
          x += 1
        }
        enc.encode(cx, sltpRefineContext(template),
          if (rowTypical != ltp) 1 else 0)
        ltp = rowTypical
      }
      var x = 0
      while (x < bm.width) {
        val tv = if (ltp) typicalValue(ref, x - dx, y - dy) else -1
        if (tv < 0) {
          var ctx = 0
          var s = 0
          while (s < slots.length) {
            val (plane, sx, sy) = slots(s)
            val bit =
              if (plane == 0) bm.get(x + sx, y + sy)
              else ref.get(x - dx + sx, y - dy + sy)
            ctx = (ctx << 1) | bit
            s += 1
          }
          enc.encode(cx, ctx, bm.get(x, y))
        }
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------- pattern dictionary + halftone (§6.7/§6.6)

  /** §6.7 pattern dictionary: one collective generic region of width
    * (GRAYMAX+1)·HDPW split into GRAYMAX+1 patterns. The AT pixels are
    * the SPEC-FIXED values of §6.7.5 (A1 = (−HDPW, 0) reaches the same
    * pixel of the previous pattern — the collective bitmap's own
    * horizontal periodicity); they are implicit, never in the stream.
    */
  def decodePatternDict(data: Array[Byte], from: Int, until: Int)
      : Either[String, IndexedSeq[Bitmap]] = {
    if (until - from < 7) return Left("jbig2-patdict-truncated")
    var p = from
    val flags = data(p) & 0xff
    val hdmmr = (flags & 1) != 0
    val template = (flags >> 1) & 3
    val hdpw = data(p + 1) & 0xff
    val hdph = data(p + 2) & 0xff
    val grayMax = u32(data, p + 3)
    p += 7
    if (hdpw <= 0 || hdph <= 0 || grayMax < 0 || grayMax > (1 << 16) ||
      (grayMax + 1) * hdpw.toLong * hdph > (1L << 26))
      return Left("jbig2-patdict-bounds")
    val cw = ((grayMax + 1) * hdpw).toInt
    val collective =
      if (hdmmr)
        try Bitmap(cw, hdph, CcittFax.decode(
          java.util.Arrays.copyOfRange(data, p, until),
          k = -1, columns = cw, rows = hdph,
          blackIs1 = true, byteAlign = false))
        catch { case _: Exception => return Left("jbig2-patdict-mmr") }
      else {
        val at = Array((-hdpw, 0)) ++
          (if (template == 0) Array((-3, -1), (2, -2), (-2, -2))
           else Array.empty[(Int, Int)])
        decodeGeneric(new ArithDecoder(data, p, until),
          new Contexts(1 << 16), cw, hdph, template, at, tpgdon = false)
      }
    Right((0 to grayMax.toInt).map { i =>
      val bm = Bitmap.empty(hdpw, hdph)
      for (y <- 0 until hdph; x <- 0 until hdpw)
        if (collective.get(i * hdpw + x, y) == 1) bm.set(x, y)
      bm
    })
  }

  /** Encoder twin of `decodePatternDict`: patterns must share dims. */
  def encodePatternDict(patterns: Seq[Bitmap], template: Int = 0)
      : Array[Byte] = {
    require(patterns.nonEmpty && patterns.forall(p =>
      p.width == patterns.head.width && p.height == patterns.head.height))
    val hdpw = patterns.head.width; val hdph = patterns.head.height
    val out = new java.io.ByteArrayOutputStream()
    out.write(template << 1) // HDMMR=0
    out.write(hdpw); out.write(hdph)
    val gm = patterns.length - 1
    out.write((gm >> 24) & 0xff); out.write((gm >> 16) & 0xff)
    out.write((gm >> 8) & 0xff); out.write(gm & 0xff)
    val collective = Bitmap.empty(patterns.length * hdpw, hdph)
    patterns.zipWithIndex.foreach { case (pat, i) =>
      for (y <- 0 until hdph; x <- 0 until hdpw)
        if (pat.get(x, y) == 1) collective.set(i * hdpw + x, y)
    }
    val at = Array((-hdpw, 0)) ++
      (if (template == 0) Array((-3, -1), (2, -2), (-2, -2))
       else Array.empty[(Int, Int)])
    val mq = encodeGeneric(collective, template, at, tpgdon = false)
    out.write(mq, 0, mq.length)
    out.toByteArray
  }

  /** §6.6 halftone region: an Annex C gray-scale image (gray-coded
    * bitplanes MSB→LSB over ONE shared MQ decoder + context bank)
    * indexes the referred pattern dictionary; each cell's pattern is
    * composed at the §6.6.5.2 fixed-point grid position
    * ((HGX + mg·HRY + ng·HRX) >> 8, (HGY + mg·HRX − ng·HRY) >> 8).
    * MMR-coded planes and HENABLESKIP are named skips.
    */
  def decodeHalftoneRegion(data: Array[Byte], from: Int, until: Int,
      patterns: IndexedSeq[Bitmap],
      notes: scala.collection.mutable.ArrayBuffer[String])
      : Option[(Int, Int, Bitmap)] = {
    if (until - from < 17 + 1 + 20) {
      notes += "jbig2-truncated-region"; return None
    }
    var p = from
    val w = u32(data, p).toInt
    val h = u32(data, p + 4).toInt
    val x = u32(data, p + 8).toInt
    val y = u32(data, p + 12).toInt
    p += 17
    val flags = data(p) & 0xff; p += 1
    val hmmr = (flags & 1) != 0
    val template = (flags >> 1) & 3
    val enableSkip = (flags & 8) != 0
    val combOp = (flags >> 4) & 7
    val defPixel = (flags >> 7) & 1
    if (hmmr) { notes += "jbig2-halftone-mmr-skipped"; return None }
    if (enableSkip) { notes += "jbig2-halftone-skip-skipped"; return None }
    if (patterns.isEmpty) { notes += "jbig2-halftone-nopatterns"; return None }
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26) || x < 0 || y < 0 ||
      (x.toLong + w) * (y.toLong + h) > (1L << 26)) {
      notes += "jbig2-region-dims"; return None
    }
    val hgw = u32(data, p).toInt
    val hgh = u32(data, p + 4).toInt
    val hgx = u32(data, p + 8).toInt // signed 1/256-pixel units
    val hgy = u32(data, p + 12).toInt
    val hrx = ((data(p + 16) & 0xff) << 8) | (data(p + 17) & 0xff)
    val hry = ((data(p + 18) & 0xff) << 8) | (data(p + 19) & 0xff)
    p += 20
    // bound BOTH the plane-decode work (bits × cells) and the compose
    // work (cells × pattern area) BEFORE any decoding — all three
    // factors arrive attacker-controlled
    val patArea = patterns.head.width.toLong * patterns.head.height
    if (hgw <= 0 || hgh <= 0 || hgw.toLong * hgh > (1L << 20) ||
      hgw.toLong * hgh * patArea > (1L << 27)) {
      notes += "jbig2-halftone-grid"; return None
    }
    val bits = math.max(1,
      32 - Integer.numberOfLeadingZeros(math.max(patterns.length - 1, 1)))
    val at = Array((if (template <= 1) 3 else 2, -1)) ++
      (if (template == 0) Array((-3, -1), (2, -2), (-2, -2))
       else Array.empty[(Int, Int)])
    val ad = new ArithDecoder(data, p, until)
    val cx = new Contexts(1 << 16)
    val planes = new Array[Bitmap](bits)
    var j = bits - 1
    while (j >= 0) { // MSB first, one shared coder + bank (§C.5)
      planes(j) = decodeGeneric(ad, cx, hgw, hgh, template, at,
        tpgdon = false)
      j -= 1
    }
    val region = Bitmap.empty(w, h)
    if (defPixel == 1) java.util.Arrays.fill(region.data, 0xff.toByte)
    var mg = 0
    while (mg < hgh) {
      var ng = 0
      while (ng < hgw) {
        // gray decode: bit_j = plane_j ^ bit_{j+1}
        var bit = 0; var value = 0; var k = bits - 1
        while (k >= 0) {
          bit = planes(k).get(ng, mg) ^ bit
          value = (value << 1) | bit
          k -= 1
        }
        val pat = patterns(math.min(value, patterns.length - 1))
        val px = (hgx + mg * hry + ng * hrx) >> 8
        val py = (hgy + mg * hrx - ng * hry) >> 8
        var sy = 0
        while (sy < pat.height) {
          var sx = 0
          while (sx < pat.width) {
            val rx = px + sx; val ry = py + sy
            if (rx >= 0 && ry >= 0 && rx < w && ry < h) {
              val s = pat.get(sx, sy)
              val o = region.get(rx, ry)
              val v = combOp match {
                case 0 => o | s
                case 1 => o & s
                case 2 => o ^ s
                case 3 => 1 - (o ^ s) // XNOR
                case _ => s // REPLACE
              }
              region.put(rx, ry, v)
            }
            sx += 1
          }
          sy += 1
        }
        ng += 1
      }
      mg += 1
    }
    Some((x, y, region))
  }

  /** Encoder twin of `decodeHalftoneRegion`: square pitch equal to the
    * pattern width (HRX = 256·HDPW, HRY = 0, zero grid offsets), OR
    * composition. `grid` is HGH rows × HGW pattern indices.
    */
  def encodeHalftoneRegion(w: Int, h: Int, x: Int, y: Int,
      patterns: Seq[Bitmap], grid: Array[Array[Int]],
      template: Int = 0): Array[Byte] = {
    val hgh = grid.length; val hgw = grid.head.length
    require(grid.forall(_.length == hgw))
    require(grid.forall(_.forall(v => v >= 0 && v < patterns.length)))
    val hdpw = patterns.head.width
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    w32(w.toLong); w32(h.toLong); w32(x.toLong); w32(y.toLong)
    out.write(0) // external combination operator: OR
    out.write(template << 1) // flags: HMMR=0, skip=0, HCOMBOP=OR, def=0
    w32(hgw.toLong); w32(hgh.toLong); w32(0L); w32(0L) // HGW HGH HGX HGY
    w16(256 * hdpw); w16(0) // HRX HRY
    val bits = math.max(1,
      32 - Integer.numberOfLeadingZeros(math.max(patterns.length - 1, 1)))
    val at = Array((if (template <= 1) 3 else 2, -1)) ++
      (if (template == 0) Array((-3, -1), (2, -2), (-2, -2))
       else Array.empty[(Int, Int)])
    val enc = new ArithEncoder
    val cx = new Contexts(1 << 16)
    var j = bits - 1
    while (j >= 0) { // plane_j = v_j ^ v_{j+1}, MSB first
      val plane = Bitmap.empty(hgw, hgh)
      for (mg <- 0 until hgh; ng <- 0 until hgw) {
        val v = grid(mg)(ng)
        if ((((v >> j) & 1) ^ ((v >> (j + 1)) & 1)) == 1) plane.set(ng, mg)
      }
      encodeGenericInto(enc, cx, plane, template, at, tpgdon = false)
      j -= 1
    }
    val mq = enc.flush()
    out.write(mq, 0, mq.length)
    out.toByteArray
  }

  // ------------------------------------------- symbol dictionary (§6.5)

  /** Decode an arithmetic symbol-dictionary segment's data (§6.5.5,
    * flags layout §7.4.3.1.1) and return the EXPORTED symbol list
    * (input symbols from referred dictionaries prepended per §6.5.10's
    * run-length export flags). SDREFAGG dictionaries decode via the
    * single-instance refinement path of §6.5.8.2 (the form real
    * encoders emit); Huffman (SDHUFF) dictionaries and multi-instance
    * aggregates return a named skip.
    */
  def decodeSymbolDict(data: Array[Byte], from: Int, until: Int,
      inSyms: IndexedSeq[Bitmap]): Either[String, IndexedSeq[Bitmap]] = {
    if (until - from < 2 + 8) return Left("jbig2-symdict-truncated")
    var p = from
    val flags = ((data(p) & 0xff) << 8) | (data(p + 1) & 0xff)
    p += 2
    val sdhuff = (flags & 1) != 0
    val sdrefagg = (flags & 2) != 0
    val template = (flags >> 10) & 3
    val rTemplate = (flags >> 12) & 1
    if (sdhuff) return Left("jbig2-sdhuff-skipped")
    val nAt = if (template == 0) 4 else 1
    if (until - p < 2 * nAt + 8) return Left("jbig2-symdict-truncated")
    val at = Array.tabulate(nAt)(i =>
      (data(p + 2 * i).toInt, data(p + 2 * i + 1).toInt))
    p += 2 * nAt
    val refAt =
      if (sdrefagg && rTemplate == 0) {
        if (until - p < 4 + 8) return Left("jbig2-symdict-truncated")
        val a = Array((data(p).toInt, data(p + 1).toInt),
          (data(p + 2).toInt, data(p + 3).toInt))
        p += 4
        a
      } else nominalRefineAt
    val numEx = u32(data, p)
    val numNew = u32(data, p + 4)
    p += 8
    // bound symbol count and cumulative pixel area BEFORE decoding —
    // both arrive attacker-controlled in a PDF stream
    if (numNew > (1 << 16) || numEx > numNew + inSyms.length ||
      numEx < 0 || numNew < 0)
      return Left("jbig2-symdict-bounds")
    val ad = new ArithDecoder(data, p, until)
    val iadh = new IntCtx; val iadw = new IntCtx; val iaex = new IntCtx
    val iaai = new IntCtx; val iardx = new IntCtx; val iardy = new IntCtx
    val gb = new Contexts(1 << 16)
    val grCx = new Contexts(1 << 13)
    val scl = symCodeLen((inSyms.length + numNew).toInt)
    val iaid = new Contexts(1 << (scl + 1))
    val newSyms = scala.collection.mutable.ArrayBuffer.empty[Bitmap]
    var hcHeight = 0
    var area = 0L
    while (newSyms.length < numNew) {
      val dh = decodeInt(ad, iadh).getOrElse(
        return Left("jbig2-symdict-oob-height"))
      hcHeight += dh
      if (hcHeight <= 0 || hcHeight > (1 << 14))
        return Left("jbig2-symdict-bounds")
      var symWidth = 0
      var classOpen = true
      while (classOpen) {
        decodeInt(ad, iadw) match {
          case None => classOpen = false // OOB: height class complete —
          // ALWAYS consumed, even for the final class (the export runs
          // that follow read a different bank; an unconsumed OOB would
          // shift every later decode)
          case Some(dw) =>
            if (newSyms.length >= numNew) return Left("jbig2-symdict-count")
            symWidth += dw
            area += symWidth.toLong * hcHeight
            if (symWidth <= 0 || symWidth > (1 << 14) || area > (1L << 26))
              return Left("jbig2-symdict-bounds")
            if (!sdrefagg)
              newSyms += decodeGeneric(ad, gb, symWidth, hcHeight, template,
                at, tpgdon = false)
            else {
              // §6.5.8.2: refinement/aggregate symbol — only the
              // single-instance form (the common one); an aggregate of
              // several text-placed instances is a named skip
              val nInst = decodeInt(ad, iaai).getOrElse(0)
              if (nInst != 1) return Left("jbig2-refagg-multi-skipped")
              val id = decodeIaid(ad, iaid, scl)
              val rdx = decodeInt(ad, iardx).getOrElse(0)
              val rdy = decodeInt(ad, iardy).getOrElse(0)
              if (id < 0 || id >= inSyms.length + newSyms.length)
                return Left("jbig2-refagg-symid")
              val ref = if (id < inSyms.length) inSyms(id)
                else newSyms(id - inSyms.length)
              newSyms += decodeRefinement(ad, grCx, symWidth, hcHeight,
                rTemplate, refAt, ref, rdx, rdy)
            }
        }
      }
    }
    // §6.5.10 export flags: alternating run lengths over input ++ new
    val all = inSyms ++ newSyms
    val exported = scala.collection.mutable.ArrayBuffer.empty[Bitmap]
    var exIndex = 0
    var curFlag = false
    var guard = 0
    while (exIndex < all.length && guard <= 2 * all.length + 2) {
      guard += 1
      val run = decodeInt(ad, iaex).getOrElse(0)
      if (run < 0 || exIndex + run > all.length)
        return Left("jbig2-symdict-export")
      if (curFlag) exported ++= all.slice(exIndex, exIndex + run)
      exIndex += run
      curFlag = !curFlag
    }
    if (exported.length != numEx) return Left("jbig2-symdict-export")
    Right(exported.toIndexedSeq)
  }

  /** Encoder twin of `decodeSymbolDict`: all symbols new, all exported.
    * Symbols MUST be ordered by non-decreasing height (the spec's
    * height-class order); a text region's symbol IDs index this order.
    * Returns the segment DATA payload (no header).
    */
  def encodeSymbolDict(syms: Seq[Bitmap], template: Int = 0): Array[Byte] = {
    require(syms.nonEmpty, "empty symbol dictionary")
    require(syms.zip(syms.drop(1)).forall { case (a, b) =>
      a.height <= b.height }, "symbols must be height-class ordered")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    w16(template << 10) // flags: SDHUFF=0, SDREFAGG=0
    val at = nominalAt(template)
    at.foreach { case (x, y) => out.write(x & 0xff); out.write(y & 0xff) }
    w32(syms.length.toLong) // SDNUMEXSYMS
    w32(syms.length.toLong) // SDNUMNEWSYMS
    val enc = new ArithEncoder
    val iadh = new IntCtx; val iadw = new IntCtx; val iaex = new IntCtx
    val gb = new Contexts(1 << 16)
    var hcHeight = 0
    var i = 0
    while (i < syms.length) {
      val h = syms(i).height
      encodeInt(enc, iadh, Some(h - hcHeight))
      hcHeight = h
      var symWidth = 0
      while (i < syms.length && syms(i).height == h) {
        encodeInt(enc, iadw, Some(syms(i).width - symWidth))
        symWidth = syms(i).width
        encodeGenericInto(enc, gb, syms(i), template, at, tpgdon = false)
        i += 1
      }
      encodeInt(enc, iadw, None) // OOB ends the height class
    }
    encodeInt(enc, iaex, Some(0)) // first run: not-exported prefix, empty
    encodeInt(enc, iaex, Some(syms.length)) // export all new symbols
    val mq = enc.flush()
    out.write(mq, 0, mq.length)
    out.toByteArray
  }

  /** Encoder twin of the SDREFAGG single-instance path of
    * `decodeSymbolDict` (§6.5.8.2): every new symbol is coded as a §6.3
    * refinement of an already-available symbol. `newSyms` pairs the
    * reference id — indexing `inSyms ++ <new symbols decoded so far>` —
    * with the target bitmap; targets MUST be height-class ordered.
    * Everything (input + new) is exported, so text-region symbol IDs
    * index `inSyms ++ newSyms`. Returns the segment DATA payload.
    */
  def encodeSymbolDictRefAgg(inSyms: Seq[Bitmap],
      newSyms: Seq[(Int, Bitmap)], rTemplate: Int = 1): Array[Byte] = {
    require(newSyms.nonEmpty, "empty symbol dictionary")
    require(newSyms.map(_._2).zip(newSyms.map(_._2).drop(1)).forall {
      case (a, b) => a.height <= b.height },
      "symbols must be height-class ordered")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    val template = 0
    w16(2 | (template << 10) | (rTemplate << 12)) // SDHUFF=0, SDREFAGG=1
    val at = nominalAt(template)
    at.foreach { case (x, y) => out.write(x & 0xff); out.write(y & 0xff) }
    if (rTemplate == 0) nominalRefineAt.foreach { case (x, y) =>
      out.write(x & 0xff); out.write(y & 0xff) }
    val total = inSyms.length + newSyms.length
    w32(total.toLong) // SDNUMEXSYMS: export inputs + new, in order
    w32(newSyms.length.toLong) // SDNUMNEWSYMS
    val enc = new ArithEncoder
    val iadh = new IntCtx; val iadw = new IntCtx; val iaex = new IntCtx
    val iaai = new IntCtx; val iardx = new IntCtx; val iardy = new IntCtx
    val grCx = new Contexts(1 << 13)
    val scl = symCodeLen(total)
    val iaid = new Contexts(1 << (scl + 1))
    val all = scala.collection.mutable.ArrayBuffer.empty[Bitmap]
    all ++= inSyms
    var hcHeight = 0
    var i = 0
    while (i < newSyms.length) {
      val h = newSyms(i)._2.height
      encodeInt(enc, iadh, Some(h - hcHeight))
      hcHeight = h
      var symWidth = 0
      while (i < newSyms.length && newSyms(i)._2.height == h) {
        val (refId, target) = newSyms(i)
        require(refId >= 0 && refId < all.length, s"refId $refId")
        encodeInt(enc, iadw, Some(target.width - symWidth))
        symWidth = target.width
        encodeInt(enc, iaai, Some(1)) // single-instance refinement form
        encodeIaid(enc, iaid, scl, refId)
        encodeInt(enc, iardx, Some(0))
        encodeInt(enc, iardy, Some(0))
        encodeRefinementInto(enc, grCx, target, rTemplate, nominalRefineAt,
          all(refId), 0, 0)
        all += target
        i += 1
      }
      encodeInt(enc, iadw, None) // OOB ends the height class
    }
    encodeInt(enc, iaex, Some(0)) // not-exported prefix: empty
    encodeInt(enc, iaex, Some(total)) // export inputs + new symbols
    val mq = enc.flush()
    out.write(mq, 0, mq.length)
    out.toByteArray
  }

  // ----------------------------------------------- text region (§6.4)

  /** SYMCODELEN for arithmetic text regions: max(1, ceil(log2 n)) per
    * the T.88 amendment (n=1 still codes one bit).
    */
  def symCodeLen(numSyms: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(numSyms - 1, 1)))

  /** Decode an arithmetic text-region segment's data (§6.4.5, flags
    * §7.4.4.1.1): region info + placement stream drawing symbols from
    * `syms` (the referred dictionaries' exports, in referral order).
    * Returns (x, y, bitmap) for page composition. Refined instances
    * (§6.4.11) decode via the §6.3 generic refinement procedure;
    * Huffman text regions are a named skip via `notes`.
    */
  def decodeTextRegion(data: Array[Byte], from: Int, until: Int,
      syms: IndexedSeq[Bitmap],
      notes: scala.collection.mutable.ArrayBuffer[String])
      : Option[(Int, Int, Bitmap)] = {
    if (until - from < 17 + 2 + 4) { notes += "jbig2-truncated-region"; return None }
    var p = from
    val w = u32(data, p).toInt
    val h = u32(data, p + 4).toInt
    val x = u32(data, p + 8).toInt
    val y = u32(data, p + 12).toInt
    p += 17 // region info incl. external combination operator byte
    val flags = ((data(p) & 0xff) << 8) | (data(p + 1) & 0xff)
    p += 2
    val sbhuff = (flags & 1) != 0
    val refine = (flags & 2) != 0
    val logStrips = (flags >> 2) & 3
    val strips = 1 << logStrips
    val refCorner = (flags >> 4) & 3 // 0=BL 1=TL 2=BR 3=TR
    val transposed = (flags >> 6) & 1
    val combOp = (flags >> 7) & 3
    val defPixel = (flags >> 9) & 1
    val dsOffset = (flags << 17) >> 27 // signed 5-bit, bits 10-14
    val rTemplate = (flags >> 15) & 1
    if (sbhuff) { notes += "jbig2-sbhuff-skipped"; return None }
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26) || x < 0 || y < 0 ||
      (x.toLong + w) * (y.toLong + h) > (1L << 26)) {
      notes += "jbig2-region-dims"; return None
    }
    val refAt =
      if (refine && rTemplate == 0) {
        if (until - p < 4) { notes += "jbig2-truncated-region"; return None }
        val a = Array((data(p).toInt, data(p + 1).toInt),
          (data(p + 2).toInt, data(p + 3).toInt))
        p += 4
        a
      } else nominalRefineAt
    if (until - p < 4) { notes += "jbig2-truncated-region"; return None }
    val numInstances = u32(data, p)
    p += 4
    if (numInstances < 0 || numInstances > (1 << 20) || syms.isEmpty) {
      notes += "jbig2-textregion-bounds"; return None
    }
    val scl = symCodeLen(syms.length)
    val ad = new ArithDecoder(data, p, until)
    val iadt = new IntCtx; val iafs = new IntCtx; val iads = new IntCtx
    val iait = new IntCtx; val iari = new IntCtx
    val iardw = new IntCtx; val iardh = new IntCtx
    val iardx = new IntCtx; val iardy = new IntCtx
    val iaid = new Contexts(1 << (scl + 1))
    val grCx = new Contexts(1 << 13) // one bank across all refinements
    val region = Bitmap.empty(w, h)
    if (defPixel == 1) java.util.Arrays.fill(region.data, 0xff.toByte)
    def draw(sym: Bitmap, x0: Int, y0: Int): Unit = {
      var sy = 0
      while (sy < sym.height) {
        var sx = 0
        while (sx < sym.width) {
          val rx = x0 + sx; val ry = y0 + sy
          if (rx >= 0 && ry >= 0 && rx < w && ry < h) {
            val s = sym.get(sx, sy)
            val o = region.get(rx, ry)
            val v = combOp match {
              case 0 => o | s
              case 1 => o & s
              case 2 => o ^ s
              case _ => 1 - (o ^ s) // XNOR
            }
            region.put(rx, ry, v)
          }
          sx += 1
        }
        sy += 1
      }
    }
    var stripT = -decodeInt(ad, iadt).getOrElse(0) * strips
    var firstS = 0
    var n = 0L
    var steps = 0L
    val maxSteps = numInstances * 4 + 1024
    while (n < numInstances && steps < maxSteps) {
      steps += 1
      stripT += decodeInt(ad, iadt).getOrElse(0) * strips
      firstS += decodeInt(ad, iafs).getOrElse(0)
      var curS = firstS
      var stripOpen = true
      var firstSym = true
      while (stripOpen && n < numInstances && steps < maxSteps) {
        steps += 1
        if (!firstSym) {
          decodeInt(ad, iads) match {
            case None => stripOpen = false // OOB ends the strip
            case Some(ids) => curS += ids + dsOffset
          }
        }
        if (stripOpen) {
          firstSym = false
          val curT =
            if (strips == 1) 0
            else decodeInt(ad, iait).getOrElse(0)
          val ti = stripT + curT
          val id = decodeIaid(ad, iaid, scl)
          if (id < 0 || id >= syms.length) {
            notes += "jbig2-textregion-symid"
            return Some((x, y, region))
          }
          val sym: Bitmap =
            if (refine && decodeInt(ad, iari).exists(_ != 0)) {
              // §6.4.11: refined instance — deltas reshape the symbol
              // and the reference anchors at floor(rdw/2)+rdx etc.
              val rdw = decodeInt(ad, iardw).getOrElse(0)
              val rdh = decodeInt(ad, iardh).getOrElse(0)
              val rdx = decodeInt(ad, iardx).getOrElse(0)
              val rdy = decodeInt(ad, iardy).getOrElse(0)
              val base = syms(id)
              val wR = base.width + rdw
              val hR = base.height + rdh
              if (wR <= 0 || hR <= 0 || wR > (1 << 14) || hR > (1 << 14) ||
                wR.toLong * hR > (1L << 26)) {
                notes += "jbig2-refine-bounds"
                return Some((x, y, region))
              }
              decodeRefinement(ad, grCx, wR, hR, rTemplate, refAt, base,
                Math.floorDiv(rdw, 2) + rdx, Math.floorDiv(rdh, 2) + rdy)
            } else syms(id)
          if (transposed == 0) {
            // symbol spans curS..curS+w-1 horizontally; top edge at TI
            // for the TOP corners, bottom edge at TI for the BOTTOM ones
            val top = if (refCorner == 1 || refCorner == 3) ti
              else ti - sym.height + 1
            draw(sym, curS, top)
            curS += sym.width - 1
          } else {
            val left = if (refCorner == 0 || refCorner == 1) ti
              else ti - sym.width + 1
            draw(sym, left, curS)
            curS += sym.height - 1
          }
          n += 1
        }
      }
    }
    Some((x, y, region))
  }

  /** One symbol placement for the text-region encoder twin:
    * `id` indexes the dictionary's export order, `s` is the horizontal
    * (non-transposed) coordinate of the symbol's LEFT edge, `t` the TOP
    * edge. Instances must be grouped by t (strip) with non-decreasing s
    * inside a strip (SBSTRIPS=1, REFCORNER=TOPLEFT, no transpose).
    * `refined` carries the exact bitmap to draw INSTEAD of syms(id),
    * coded as a §6.4.11 refinement of it (reference anchored at the
    * refined bitmap's origin).
    */
  final case class TextInstance(id: Int, s: Int, t: Int,
      refined: Option[Bitmap] = None)

  /** Encoder twin of `decodeTextRegion`: SBSTRIPS=1, TOPLEFT corner,
    * OR composition, no transpose; refinement via GRTEMPLATE 1 when
    * any instance carries one. Returns the segment DATA payload
    * (region info included).
    */
  def encodeTextRegion(w: Int, h: Int, x: Int, y: Int,
      syms: Seq[Bitmap], instances: Seq[TextInstance]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    val refine = instances.exists(_.refined.isDefined)
    w32(w.toLong); w32(h.toLong); w32(x.toLong); w32(y.toLong)
    out.write(0) // external combination operator: OR
    // flags: REFCORNER=TOPLEFT, SBSTRIPS=1, OR, no transpose;
    // SBREFINE bit 1 + SBRTEMPLATE=1 (bit 15, no AT bytes) if refining
    w16((1 << 4) | (if (refine) (1 << 1) | (1 << 15) else 0))
    w32(instances.length.toLong)
    val scl = symCodeLen(syms.length)
    val enc = new ArithEncoder
    val iadt = new IntCtx; val iafs = new IntCtx; val iads = new IntCtx
    val iari = new IntCtx
    val iardw = new IntCtx; val iardh = new IntCtx
    val iardx = new IntCtx; val iardy = new IntCtx
    val grCx = new Contexts(1 << 13)
    val iaid = new Contexts(1 << (scl + 1))
    encodeInt(enc, iadt, Some(0)) // STRIPT starts at 0
    var stripT = 0
    var firstS = 0
    var first = true
    instances.groupBy(_.t).toSeq.sortBy(_._1).foreach { case (t, insts) =>
      require(t >= stripT || first, "strips must be in increasing t order")
      encodeInt(enc, iadt, Some(t - stripT))
      stripT = t
      val sorted = insts.sortBy(_.s)
      encodeInt(enc, iafs, Some(sorted.head.s - firstS))
      firstS = sorted.head.s
      var curS = firstS
      sorted.zipWithIndex.foreach { case (inst, i) =>
        if (i > 0) {
          // IDS is signed: negative deltas (overlapping glyphs, kerning)
          // are legal; OOB alone ends the strip
          encodeInt(enc, iads, Some(inst.s - curS))
          curS = inst.s
        }
        encodeIaid(enc, iaid, scl, inst.id)
        val drawn = inst.refined match {
          case None =>
            if (refine) encodeInt(enc, iari, Some(0))
            syms(inst.id)
          case Some(target) =>
            val base = syms(inst.id)
            val rdw = target.width - base.width
            val rdh = target.height - base.height
            encodeInt(enc, iari, Some(1))
            encodeInt(enc, iardw, Some(rdw))
            encodeInt(enc, iardh, Some(rdh))
            // choose RDX/RDY so the decode-side anchor
            // floor(rdw/2)+RDX lands at 0 (reference at the origin)
            encodeInt(enc, iardx, Some(-Math.floorDiv(rdw, 2)))
            encodeInt(enc, iardy, Some(-Math.floorDiv(rdh, 2)))
            encodeRefinementInto(enc, grCx, target, 1, nominalRefineAt,
              base, 0, 0)
            target
        }
        curS += drawn.width - 1
      }
      encodeInt(enc, iads, None) // OOB ends the strip
      first = false
    }
    val mq = enc.flush()
    out.write(mq, 0, mq.length)
    out.toByteArray
  }

  // --------------------------------------------------------- segment layer

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  final case class Segment(number: Long, segType: Int, page: Long,
      dataFrom: Int, dataUntil: Int, refs: Seq[Long] = Seq.empty)

  /** Walk an embedded-organization segment stream (§7.2 headers; the
    * form PDF JBIG2Decode carries — no file header, explicit data
    * lengths). Corrupt headers end the walk.
    */
  def segments(data: Array[Byte]): Seq[Segment] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Segment]
    var p = 0
    while (p + 11 <= data.length) {
      val number = u32(data, p)
      val flags = data(p + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      var q = p + 5
      val rts = data(q) & 0xff
      var refCount = rts >> 5
      if (refCount == 7) {
        if (q + 4 > data.length) return out.toSeq
        refCount = (u32(data, q) & 0x1fffffffL).toInt
        // long form + retain bits — refCount can be up to 2^29-1, so
        // bound in Long BEFORE advancing q (a hostile header must not
        // overflow q into a negative u32 index)
        val retainBytes = (refCount.toLong + 8) / 8
        if (q + 4L + retainBytes > data.length) return out.toSeq
        q += 4 + retainBytes.toInt
      } else q += 1
      val refSize = if (number <= 256) 1 else if (number <= 65536) 2 else 4
      if (q.toLong + refCount.toLong * refSize > data.length) return out.toSeq
      val refs = (0 until refCount).map { i =>
        val r = q + i * refSize
        refSize match {
          case 1 => (data(r) & 0xff).toLong
          case 2 => (((data(r) & 0xff) << 8) | (data(r + 1) & 0xff)).toLong
          case _ => u32(data, r)
        }
      }
      q += refCount * refSize
      val page = if (pageAssoc4) {
        if (q + 4 > data.length) return out.toSeq
        val v = u32(data, q); q += 4; v
      } else {
        if (q + 1 > data.length) return out.toSeq
        val v = (data(q) & 0xff).toLong; q += 1; v
      }
      if (q + 4 > data.length) return out.toSeq
      val len = u32(data, q)
      q += 4
      if (len == 0xffffffffL || q + len > data.length) return out.toSeq
      out += Segment(number, segType, page, q, (q + len).toInt, refs)
      p = (q + len).toInt
    }
    out.toSeq
  }

  /** Decode an embedded JBIG2 stream's regions — immediate generic
    * regions (types 36/38/39) and text regions (types 4/6/7) drawing
    * symbols from symbol-dictionary segments (type 0) — composited (OR)
    * at their region offsets. `globals` carries a PDF /JBIG2Globals
    * stream's segments (shared symbol dictionaries), processed first
    * under the same numbering. The page canvas sizes from the page-info
    * segment when present, else from the union of regions. Unsupported
    * region types are reported, not guessed.
    */
  def decodeEmbedded(data: Array[Byte],
      globals: Array[Byte] = Array.emptyByteArray): (Bitmap, Seq[String]) = {
    val segs = segments(data)
    val notes = scala.collection.mutable.ArrayBuffer.empty[String]
    // symbol dictionaries by segment number, in stream order (globals
    // first); a dictionary's inputs are its referred dicts' exports
    val dicts = scala.collection.mutable.Map.empty[Long, IndexedSeq[Bitmap]]
    def runDict(bytes: Array[Byte], s: Segment): Unit = {
      val inSyms = s.refs.flatMap(dicts.get).flatten.toIndexedSeq
      decodeSymbolDict(bytes, s.dataFrom, s.dataUntil, inSyms) match {
        case Right(syms) => dicts(s.number) = syms
        case Left(note) => notes += note
      }
    }
    val patDicts = scala.collection.mutable.Map.empty[Long, IndexedSeq[Bitmap]]
    def runPatDict(bytes: Array[Byte], s: Segment): Unit =
      decodePatternDict(bytes, s.dataFrom, s.dataUntil) match {
        case Right(pats) => patDicts(s.number) = pats
        case Left(note) => notes += note
      }
    segments(globals).foreach { s =>
      if (s.segType == 0) runDict(globals, s)
      else if (s.segType == 16) runPatDict(globals, s)
      else if (s.segType != 48 && s.segType != 51 && s.segType != 62)
        notes += s"jbig2-globals-segtype-${s.segType}-skipped"
    }
    var pageW = 0
    var pageH = 0
    segs.find(_.segType == 48).foreach { s =>
      if (s.dataUntil - s.dataFrom >= 8) {
        pageW = u32(data, s.dataFrom).toInt
        pageH = u32(data, s.dataFrom + 4).toInt
        if (pageH == -1) pageH = 0 // 0xFFFFFFFF = unknown height
        // bound BEFORE any allocation: corrupt page dims fall back to
        // the regions' union rather than sizing the canvas
        if (pageW < 0 || pageH < 0 ||
          pageW.toLong * math.max(pageH, 1) > (1L << 26)) {
          notes += "jbig2-page-dims"
          pageW = 0; pageH = 0
        }
      }
    }
    segs.filter(_.segType == 0).foreach(runDict(data, _))
    segs.filter(_.segType == 16).foreach(runPatDict(data, _))
    // Region segments decode here, then compose in STREAM ORDER (§8.2)
    // honoring each segment's external combination operator: refinement
    // region segments (40/42/43) take the page content composed SO FAR
    // as their §6.3 reference, so composition cannot be batched. A
    // Left entry is a refinement segment's declared box (decoded at
    // composition time); a Right entry is an already-decoded region.
    val regionTypes = Set(4, 6, 7, 20, 22, 23, 36, 38, 39, 40, 42, 43)
    val entries: Seq[(Segment, Either[(Int, Int, Int, Int), (Int, Int, Bitmap)])] =
      segs.filter(s => regionTypes.contains(s.segType)).flatMap { s =>
        val decoded: Option[Either[(Int, Int, Int, Int), (Int, Int, Bitmap)]] =
          s.segType match {
            case 4 | 6 | 7 =>
              val syms = s.refs.flatMap(dicts.get).flatten.toIndexedSeq
              decodeTextRegion(data, s.dataFrom, s.dataUntil, syms, notes)
                .map(Right(_))
            case 20 | 22 | 23 =>
              val pats = s.refs.flatMap(patDicts.get).flatten.toIndexedSeq
              decodeHalftoneRegion(data, s.dataFrom, s.dataUntil, pats, notes)
                .map(Right(_))
            case 40 | 42 | 43 =>
              val p = s.dataFrom
              if (s.dataUntil - p < 18) {
                notes += "jbig2-truncated-region"; None
              } else {
                val w = u32(data, p).toInt
                val h = u32(data, p + 4).toInt
                val x = u32(data, p + 8).toInt
                val y = u32(data, p + 12).toInt
                if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26) ||
                  x < 0 || y < 0 ||
                  (x.toLong + w) * (y.toLong + h) > (1L << 26)) {
                  notes += "jbig2-region-dims"; None
                } else Some(Left((x, y, w, h)))
              }
            case _ => // 36 | 38 | 39
              val p = s.dataFrom
              if (s.dataUntil - p < 18) {
                notes += "jbig2-truncated-region"; None
              } else {
                val w = u32(data, p).toInt
                val h = u32(data, p + 4).toInt
                val x = u32(data, p + 8).toInt
                val y = u32(data, p + 12).toInt
                // p+16: external combination operator (1 byte)
                val gflags = data(p + 17) & 0xff
                val mmr = (gflags & 1) != 0
                val template = (gflags >> 1) & 3
                val tpgdon = (gflags & 8) != 0
                if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26) ||
                  x < 0 || y < 0 ||
                  (x.toLong + w) * (y.toLong + h) > (1L << 26)) {
                  // offsets bound the COMPOSED canvas, before allocating
                  notes += "jbig2-region-dims"; None
                } else if (mmr) {
                  // T.88 §6.2.6: MMR coding IS T.6 (G4) — reuse the CCITT
                  // decoder (blackIs1 matches JBIG2's 1=black convention;
                  // both sides pack MSB-first byte-aligned rows). No AT
                  // bytes follow the flags when MMR=1.
                  try Some(Right((x, y, Bitmap(w, h, CcittFax.decode(
                    java.util.Arrays.copyOfRange(data, p + 18, s.dataUntil),
                    k = -1, columns = w, rows = h,
                    blackIs1 = true, byteAlign = false)))))
                  catch {
                    case _: Exception => notes += "jbig2-mmr-corrupt"; None
                  }
                } else {
                  var q = p + 18
                  val nAt = if (template == 0) 4 else 1
                  if (s.dataUntil - q < 2 * nAt) {
                    // AT bytes truncated — a named note, not an AIOOBE
                    notes += "jbig2-truncated-region"; None
                  } else {
                    val at = Array.tabulate(nAt)(i =>
                      (data(q + 2 * i).toInt, data(q + 2 * i + 1).toInt))
                    q += 2 * nAt
                    val ad = new ArithDecoder(data, q, s.dataUntil)
                    val cx = new Contexts(1 << 16)
                    Some(Right((x, y,
                      decodeGeneric(ad, cx, w, h, template, at, tpgdon))))
                  }
                }
              }
          }
        decoded.map(s -> _)
      }
    segs.filter(s =>
        !(regionTypes ++ Set(0, 16, 48, 49, 50, 51, 62)).contains(s.segType))
      .foreach(s => notes += s"jbig2-segtype-${s.segType}-skipped")
    if (entries.isEmpty) {
      notes += "jbig2-no-regions"
      return (Bitmap.empty(math.max(pageW, 1), math.max(pageH, 1)),
        notes.toSeq)
    }
    def extent(e: Either[(Int, Int, Int, Int), (Int, Int, Bitmap)])
        : (Int, Int) = e match {
      case Left((x, y, rw, rh)) => (x + rw, y + rh)
      case Right((x, y, bm)) => (x + bm.width, y + bm.height)
    }
    var w = math.max(pageW, entries.map(e => extent(e._2)._1).max)
    var h = math.max(pageH, entries.map(e => extent(e._2)._2).max)
    // The per-region bound is per-region only: one wide region at y=0
    // plus one tall region at x=0 each pass (x+w)*(y+h) <= 2^26 yet
    // union to a canvas whose w*h (and byte size) overflows Int. Bound
    // the COMPOSED canvas in Long before allocating; fall back to sane
    // page-info dims, else clip to the first region.
    if (w.toLong * h > (1L << 26)) {
      notes += "jbig2-canvas-dims"
      if (pageW > 0 && pageH > 0 && pageW.toLong * pageH <= (1L << 26)) {
        w = pageW; h = pageH
      } else {
        val (ew, eh) = extent(entries.head._2)
        w = ew; h = eh
      }
    }
    val page = Bitmap.empty(w, h)
    def compose(ox: Int, oy: Int, bm: Bitmap, comb: Int): Unit = {
      var y = 0
      while (y < bm.height) {
        var x = 0
        while (x < bm.width) {
          val rx = ox + x; val ry = oy + y
          if (rx >= 0 && ry >= 0 && rx < w && ry < h) {
            val s = bm.get(x, y)
            val o = page.get(rx, ry)
            val v = comb match {
              case 0 => o | s
              case 1 => o & s
              case 2 => o ^ s
              case 3 => 1 - (o ^ s) // XNOR
              case _ => s // REPLACE (refinement regions only, §7.4.8.5)
            }
            page.put(rx, ry, v)
          }
          x += 1
        }
        y += 1
      }
    }
    entries.foreach { case (s, entry) =>
      val comb = data(s.dataFrom + 16) & 7
      entry match {
        case Right((ox, oy, bm)) => compose(ox, oy, bm, comb)
        case Left((x0, y0, rw, rh)) =>
          // §7.4.7: flags byte (bit 0 GRTEMPLATE, bit 1 TPGRON) + AT
          // pixels (template 0 only), then the MQ stream; the §6.3
          // reference is the page content composed so far in the box
          var q = s.dataFrom + 17
          if (s.dataUntil - q < 1) notes += "jbig2-truncated-region"
          else {
            val rflags = data(q) & 0xff; q += 1
            val template = rflags & 1
            val tpgron = (rflags & 2) != 0
            val at =
              if (template == 0) {
                if (s.dataUntil - q < 4) {
                  notes += "jbig2-truncated-region"; null
                } else {
                  val a = Array((data(q).toInt, data(q + 1).toInt),
                    (data(q + 2).toInt, data(q + 3).toInt))
                  q += 4
                  a
                }
              } else nominalRefineAt
            if (at != null) {
              val ref = Bitmap.empty(rw, rh)
              for (yy <- 0 until rh; xx <- 0 until rw)
                if (page.get(x0 + xx, y0 + yy) == 1) ref.set(xx, yy)
              val bm = decodeRefinement(
                new ArithDecoder(data, q, s.dataUntil),
                new Contexts(1 << 13), rw, rh, template, at, ref, 0, 0,
                tpgron)
              compose(x0, y0, bm, comb)
            }
          }
      }
    }
    (page, notes.toSeq)
  }

  /** Encoder twin for the embedded organization: page info (type 48) +
    * one immediate lossless generic region (type 39), MQ-coded or (with
    * `mmr`) T.6-coded.
    */
  def writeEmbedded(bm: Bitmap, template: Int = 0,
      tpgdon: Boolean = false, mmr: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def header(number: Long, segType: Int, dataLen: Int): Unit = {
      w32(number)
      out.write(segType) // flags: 1-byte page assoc, not deferred
      out.write(0) // zero referred-to segments, short form
      out.write(1) // page 1
      w32(dataLen.toLong)
    }
    // page info (type 48): W, H, Xres, Yres, flags, striping
    header(0, 48, 19)
    w32(bm.width.toLong); w32(bm.height.toLong); w32(0); w32(0)
    out.write(0); out.write(0); out.write(0)
    // immediate lossless generic region (type 39)
    if (mmr) {
      val g4 = CcittFax.encode(bm.data, k = -1, columns = bm.width,
        rows = bm.height, blackIs1 = true, byteAlign = false)
      header(1, 39, 17 + 1 + g4.length)
      w32(bm.width.toLong); w32(bm.height.toLong); w32(0); w32(0)
      out.write(0) // external combination op: OR
      out.write(1) // flags: MMR=1 (no AT bytes follow)
      out.write(g4, 0, g4.length)
    } else {
      val at = nominalAt(template)
      val mq = encodeGeneric(bm, template, at, tpgdon)
      val nAt = if (template == 0) 4 else 1
      header(1, 39, 17 + 1 + 2 * nAt + mq.length)
      w32(bm.width.toLong); w32(bm.height.toLong); w32(0); w32(0)
      out.write(0) // external combination op: OR
      out.write((template << 1) | (if (tpgdon) 8 else 0)) // flags, MMR=0
      at.foreach { case (x, y) => out.write(x & 0xff); out.write(y & 0xff) }
      out.write(mq, 0, mq.length)
    }
    (out.toByteArray)
  }

  /** One embedded segment: header (1-byte page assoc, short-form refs)
    * + payload.
    */
  private def seg(number: Long, segType: Int, refs: Seq[Long],
      payload: Array[Byte]): Array[Byte] = {
    require(refs.length <= 4 && refs.forall(_ <= 256))
    val o = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    w32(number)
    o.write(segType) // flags: 1-byte page assoc, not deferred
    o.write(refs.length << 5) // short-form referred-to count
    refs.foreach(r => o.write(r.toInt & 0xff)) // 1-byte ref numbers
    o.write(1) // page 1
    w32(payload.length.toLong)
    o.write(payload, 0, payload.length)
    o.toByteArray
  }

  private def pageInfoBytes(pageW: Int, pageH: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    w32(pageW.toLong); w32(pageH.toLong); w32(0); w32(0)
    o.write(0); o.write(0); o.write(0)
    o.toByteArray
  }

  /** Full embedded-stream twin for halftone coding: page info +
    * pattern dictionary (type 16) + immediate lossless halftone region
    * (type 23) referring to it. With `splitGlobals` the pattern
    * dictionary moves to the /JBIG2Globals stream.
    */
  def writeEmbeddedHalftone(pageW: Int, pageH: Int,
      patterns: Seq[Bitmap], grid: Array[Array[Int]],
      splitGlobals: Boolean = false): (Array[Byte], Array[Byte]) = {
    val page = seg(0, 48, Seq.empty, pageInfoBytes(pageW, pageH))
    val dict = seg(1, 16, Seq.empty, encodePatternDict(patterns))
    val region = seg(2, 23, Seq(1L),
      encodeHalftoneRegion(pageW, pageH, 0, 0, patterns, grid))
    if (splitGlobals) (page ++ region, dict)
    else (page ++ dict ++ region, Array.emptyByteArray)
  }

  /** Full embedded-stream twin for a refinement region segment: page
    * info + an immediate lossless generic region carrying `base` +
    * an immediate lossless refinement region (type 43, REPLACE
    * combination per §7.4.8.5) refining the page box at (x, y) to
    * `target` — the §6.3 reference is the page content itself, so the
    * refinement can both add AND CLEAR ink.
    */
  def writeEmbeddedRefine(base: Bitmap, target: Bitmap, x: Int, y: Int,
      template: Int = 0, tpgron: Boolean = false): Array[Byte] = {
    val payload = {
      val o = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
      def w32(v: Long): Unit = { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
      w32(target.width.toLong); w32(target.height.toLong)
      w32(x.toLong); w32(y.toLong)
      o.write(4) // external combination operator: REPLACE
      o.write((template & 1) | (if (tpgron) 2 else 0))
      if (template == 0) nominalRefineAt.foreach { case (ax, ay) =>
        o.write(ax & 0xff); o.write(ay & 0xff) }
      val ref = Bitmap.empty(target.width, target.height)
      for (yy <- 0 until target.height; xx <- 0 until target.width)
        if (base.get(x + xx, y + yy) == 1) ref.set(xx, yy)
      val enc = new ArithEncoder
      encodeRefinementInto(enc, new Contexts(1 << 13), target,
        template & 1, nominalRefineAt, ref, 0, 0, tpgron)
      val mq = enc.flush()
      o.write(mq, 0, mq.length)
      o.toByteArray
    }
    seg(0, 48, Seq.empty,
      pageInfoBytes(base.width, base.height)) ++
      writeEmbedded(base).drop(11 + 19) ++ // the generic region segment
      seg(2, 43, Seq.empty, payload)
  }

  /** Full embedded-stream twin for symbol/text coding: page info +
    * symbol dictionary (type 0) + immediate text region (type 6)
    * referring to it. With `splitGlobals` the dictionary segment moves
    * to a separate stream — the PDF /JBIG2Globals carriage — and the
    * returned pair is (page data, globals).
    */
  def writeEmbeddedText(pageW: Int, pageH: Int, syms: Seq[Bitmap],
      instances: Seq[TextInstance], splitGlobals: Boolean = false,
      refined: Seq[(Int, Bitmap)] = Nil)
      : (Array[Byte], Array[Byte]) = {
    val pageInfo = pageInfoBytes(pageW, pageH)
    val dict = seg(1, 0, Seq.empty, encodeSymbolDict(syms))
    // a non-empty `refined` chains a SECOND dictionary segment coded
    // SDREFAGG over the first one's exports; the text region then
    // draws from `syms ++ refined targets` (the refagg dict's export
    // order: inputs first, new symbols after)
    val dicts =
      if (refined.isEmpty) Array(dict)
      else Array(dict, seg(2, 0, Seq(1L), encodeSymbolDictRefAgg(syms, refined)))
    val textSyms = syms ++ refined.map(_._2)
    val text = seg(dicts.length + 1L, 6, Seq(dicts.length.toLong),
      encodeTextRegion(pageW, pageH, 0, 0, textSyms, instances))
    val page = seg(0, 48, Seq.empty, pageInfo)
    val dictBytes = dicts.flatten
    if (splitGlobals) (page ++ text, dictBytes)
    else (page ++ dictBytes ++ text, Array.emptyByteArray)
  }

  /** PDF JBIG2Decode filter surface: decode the embedded stream (plus
    * an optional /JBIG2Globals stream carrying shared symbol
    * dictionaries) and return 1-bpc packed rows in the PDF DeviceGray
    * convention (0 = black) — i.e. the JBIG2 bitmap INVERTED, the
    * pdf.js-compatible presentation.
    */
  def pdfFilterDecode(data: Array[Byte],
      globals: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val (bm, notes) = decodeEmbedded(data, globals)
    require(!notes.exists(_.startsWith("jbig2-no-regions")),
      s"JBIG2 stream with no decodable region: ${notes.mkString(",")}")
    bm.data.map(b => (~b).toByte)
  }
}
