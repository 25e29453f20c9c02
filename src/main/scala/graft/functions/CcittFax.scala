package graft.functions

import scala.collection.mutable

/** CCITT Group 3 / Group 4 fax codec (ITU-T T.4 / T.6) — the
  * `CCITTFaxDecode` PDF stream filter (PDF 32000-1:2008 §7.4.6), which is
  * the dominant encoding of scanned-document PDFs. The reference opens
  * these via pdfium/Pillow (`/root/reference/pixeltable/functions/document.py`
  * rendering, `utils/documents.py` sniffing); here both directions are
  * implemented from the public ITU spec text:
  *
  *  - decode: K < 0 → pure 2-D (T.6 / Group 4, the common PDF case),
  *    K = 0 → 1-D modified Huffman (T.4 §2), K > 0 → mixed 2-D (T.4 §4,
  *    EOL + tag bit per line). `/EncodedByteAlign`, `/BlackIs1`,
  *    `/Rows`, EOFB/RTC termination.
  *  - encode: the fixture twin (same role as `Pdf.lzwEncode` for
  *    LZWDecode) — emits G4 or G3 streams the decoder and any
  *    spec-conforming reader accept, used by the oracle gates to build
  *    scanned-page fixtures with closed-form geometry.
  *
  * Bit conventions (spec §2.2): codes are MSB-first; a decoded line is
  * `columns` pixels packed MSB-first and padded to a byte boundary; with
  * the PDF default `BlackIs1 false`, black pixels decode to 0 bits —
  * which is exactly 1-bit DeviceGray (0 = black), so decoded data feeds
  * the existing 1-bit image path unchanged.
  *
  * Corrupt input (fuzz-pinned in CcittSpec): every count/position is
  * bounds-checked before use and malformed codes raise
  * IllegalArgumentException — never OOM, never hang.
  */
object CcittFax {

  // ===================== T.4 modified-Huffman tables =====================
  // Transcribed from ITU-T T.4 (07/2003) tables 2/T.4 and 3/T.4 as
  // "binary code string" literals so each row reads exactly like the
  // spec's table. TableConformanceSpec holds an INDEPENDENT second
  // transcription (grouped by code length) plus prefix-freeness checks.

  /** White run codes: terminating 0..63 then makeup 64..1728. */
  val WhiteCodes: Array[(Int, String)] = Array(
    0 -> "00110101", 1 -> "000111", 2 -> "0111", 3 -> "1000",
    4 -> "1011", 5 -> "1100", 6 -> "1110", 7 -> "1111",
    8 -> "10011", 9 -> "10100", 10 -> "00111", 11 -> "01000",
    12 -> "001000", 13 -> "000011", 14 -> "110100", 15 -> "110101",
    16 -> "101010", 17 -> "101011", 18 -> "0100111", 19 -> "0001100",
    20 -> "0001000", 21 -> "0010111", 22 -> "0000011", 23 -> "0000100",
    24 -> "0101000", 25 -> "0101011", 26 -> "0010011", 27 -> "0100100",
    28 -> "0011000", 29 -> "00000010", 30 -> "00000011", 31 -> "00011010",
    32 -> "00011011", 33 -> "00010010", 34 -> "00010011", 35 -> "00010100",
    36 -> "00010101", 37 -> "00010110", 38 -> "00010111", 39 -> "00101000",
    40 -> "00101001", 41 -> "00101010", 42 -> "00101011", 43 -> "00101100",
    44 -> "00101101", 45 -> "00000100", 46 -> "00000101", 47 -> "00001010",
    48 -> "00001011", 49 -> "01010010", 50 -> "01010011", 51 -> "01010100",
    52 -> "01010101", 53 -> "00100100", 54 -> "00100101", 55 -> "01011000",
    56 -> "01011001", 57 -> "01011010", 58 -> "01011011", 59 -> "01001010",
    60 -> "01001011", 61 -> "00110010", 62 -> "00110011", 63 -> "00110100",
    64 -> "11011", 128 -> "10010", 192 -> "010111", 256 -> "0110111",
    320 -> "00110110", 384 -> "00110111", 448 -> "01100100",
    512 -> "01100101", 576 -> "01101000", 640 -> "01100111",
    704 -> "011001100", 768 -> "011001101", 832 -> "011010010",
    896 -> "011010011", 960 -> "011010100", 1024 -> "011010101",
    1088 -> "011010110", 1152 -> "011010111", 1216 -> "011011000",
    1280 -> "011011001", 1344 -> "011011010", 1408 -> "011011011",
    1472 -> "010011000", 1536 -> "010011001", 1600 -> "010011010",
    1664 -> "011000", 1728 -> "010011011")

  /** Black run codes: terminating 0..63 then makeup 64..1728. */
  val BlackCodes: Array[(Int, String)] = Array(
    0 -> "0000110111", 1 -> "010", 2 -> "11", 3 -> "10",
    4 -> "011", 5 -> "0011", 6 -> "0010", 7 -> "00011",
    8 -> "000101", 9 -> "000100", 10 -> "0000100", 11 -> "0000101",
    12 -> "0000111", 13 -> "00000100", 14 -> "00000111",
    15 -> "000011000", 16 -> "0000010111", 17 -> "0000011000",
    18 -> "0000001000", 19 -> "00001100111", 20 -> "00001101000",
    21 -> "00001101100", 22 -> "00000110111", 23 -> "00000101000",
    24 -> "00000010111", 25 -> "00000011000", 26 -> "000011001010",
    27 -> "000011001011", 28 -> "000011001100", 29 -> "000011001101",
    30 -> "000001101000", 31 -> "000001101001", 32 -> "000001101010",
    33 -> "000001101011", 34 -> "000011010010", 35 -> "000011010011",
    36 -> "000011010100", 37 -> "000011010101", 38 -> "000011010110",
    39 -> "000011010111", 40 -> "000001101100", 41 -> "000001101101",
    42 -> "000011011010", 43 -> "000011011011", 44 -> "000001010100",
    45 -> "000001010101", 46 -> "000001010110", 47 -> "000001010111",
    48 -> "000001100100", 49 -> "000001100101", 50 -> "000001010010",
    51 -> "000001010011", 52 -> "000000100100", 53 -> "000000110111",
    54 -> "000000111000", 55 -> "000000100111", 56 -> "000000101000",
    57 -> "000001011000", 58 -> "000001011001", 59 -> "000000101011",
    60 -> "000000101100", 61 -> "000001011010", 62 -> "000001100110",
    63 -> "000001100111",
    64 -> "0000001111", 128 -> "000011001000", 192 -> "000011001001",
    256 -> "000001011011", 320 -> "000000110011", 384 -> "000000110100",
    448 -> "000000110101", 512 -> "0000001101100", 576 -> "0000001101101",
    640 -> "0000001001010", 704 -> "0000001001011", 768 -> "0000001001100",
    832 -> "0000001001101", 896 -> "0000001110010", 960 -> "0000001110011",
    1024 -> "0000001110100", 1088 -> "0000001110101",
    1152 -> "0000001110110", 1216 -> "0000001110111",
    1280 -> "0000001010010", 1344 -> "0000001010011",
    1408 -> "0000001010100", 1472 -> "0000001010101",
    1536 -> "0000001011010", 1600 -> "0000001011011",
    1664 -> "0000001100100", 1728 -> "0000001100101")

  /** Extended makeup codes 1792..2560 (table 4/T.4) — shared by both
    * colors.
    */
  val ExtMakeupCodes: Array[(Int, String)] = Array(
    1792 -> "00000001000", 1856 -> "00000001100", 1920 -> "00000001101",
    1984 -> "000000010010", 2048 -> "000000010011", 2112 -> "000000010100",
    2176 -> "000000010101", 2240 -> "000000010110", 2304 -> "000000010111",
    2368 -> "000000011100", 2432 -> "000000011101", 2496 -> "000000011110",
    2560 -> "000000011111")

  // decoder lookup: key = (len << 16) | codeValue → run length
  private def decMap(tables: Array[(Int, String)]*): Map[Int, Int] =
    tables.flatten.map { case (run, code) =>
      ((code.length << 16) | Integer.parseInt(code, 2)) -> run
    }.toMap
  private val whiteDec = decMap(WhiteCodes, ExtMakeupCodes)
  private val blackDec = decMap(BlackCodes, ExtMakeupCodes)
  // encoder lookup: run → (codeValue, len)
  private def encMap(t: Array[(Int, String)]): Map[Int, (Int, Int)] =
    t.map { case (r, c) => r -> (Integer.parseInt(c, 2), c.length) }.toMap
  private val whiteEnc = encMap(WhiteCodes ++ ExtMakeupCodes)
  private val blackEnc = encMap(BlackCodes ++ ExtMakeupCodes)

  private val MaxCodeLen = 14 // longest MH code is 13 bits; +1 headroom

  // ===================== bit IO =====================

  private final class BitReader(data: Array[Byte]) {
    var pos = 0 // bit index
    def remaining: Int = data.length * 8 - pos
    def bit(): Int = {
      require(pos < data.length * 8, "CCITT: truncated stream")
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    /** Next n bits without consuming; bits past the end read as 0 (so a
      * trailing partial code fails as an unknown code, not an overrun).
      */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val b = if (p < data.length * 8) (data(p >> 3) >> (7 - (p & 7))) & 1
        else 0
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = pos += n
    def alignByte(): Unit = if ((pos & 7) != 0) pos = (pos | 7) + 1
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def put(value: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        nAcc += 1
        if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def putCode(c: (Int, Int)): Unit = put(c._1, c._2)
    def alignByte(): Unit = if (nAcc != 0) put(0, 8 - nAcc)
    def bytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ===================== decode =====================

  /** One MH-coded run of `white` color: zero or more makeup codes then a
    * terminating code (spec §2.2.1.1; runs > 2623 chain 2560-makeups).
    */
  private def readRun(br: BitReader, white: Boolean): Int = {
    val table = if (white) whiteDec else blackDec
    var total = 0
    var terminated = false
    var guard = 0
    while (!terminated) {
      guard += 1
      require(guard <= 64, "CCITT: runaway makeup chain")
      var len = 1
      var code = -1
      while (code < 0 && len <= MaxCodeLen) {
        code = table.getOrElse((len << 16) | br.peek(len), -1)
        if (code < 0) len += 1
      }
      require(code >= 0, "CCITT: bad run code")
      br.skip(len)
      total += code
      if (code < 64) terminated = true
    }
    total
  }

  /** Consume an EOL (≥11 zeros then a 1) if one is next; returns true if
    * consumed. Fill bits before the EOL are part of the zero run.
    */
  private def tryEol(br: BitReader): Boolean = {
    var zeros = 0
    while (zeros < 64 && br.peek(zeros + 1) == 0 &&
        br.remaining > zeros) zeros += 1
    if (zeros >= 11 && br.remaining > zeros && br.peek(zeros + 1) == 1) {
      br.skip(zeros + 1)
      true
    } else false
  }

  // 2-D vertical/pass/horizontal mode tags (T.4 table 4; T.6 table 1)
  private final val ModeV0 = 0
  private final val ModeH = 10
  private final val ModeP = 11
  private final val ModeEol = 12

  /** Read one 2-D mode code: V(d) returns d (−3..3) biased as-is via
    * ModeV0+d; H/P/EOL as tags.
    */
  private def readMode(br: BitReader): Int = {
    if (br.peek(1) == 1) { br.skip(1); ModeV0 }
    else if (br.peek(3) == 1) { br.skip(3); ModeH } // 001
    else if (br.peek(3) == 3) { br.skip(3); ModeV0 + 1 } // 011
    else if (br.peek(3) == 2) { br.skip(3); ModeV0 - 1 } // 010
    else if (br.peek(4) == 1) { br.skip(4); ModeP } // 0001
    else if (br.peek(6) == 3) { br.skip(6); ModeV0 + 2 } // 000011
    else if (br.peek(6) == 2) { br.skip(6); ModeV0 - 2 } // 000010
    else if (br.peek(7) == 3) { br.skip(7); ModeV0 + 3 } // 0000011
    else if (br.peek(7) == 2) { br.skip(7); ModeV0 - 3 } // 0000010
    else if (tryEol(br)) ModeEol
    else throw new IllegalArgumentException("CCITT: bad 2-D mode code")
  }

  /** Changing elements of a line: positions where color flips, even
    * indices = white→black (lines conceptually start white). Decode one
    * 2-D-coded line against reference transitions `ref`.
    */
  private def decode2D(br: BitReader, ref: Array[Int],
      columns: Int): Array[Int] = {
    val cur = mutable.ArrayBuffer.empty[Int]
    var a0 = -1
    var white = true
    var guard = 0
    while (a0 < columns) {
      guard += 1
      require(guard <= 2 * columns + 8, "CCITT: runaway 2-D line")
      // b1: first ref transition > a0 whose parity matches current color
      var j = if (white) 0 else 1
      while (j < ref.length && ref(j) <= a0) j += 2
      // a same-position transition at line start (a0 == -1) qualifies
      val b1 = if (j < ref.length) ref(j) else columns
      val b2 = if (j + 1 < ref.length) ref(j + 1) else columns
      readMode(br) match {
        case ModeEol =>
          // premature EOL: line ends here (ragged data) — pad to columns
          a0 = columns
        case ModeH =>
          val s = math.max(a0, 0)
          val r1 = readRun(br, white)
          val r2 = readRun(br, !white)
          val t1 = s + r1
          val t2 = t1 + r2
          require(t2 <= columns && r1 >= 0 && r2 >= 0,
            "CCITT: horizontal run past line end")
          cur += t1
          cur += t2
          a0 = t2
        case ModeP =>
          require(b2 <= columns, "CCITT: pass past line end")
          a0 = b2
        case v => // vertical: a1 = b1 + d
          val a1 = b1 + (v - ModeV0)
          require(a1 >= 0 && a1 <= columns && a1 > a0,
            "CCITT: vertical move out of range")
          cur += a1
          a0 = a1
          white = !white
      }
    }
    cur.toArray
  }

  /** Decode one 1-D MH line (alternating runs starting white). */
  private def decode1D(br: BitReader, columns: Int): Array[Int] = {
    val cur = mutable.ArrayBuffer.empty[Int]
    var total = 0
    var white = true
    var guard = 0
    while (total < columns) {
      guard += 1
      require(guard <= columns + 8, "CCITT: runaway 1-D line")
      val r = readRun(br, white)
      total += r
      require(total <= columns, "CCITT: 1-D run past line end")
      cur += total
      white = !white
    }
    cur.toArray
  }

  private def packLine(trans: Array[Int], columns: Int, blackIs1: Boolean,
      out: Array[Byte], rowStart: Int): Unit = {
    // conceptual color sequence: white before trans(0), flip at each
    // transition. PDF default (blackIs1=false): black = 0 bit, so white
    // bits are 1s.
    val whiteBit = if (blackIs1) 0 else 1
    var x = 0
    var white = true
    var ti = 0
    while (x < columns) {
      val next = if (ti < trans.length) math.min(trans(ti), columns)
      else columns
      val bitVal = if (white) whiteBit else 1 - whiteBit
      if (bitVal == 1) {
        var i = x
        while (i < next) {
          out(rowStart + (i >> 3)) =
            (out(rowStart + (i >> 3)) | (1 << (7 - (i & 7)))).toByte
          i += 1
        }
      }
      x = next
      white = !white
      ti += 1
    }
  }

  /** Decode a CCITT stream to packed 1-bit rows (MSB-first, each row
    * byte-aligned): exactly the sample layout of an unfiltered
    * 1-bit-per-component PDF image.
    *
    * @param k    PDF /K: < 0 pure 2-D (G4), 0 pure 1-D (G3), > 0 mixed
    *             2-D (EOL + tag bit per line, as T.4 §4.2 transmits)
    * @param rows PDF /Rows; 0 = unknown → decode until EOFB/RTC or data
    *             exhaustion (bounded)
    */
  def decode(data: Array[Byte], k: Int, columns: Int, rows: Int,
      blackIs1: Boolean, byteAlign: Boolean): Array[Byte] = {
    require(columns >= 1 && columns <= 65536, s"CCITT: bad columns $columns")
    require(rows >= 0 && rows <= (1 << 20), s"CCITT: bad rows $rows")
    val rowBytes = (columns + 7) / 8
    require(rows.toLong * rowBytes <= (1 << 27),
      "CCITT: decoded image exceeds size cap") // house media-alloc cap
    val maxRows = math.min(
      if (rows > 0) rows else 1 << 20,
      (1 << 27) / rowBytes) // cap output even when /Rows is absent
    val lines = mutable.ArrayBuffer.empty[Array[Int]]
    val br = new BitReader(data)
    var ref = Array.empty[Int] // imaginary all-white reference line
    var stop = false
    while (!stop && lines.length < maxRows) {
      if (byteAlign) br.alignByte()
      if (br.remaining < 1) stop = true
      else {
        var oneD = k == 0
        var skipLine = false
        if (k > 0) {
          // T.4 2-D: every line preceded by EOL + 1 tag bit
          require(tryEol(br), "CCITT: missing EOL in K>0 stream")
          if (br.remaining < 1) { stop = true; skipLine = true }
          else oneD = br.bit() == 1
        } else if (tryEol(br)) {
          // optional EOL (G3 1-D) / EOFB first half (G4)
          if (k < 0) { stop = true; skipLine = true } // EOFB: EOL EOL
          else if (br.remaining < 12 || tryEol(br)) {
            // RTC / trailing EOL run: end of image
            stop = true; skipLine = true
          }
        }
        if (!stop && br.remaining < 1) { stop = true; skipLine = true }
        if (!skipLine && !stop) {
          val line =
            if (oneD) decode1D(br, columns) else decode2D(br, ref, columns)
          lines += line
          ref = line
          // /Rows absent: stop once only byte-padding can remain (a
          // sub-8-bit line is possible but indistinguishable from pad)
          if (rows == 0 && br.remaining < 8) stop = true
        }
      }
    }
    require(rows == 0 || lines.length == rows,
      s"CCITT: decoded ${lines.length} rows, expected $rows")
    val out = new Array[Byte](lines.length * rowBytes)
    var r = 0
    while (r < lines.length) {
      packLine(lines(r), columns, blackIs1, out, r * rowBytes)
      r += 1
    }
    out
  }

  // ===================== encode (fixture twin) =====================

  private def transitionsOf(row: Array[Byte], rowStart: Int, columns: Int,
      blackIs1: Boolean): Array[Int] = {
    val whiteBit = if (blackIs1) 0 else 1
    val t = mutable.ArrayBuffer.empty[Int]
    var prevWhite = true
    var x = 0
    while (x < columns) {
      val bit = (row(rowStart + (x >> 3)) >> (7 - (x & 7))) & 1
      val isWhite = bit == whiteBit
      if (isWhite != prevWhite) { t += x; prevWhite = isWhite }
      x += 1
    }
    t.toArray
  }

  private def writeRun(bw: BitWriter, white: Boolean, run0: Int): Unit = {
    val enc = if (white) whiteEnc else blackEnc
    var run = run0
    while (run >= 2624) { bw.putCode(enc(2560)); run -= 2560 }
    if (run >= 64) {
      val makeup = (run / 64) * 64
      bw.putCode(enc(makeup))
      run -= makeup
    }
    bw.putCode(enc(run))
  }

  private def encode2DLine(bw: BitWriter, t: Array[Int], ref: Array[Int],
      columns: Int): Unit = {
    var a0 = -1
    var white = true
    var ti = 0 // index of next transition in t strictly greater than a0
    while (a0 < columns) {
      while (ti < t.length && t(ti) <= a0) ti += 1
      val a1 = if (ti < t.length) t(ti) else columns
      var j = if (white) 0 else 1
      while (j < ref.length && ref(j) <= a0) j += 2
      val b1 = if (j < ref.length) ref(j) else columns
      val b2 = if (j + 1 < ref.length) ref(j + 1) else columns
      if (b2 < a1) {
        bw.put(1, 4) // pass: 0001
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) {
        a1 - b1 match { // vertical codes
          case 0 => bw.put(1, 1)
          case 1 => bw.put(3, 3)
          case -1 => bw.put(2, 3)
          case 2 => bw.put(3, 6)
          case -2 => bw.put(2, 6)
          case 3 => bw.put(3, 7)
          case -3 => bw.put(2, 7)
        }
        a0 = a1
        white = !white
      } else { // horizontal: 001 + run(a0a1) + run(a1a2)
        val a2 =
          if (ti + 1 < t.length) t(ti + 1) else columns
        bw.put(1, 3)
        val s = math.max(a0, 0)
        writeRun(bw, white, a1 - s)
        writeRun(bw, !white, a2 - a1)
        a0 = a2
      }
    }
  }

  private val Eol = (1, 12) // 000000000001

  /** Encode packed 1-bit rows (the `decode` output layout) as a CCITT
    * stream with the given /K discipline. K > 0 emits EOL + tag per line
    * with all lines 2-D coded after the first (itself 1-D, per T.4
    * §4.2.1); K < 0 appends EOFB; K = 0 emits EOL per line only when
    * `endOfLine` is set.
    */
  def encode(bitmap: Array[Byte], k: Int, columns: Int, rows: Int,
      blackIs1: Boolean, byteAlign: Boolean,
      endOfLine: Boolean = false): Array[Byte] = {
    require(columns >= 1 && rows >= 0)
    val rowBytes = (columns + 7) / 8
    require(bitmap.length >= rows * rowBytes, "CCITT encode: short bitmap")
    val bw = new BitWriter
    var ref = Array.empty[Int]
    var r = 0
    while (r < rows) {
      val t = transitionsOf(bitmap, r * rowBytes, columns, blackIs1)
      if (byteAlign) bw.alignByte()
      if (k > 0) {
        bw.putCode(Eol)
        val oneD = r == 0
        bw.put(if (oneD) 1 else 0, 1)
        if (oneD) {
          var prev = 0
          var white = true
          (t :+ columns).foreach { pos =>
            writeRun(bw, white, pos - prev); prev = pos; white = !white
          }
        } else encode2DLine(bw, t, ref, columns)
      } else if (k == 0) {
        if (endOfLine) bw.putCode(Eol)
        var prev = 0
        var white = true
        t.foreach { pos =>
          writeRun(bw, white, pos - prev); prev = pos; white = !white
        }
        if (prev < columns || t.isEmpty) writeRun(bw, white, columns - prev)
      } else {
        encode2DLine(bw, t, ref, columns)
      }
      ref = t
      r += 1
    }
    if (k < 0) { bw.putCode(Eol); bw.putCode(Eol) } // EOFB
    else if (k == 0 && endOfLine) {
      var i = 0
      while (i < 6) { bw.putCode(Eol); i += 1 } // RTC
    }
    bw.bytes
  }
}
