package graft.functions

import java.awt.geom.Path2D
import scala.collection.mutable

/** CFF (Compact Font Format, Adobe TN #5176) parser and Type 2
  * charstring (TN #5177) outline interpreter — the `/FontFile3` embedded
  * font program of PDF (Subtype /Type1C and /CIDFontType0C), which most
  * modern PDF producers embed. The reference renders these via pdfium
  * (`/root/reference/pixeltable/functions/document.py` page rendering);
  * here glyph outlines are interpreted directly to `Path2D` (the same
  * interpreter-exact tier as Type3 fonts in `PdfRender`) rather than
  * substituted with a JDK logical font.
  *
  * Supported: INDEX structures, top/private DICTs, charsets (formats
  * 0/1/2 + identity default), built-in encodings (Standard + formats
  * 0/1), local/global subrs with bias, CID keying (ROS/FDArray/FDSelect
  * formats 0/3), FontMatrix, and the full Type 2 path op set including
  * the flex family. Hints are consumed and ignored (they only affect
  * sub-pixel rasterization). Arithmetic/storage escape ops are rejected
  * (IAE) — they do not occur in subset fonts emitted by PDF producers.
  *
  * `write` is the fixture twin: emits a minimal simple (non-CID) CFF a
  * spec-conforming reader accepts, used by the oracle gates to build
  * pixel-aligned glyph fixtures.
  *
  * Corrupt input: all counts/offsets are bounds-checked; malformed data
  * raises IllegalArgumentException (fuzz-pinned in CffSpec).
  */
object Cff {

  /** Standard strings SIDs 0..95 — the printable-ASCII range, which is
    * all a Latin subset references by standard SID. (SIDs 96..390 are
    * accented/expert names; unknown ones surface as "sidN" and simply
    * fail name lookup, skipping the glyph.) SIDs 1..95 are exactly the
    * StandardEncoding codes 32..126 in order.
    */
  private val StdStrings: IndexedSeq[String] = {
    val ascii = IndexedSeq("space", "exclam", "quotedbl", "numbersign",
      "dollar", "percent", "ampersand", "quoteright", "parenleft",
      "parenright", "asterisk", "plus", "comma", "hyphen", "period",
      "slash", "zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine", "colon", "semicolon", "less", "equal",
      "greater", "question", "at", "A", "B", "C", "D", "E", "F", "G",
      "H", "I", "J", "K", "L", "M", "N", "O", "P", "Q", "R", "S", "T",
      "U", "V", "W", "X", "Y", "Z", "bracketleft", "backslash",
      "bracketright", "asciicircum", "underscore", "quoteleft", "a",
      "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n",
      "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
      "braceleft", "bar", "braceright", "asciitilde")
    ".notdef" +: ascii
  }

  final case class Font(
      charStrings: IndexedSeq[Array[Byte]],
      globalSubrs: IndexedSeq[Array[Byte]],
      localSubrsFor: Int => IndexedSeq[Array[Byte]], // by gid
      fontMatrix: Array[Double], // [a b c d e f]
      nameToGid: Map[String, Int],
      cidToGid: Map[Int, Int],
      codeToGid: Map[Int, Int], // built-in encoding
      isCid: Boolean) {

    def nGlyphs: Int = charStrings.length

    /** Interpret the glyph's Type 2 charstring to a y-UP path in
      * charstring units (FontMatrix maps to text space).
      */
    def outline(gid: Int): Path2D.Double = {
      require(gid >= 0 && gid < charStrings.length, s"CFF: bad gid $gid")
      val p = new Path2D.Double()
      val in = new Interp(this, localSubrsFor(gid), p)
      in.run(charStrings(gid), 0)
      if (in.open) p.closePath()
      p
    }
  }

  private def bias(n: Int): Int =
    if (n < 1240) 107 else if (n < 33900) 1131 else 32768

  /** Type 2 charstring interpreter (TN #5177 §4). */
  private final class Interp(f: Font, local: IndexedSeq[Array[Byte]],
      p: Path2D.Double) {
    private val st = mutable.ArrayBuffer.empty[Double]
    private var x = 0.0
    private var y = 0.0
    private var nStems = 0
    private var widthDone = false
    private var done = false
    var open = false

    private def moveTo(nx: Double, ny: Double): Unit = {
      if (open) p.closePath()
      x = nx; y = ny
      p.moveTo(x, y)
      open = true
    }
    private def lineTo(nx: Double, ny: Double): Unit = {
      if (!open) { p.moveTo(x, y); open = true }
      x = nx; y = ny
      p.lineTo(x, y)
    }
    private def curveTo(c1x: Double, c1y: Double, c2x: Double, c2y: Double,
        ex: Double, ey: Double): Unit = {
      if (!open) { p.moveTo(x, y); open = true }
      p.curveTo(c1x, c1y, c2x, c2y, ex, ey)
      x = ex; y = ey
    }
    /** drop a leading width operand on the first stack-clearing op */
    private def dropWidth(expectEven: Boolean): Unit = {
      if (!widthDone) {
        widthDone = true
        val odd = st.length % 2 == 1
        if (expectEven && odd) st.remove(0)
      }
    }
    private def dropWidthIf(cond: Boolean): Unit = {
      if (!widthDone) { widthDone = true; if (cond) st.remove(0) }
    }

    def run(cs: Array[Byte], depth: Int): Unit = {
      require(depth <= 10, "CFF: subr recursion too deep")
      var i = 0
      while (i < cs.length && !done) {
        val b0 = cs(i) & 0xff
        i += 1
        if (b0 >= 32 || b0 == 28) { // operand
          require(st.length < 48, "CFF: operand stack overflow")
          if (b0 <= 246 && b0 >= 32) st += (b0 - 139).toDouble
          else if (b0 >= 247 && b0 <= 250) {
            require(i < cs.length, "CFF: truncated number")
            st += ((b0 - 247) * 256 + (cs(i) & 0xff) + 108).toDouble; i += 1
          } else if (b0 >= 251 && b0 <= 254) {
            require(i < cs.length, "CFF: truncated number")
            st += (-(b0 - 251) * 256 - (cs(i) & 0xff) - 108).toDouble; i += 1
          } else if (b0 == 28) {
            require(i + 1 < cs.length, "CFF: truncated s16")
            st += ((cs(i) << 8) | (cs(i + 1) & 0xff)).toShort.toDouble
            i += 2
          } else { // 255: 16.16 fixed
            require(i + 3 < cs.length, "CFF: truncated fixed")
            val v = ((cs(i) & 0xff) << 24) | ((cs(i + 1) & 0xff) << 16) |
              ((cs(i + 2) & 0xff) << 8) | (cs(i + 3) & 0xff)
            st += v / 65536.0
            i += 4
          }
        } else b0 match {
          case 1 | 3 | 18 | 23 => // h/vstem(hm)
            dropWidth(expectEven = true)
            nStems += st.length / 2
            st.clear()
          case 19 | 20 => // hintmask / cntrmask
            dropWidth(expectEven = true)
            nStems += st.length / 2 // implicit vstem args
            st.clear()
            val maskBytes = (nStems + 7) / 8
            require(i + maskBytes <= cs.length, "CFF: truncated hintmask")
            i += maskBytes
          case 21 => // rmoveto
            dropWidthIf(st.length > 2)
            require(st.length >= 2, "CFF: rmoveto args")
            moveTo(x + st(0), y + st(1)); st.clear()
          case 22 => // hmoveto
            dropWidthIf(st.length > 1)
            require(st.nonEmpty, "CFF: hmoveto args")
            moveTo(x + st(0), y); st.clear()
          case 4 => // vmoveto
            dropWidthIf(st.length > 1)
            require(st.nonEmpty, "CFF: vmoveto args")
            moveTo(x, y + st(0)); st.clear()
          case 5 => // rlineto
            var k = 0
            while (k + 1 < st.length) { lineTo(x + st(k), y + st(k + 1)); k += 2 }
            st.clear()
          case 6 | 7 => // hlineto / vlineto (alternating)
            var horiz = b0 == 6
            var k = 0
            while (k < st.length) {
              if (horiz) lineTo(x + st(k), y) else lineTo(x, y + st(k))
              horiz = !horiz; k += 1
            }
            st.clear()
          case 8 => // rrcurveto
            var k = 0
            while (k + 5 < st.length) {
              val c1x = x + st(k); val c1y = y + st(k + 1)
              val c2x = c1x + st(k + 2); val c2y = c1y + st(k + 3)
              curveTo(c1x, c1y, c2x, c2y, c2x + st(k + 4), c2y + st(k + 5))
              k += 6
            }
            st.clear()
          case 24 => // rcurveline
            var k = 0
            while (st.length - k >= 8) {
              val c1x = x + st(k); val c1y = y + st(k + 1)
              val c2x = c1x + st(k + 2); val c2y = c1y + st(k + 3)
              curveTo(c1x, c1y, c2x, c2y, c2x + st(k + 4), c2y + st(k + 5))
              k += 6
            }
            require(st.length - k >= 2, "CFF: rcurveline tail")
            lineTo(x + st(k), y + st(k + 1))
            st.clear()
          case 25 => // rlinecurve
            var k = 0
            while (st.length - k >= 8) {
              lineTo(x + st(k), y + st(k + 1)); k += 2
            }
            require(st.length - k >= 6, "CFF: rlinecurve tail")
            val c1x = x + st(k); val c1y = y + st(k + 1)
            val c2x = c1x + st(k + 2); val c2y = c1y + st(k + 3)
            curveTo(c1x, c1y, c2x, c2y, c2x + st(k + 4), c2y + st(k + 5))
            st.clear()
          case 26 => // vvcurveto: [dx1] {dya dxb dyb dyc}+
            var k = 0
            var dx1 = 0.0
            if (st.length % 4 == 1) { dx1 = st(0); k = 1 }
            while (k + 3 < st.length) {
              val c1x = x + dx1; val c1y = y + st(k)
              val c2x = c1x + st(k + 1); val c2y = c1y + st(k + 2)
              curveTo(c1x, c1y, c2x, c2y, c2x, c2y + st(k + 3))
              dx1 = 0.0; k += 4
            }
            st.clear()
          case 27 => // hhcurveto: [dy1] {dxa dxb dyb dxc}+
            var k = 0
            var dy1 = 0.0
            if (st.length % 4 == 1) { dy1 = st(0); k = 1 }
            while (k + 3 < st.length) {
              val c1x = x + st(k); val c1y = y + dy1
              val c2x = c1x + st(k + 1); val c2y = c1y + st(k + 2)
              curveTo(c1x, c1y, c2x, c2y, c2x + st(k + 3), c2y)
              dy1 = 0.0; k += 4
            }
            st.clear()
          case 30 | 31 => // vhcurveto / hvcurveto (alternating 4-groups)
            var horiz = b0 == 31
            var k = 0
            while (st.length - k >= 4) {
              val last = st.length - k == 5
              if (horiz) {
                val c1x = x + st(k); val c1y = y
                val c2x = c1x + st(k + 1); val c2y = c1y + st(k + 2)
                val ex = c2x + (if (last) st(k + 4) else 0.0)
                curveTo(c1x, c1y, c2x, c2y, ex, c2y + st(k + 3))
              } else {
                val c1x = x; val c1y = y + st(k)
                val c2x = c1x + st(k + 1); val c2y = c1y + st(k + 2)
                val ey = c2y + (if (last) st(k + 4) else 0.0)
                curveTo(c1x, c1y, c2x, c2y, c2x + st(k + 3), ey)
              }
              horiz = !horiz
              k += 4
            }
            st.clear()
          case 10 => // callsubr
            require(st.nonEmpty, "CFF: callsubr args")
            val idx = st.remove(st.length - 1).toInt + bias(local.length)
            require(idx >= 0 && idx < local.length, "CFF: bad local subr")
            run(local(idx), depth + 1)
          case 29 => // callgsubr
            require(st.nonEmpty, "CFF: callgsubr args")
            val idx =
              st.remove(st.length - 1).toInt + bias(f.globalSubrs.length)
            require(idx >= 0 && idx < f.globalSubrs.length,
              "CFF: bad global subr")
            run(f.globalSubrs(idx), depth + 1)
          case 11 => // return
            return
          case 14 => // endchar (seac accent args, if any, are ignored)
            done = true
          case 12 => // escape
            require(i < cs.length, "CFF: truncated escape")
            val b1 = cs(i) & 0xff
            i += 1
            b1 match {
              case 35 => // flex: 13 args, two curves
                require(st.length >= 13, "CFF: flex args")
                val c1x = x + st(0); val c1y = y + st(1)
                val c2x = c1x + st(2); val c2y = c1y + st(3)
                val jx = c2x + st(4); val jy = c2y + st(5)
                curveTo(c1x, c1y, c2x, c2y, jx, jy)
                val d1x = x + st(6); val d1y = y + st(7)
                val d2x = d1x + st(8); val d2y = d1y + st(9)
                curveTo(d1x, d1y, d2x, d2y, d2x + st(10), d2y + st(11))
                st.clear()
              case 34 => // hflex: 7 args
                require(st.length >= 7, "CFF: hflex args")
                val y0 = y
                val c1x = x + st(0); val c1y = y
                val c2x = c1x + st(1); val c2y = c1y + st(2)
                val jx = c2x + st(3); val jy = c2y
                curveTo(c1x, c1y, c2x, c2y, jx, jy)
                val d1x = x + st(4); val d1y = y
                val d2x = d1x + st(5); val d2y = y0
                curveTo(d1x, d1y, d2x, d2y, d2x + st(6), y0)
                st.clear()
              case 36 => // hflex1: 9 args
                require(st.length >= 9, "CFF: hflex1 args")
                val y0 = y
                val c1x = x + st(0); val c1y = y + st(1)
                val c2x = c1x + st(2); val c2y = c1y + st(3)
                val jx = c2x + st(4); val jy = c2y
                curveTo(c1x, c1y, c2x, c2y, jx, jy)
                val d1x = x + st(5); val d1y = y
                val d2x = d1x + st(6); val d2y = d1y + st(7)
                curveTo(d1x, d1y, d2x, d2y, d2x + st(8), y0)
                st.clear()
              case 37 => // flex1: 11 args
                require(st.length >= 11, "CFF: flex1 args")
                val sx = x; val sy = y
                val dx = st(0) + st(2) + st(4) + st(6) + st(8)
                val dy = st(1) + st(3) + st(5) + st(7) + st(9)
                val c1x = x + st(0); val c1y = y + st(1)
                val c2x = c1x + st(2); val c2y = c1y + st(3)
                val jx = c2x + st(4); val jy = c2y + st(5)
                curveTo(c1x, c1y, c2x, c2y, jx, jy)
                val d1x = x + st(6); val d1y = y + st(7)
                val d2x = d1x + st(8); val d2y = d1y + st(9)
                val (ex, ey) =
                  if (math.abs(dx) > math.abs(dy)) (d2x + st(10), sy)
                  else (sx, d2y + st(10))
                curveTo(d1x, d1y, d2x, d2y, ex, ey)
                st.clear()
              case other =>
                throw new IllegalArgumentException(
                  s"CFF: unsupported escape op 12 $other")
            }
          case other =>
            throw new IllegalArgumentException(s"CFF: bad op $other")
        }
      }
    }
  }

  // ===================== parsing =====================

  private final class Reader(val d: Array[Byte]) {
    def u8(at: Int): Int = {
      require(at >= 0 && at < d.length, "CFF: offset out of range")
      d(at) & 0xff
    }
    def u16(at: Int): Int = (u8(at) << 8) | u8(at + 1)
    def off(at: Int, size: Int): Int = {
      var v = 0
      var i = 0
      while (i < size) { v = (v << 8) | u8(at + i); i += 1 }
      require(v >= 0, "CFF: offset overflow")
      v
    }
    def slice(from: Int, until: Int): Array[Byte] = {
      require(from >= 0 && from <= until && until <= d.length,
        s"CFF: bad slice $from..$until")
      java.util.Arrays.copyOfRange(d, from, until)
    }
  }

  /** INDEX at `at` → (entries, end offset). */
  private def readIndex(r: Reader, at: Int): (IndexedSeq[Array[Byte]], Int) = {
    val count = r.u16(at)
    if (count == 0) return (IndexedSeq.empty, at + 2)
    require(count <= 65535, "CFF: index count")
    val offSize = r.u8(at + 2)
    require(offSize >= 1 && offSize <= 4, s"CFF: offSize $offSize")
    val offAt = at + 3
    val dataAt = offAt + (count + 1) * offSize - 1
    require(dataAt > 0 && dataAt < r.d.length, "CFF: index data start")
    val entries = (0 until count).map { k =>
      val o1 = r.off(offAt + k * offSize, offSize)
      val o2 = r.off(offAt + (k + 1) * offSize, offSize)
      require(o1 >= 1 && o2 >= o1, "CFF: index offsets")
      r.slice(dataAt + o1, dataAt + o2)
    }
    val end = dataAt + r.off(offAt + count * offSize, offSize)
    (entries, end)
  }

  /** DICT → op key ((12<<8)|b1 for escaped) → operands. */
  private def readDict(data: Array[Byte]): Map[Int, List[Double]] = {
    val out = mutable.Map.empty[Int, List[Double]]
    val ops = mutable.ListBuffer.empty[Double]
    var i = 0
    while (i < data.length) {
      val b0 = data(i) & 0xff
      i += 1
      if (b0 <= 21) { // operator
        val key = if (b0 == 12) {
          require(i < data.length, "CFF: dict escape")
          val k = (12 << 8) | (data(i) & 0xff); i += 1; k
        } else b0
        out(key) = ops.toList
        ops.clear()
      } else if (b0 >= 32 && b0 <= 246) ops += (b0 - 139).toDouble
      else if (b0 >= 247 && b0 <= 250) {
        ops += ((b0 - 247) * 256 + (data(i) & 0xff) + 108).toDouble; i += 1
      } else if (b0 >= 251 && b0 <= 254) {
        ops += (-(b0 - 251) * 256 - (data(i) & 0xff) - 108).toDouble; i += 1
      } else if (b0 == 28) {
        ops += ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toDouble
        i += 2
      } else if (b0 == 29) {
        ops += (((data(i) & 0xff) << 24) | ((data(i + 1) & 0xff) << 16) |
          ((data(i + 2) & 0xff) << 8) | (data(i + 3) & 0xff)).toDouble
        i += 4
      } else if (b0 == 30) { // real: nibble-coded
        val sb = new StringBuilder
        var stop = false
        while (!stop) {
          require(i < data.length, "CFF: truncated real")
          val b = data(i) & 0xff
          i += 1
          Seq(b >> 4, b & 0xf).foreach { nib =>
            if (!stop) nib match {
              case d if d <= 9 => sb.append(('0' + d).toChar)
              case 0xa => sb.append('.')
              case 0xb => sb.append('E')
              case 0xc => sb.append("E-")
              case 0xe => sb.append('-')
              case 0xf => stop = true
              case _ => throw new IllegalArgumentException("CFF: real nibble")
            }
          }
        }
        ops += (if (sb.isEmpty) 0.0 else sb.toString.toDouble)
      } else throw new IllegalArgumentException(s"CFF: dict byte $b0")
    }
    out.toMap
  }

  def parse(data: Array[Byte]): Font = {
    require(data.length >= 8, "CFF: truncated header")
    val r = new Reader(data)
    require(r.u8(0) == 1, s"CFF: major version ${r.u8(0)}")
    val hdrSize = r.u8(2)
    val (_, afterNames) = readIndex(r, hdrSize) // Name INDEX
    val (topDicts, afterTop) = readIndex(r, afterNames)
    require(topDicts.nonEmpty, "CFF: no top dict")
    val (strings, afterStrings) = readIndex(r, afterTop)
    val (gsubrs, _) = readIndex(r, afterStrings)
    val top = readDict(topDicts.head)

    def sidName(sid: Int): String =
      if (sid < StdStrings.length) StdStrings(sid)
      else if (sid < 391) s"sid$sid"
      else if (sid - 391 < strings.length)
        new String(strings(sid - 391), java.nio.charset.StandardCharsets.ISO_8859_1)
      else s"sid$sid"

    val csOff = top.get(17).flatMap(_.headOption).map(_.toInt)
      .getOrElse(throw new IllegalArgumentException("CFF: no CharStrings"))
    val (charStrings, _) = readIndex(r, csOff)
    val nG = charStrings.length

    val isCid = top.contains((12 << 8) | 30) // ROS

    // charset: gid → SID (or CID when CID-keyed); gid 0 is .notdef
    val charsetOff = top.get(15).flatMap(_.headOption).map(_.toInt)
      .getOrElse(0)
    val gidToSid: IndexedSeq[Int] =
      if (charsetOff <= 2) (0 until nG) // predefined ≈ identity
      else {
        val fmt = r.u8(charsetOff)
        val out = mutable.ArrayBuffer(0)
        fmt match {
          case 0 =>
            (1 until nG).foreach(k => out += r.u16(charsetOff + 1 + (k - 1) * 2))
          case 1 | 2 =>
            var at = charsetOff + 1
            while (out.length < nG) {
              val first = r.u16(at)
              val nLeft = if (fmt == 1) r.u8(at + 2) else r.u16(at + 2)
              at += (if (fmt == 1) 3 else 4)
              var c = 0
              while (c <= nLeft && out.length < nG) {
                out += first + c; c += 1
              }
            }
          case other =>
            throw new IllegalArgumentException(s"CFF: charset format $other")
        }
        out.toIndexedSeq
      }

    val nameToGid: Map[String, Int] =
      if (isCid) Map.empty
      else gidToSid.zipWithIndex.map { case (sid, gid) =>
        sidName(sid) -> gid
      }.toMap
    val cidToGid: Map[Int, Int] =
      if (isCid) gidToSid.zipWithIndex.map { case (cid, gid) => cid -> gid }.toMap
      else Map.empty
    val sidToGid: Map[Int, Int] =
      gidToSid.zipWithIndex.map { case (s, g) => s -> g }.toMap

    // built-in encoding: code → gid (simple fonts only)
    val encOff = top.get(16).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val codeToGid: Map[Int, Int] =
      if (isCid) Map.empty
      else if (encOff == 0 || encOff == 1) {
        // Standard/Expert: codes 32..126 → SIDs 1..95 (ASCII block)
        (32 to 126).flatMap(c => sidToGid.get(c - 31).map(c -> _)).toMap
      } else {
        val fmt = r.u8(encOff) & 0x7f
        fmt match {
          case 0 =>
            val n = r.u8(encOff + 1)
            (1 to math.min(n, nG - 1))
              .map(gid => r.u8(encOff + 1 + gid) -> gid).toMap
          case 1 =>
            val nRanges = r.u8(encOff + 1)
            var gid = 1
            val m = mutable.Map.empty[Int, Int]
            (0 until nRanges).foreach { k =>
              val first = r.u8(encOff + 2 + k * 2)
              val nLeft = r.u8(encOff + 3 + k * 2)
              (0 to nLeft).foreach { c =>
                if (gid < nG) { m(first + c) = gid; gid += 1 }
              }
            }
            m.toMap
          case other =>
            throw new IllegalArgumentException(s"CFF: encoding format $other")
        }
      }

    def privateSubrs(ops: List[Double]): IndexedSeq[Array[Byte]] =
      ops match {
        case size :: off :: Nil =>
          val pd = readDict(r.slice(off.toInt, off.toInt + size.toInt))
          pd.get(19).flatMap(_.headOption).map { rel =>
            readIndex(r, off.toInt + rel.toInt)._1
          }.getOrElse(IndexedSeq.empty)
        case _ => IndexedSeq.empty
      }

    val localSubrsFor: Int => IndexedSeq[Array[Byte]] =
      if (!isCid) {
        val subrs = top.get(18).map(privateSubrs).getOrElse(IndexedSeq.empty)
        _ => subrs
      } else {
        // FDArray of font dicts, FDSelect gid → fd
        val fdaOff = top.get((12 << 8) | 36).flatMap(_.headOption).map(_.toInt)
          .getOrElse(throw new IllegalArgumentException("CFF: CID no FDArray"))
        val (fds, _) = readIndex(r, fdaOff)
        val perFd = fds.map(fd => readDict(fd).get(18).map(privateSubrs)
          .getOrElse(IndexedSeq.empty))
        val fdsOff = top.get((12 << 8) | 37).flatMap(_.headOption).map(_.toInt)
        val gidToFd: Int => Int = fdsOff match {
          case None => _ => 0
          case Some(o) => r.u8(o) match {
            case 0 => gid => r.u8(o + 1 + gid)
            case 3 =>
              val nR = r.u16(o + 1)
              val ranges = (0 until nR).map(k =>
                (r.u16(o + 3 + k * 3), r.u8(o + 5 + k * 3)))
              val sentinel = r.u16(o + 3 + nR * 3)
              gid => {
                require(gid < sentinel, "CFF: gid past FDSelect sentinel")
                ranges.lastIndexWhere(_._1 <= gid) match {
                  case -1 => 0
                  case k => ranges(k)._2
                }
              }
            case other =>
              throw new IllegalArgumentException(s"CFF: FDSelect fmt $other")
          }
        }
        gid => {
          val fd = gidToFd(gid)
          if (fd < perFd.length) perFd(fd) else IndexedSeq.empty
        }
      }

    val fm = top.get((12 << 8) | 7).filter(_.length == 6)
      .map(_.toArray).getOrElse(Array(0.001, 0, 0, 0.001, 0, 0))

    Font(charStrings, gsubrs, localSubrsFor, fm, nameToGid, cidToGid,
      codeToGid, isCid)
  }

  // ===================== fixture writer =====================

  /** Encode a Type 2 charstring from (numbers | op mnemonics): numbers
    * use the 28 s16 form; two-byte ops are written as "12:35" style.
    */
  def charstring(tokens: Seq[Any]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val opNames = Map("rmoveto" -> 21, "hmoveto" -> 22, "vmoveto" -> 4,
      "rlineto" -> 5, "hlineto" -> 6, "vlineto" -> 7, "rrcurveto" -> 8,
      "hhcurveto" -> 27, "vvcurveto" -> 26, "hvcurveto" -> 31,
      "vhcurveto" -> 30, "rcurveline" -> 24, "rlinecurve" -> 25,
      "hstem" -> 1, "vstem" -> 3, "endchar" -> 14, "callsubr" -> 10,
      "callgsubr" -> 29, "return" -> 11)
    tokens.foreach {
      case n: Int =>
        require(n >= -32768 && n <= 32767, "charstring s16 range")
        out.write(28); out.write((n >> 8) & 0xff); out.write(n & 0xff)
      case s: String if s.startsWith("12:") =>
        out.write(12); out.write(s.drop(3).toInt)
      case s: String =>
        out.write(opNames.getOrElse(s,
          throw new IllegalArgumentException(s"charstring op $s")))
      case other =>
        throw new IllegalArgumentException(s"charstring token $other")
    }
    out.toByteArray
  }

  private def writeIndex(entries: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(entries.length >> 8); out.write(entries.length & 0xff)
    if (entries.nonEmpty) {
      out.write(4) // offSize 4 (fixed for determinism)
      entries.map(_.length).scanLeft(1)(_ + _).foreach { o =>
        out.write((o >> 24) & 0xff); out.write((o >> 16) & 0xff)
        out.write((o >> 8) & 0xff); out.write(o & 0xff)
      }
      entries.foreach(out.write)
    }
    out.toByteArray
  }

  private def dictInt(op: Int, vals: Int*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    vals.foreach { v =>
      out.write(29)
      out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    if (op >= 0x100) { out.write(12); out.write(op & 0xff) }
    else out.write(op)
    out.toByteArray
  }

  /** Minimal simple (non-CID) CFF: glyphs are (name, charstring) pairs
    * (gid 0 .notdef is implicit and empty); built-in encoding format 0
    * assigns `codes(k)` to gid k+1. Names beyond the standard set go to
    * the String INDEX. Optional local subrs for callsubr coverage.
    */
  def write(glyphs: Seq[(String, Array[Byte])], codes: Seq[Int],
      localSubrs: Seq[Array[Byte]] = Seq.empty,
      globalSubrs: Seq[Array[Byte]] = Seq.empty): Array[Byte] = {
    require(glyphs.nonEmpty && codes.length == glyphs.length,
      "write: glyphs/codes mismatch")
    val header = Array[Byte](1, 0, 4, 4)
    val nameIdx = writeIndex(Seq("GraftFixture".getBytes("US-ASCII")))
    val gsubIdx = writeIndex(globalSubrs)
    // SIDs: standard name → its SID; custom → 391 + string-index pos
    val custom = mutable.LinkedHashMap.empty[String, Int]
    def sidOf(n: String): Int = StdStrings.indexOf(n) match {
      case -1 => custom.getOrElseUpdate(n, 391 + custom.size)
      case k => k
    }
    val sids = glyphs.map(g => sidOf(g._1))
    val strIdx = writeIndex(custom.keys.toSeq.map(_.getBytes("US-ASCII")))
    val charStrings = writeIndex(
      Array.emptyByteArray +: glyphs.map(_._2))
    // charset format 0: SID per gid 1..n
    val charset = Array[Byte](0) ++ sids.flatMap(s =>
      Seq(((s >> 8) & 0xff).toByte, (s & 0xff).toByte))
    // encoding format 0: code per gid 1..n
    val encoding = Array[Byte](0, glyphs.length.toByte) ++
      codes.map(_.toByte)
    val subrIdx = writeIndex(localSubrs)
    // private dict: Subrs offset is relative to the private dict START;
    // the subr INDEX is appended right after the dict (dictInt output
    // size is value-independent, so self-reference is well-defined)
    val privDict = dictInt(19, dictInt(19, 0).length)
    val privFull = privDict ++ subrIdx
    // assemble with a fixed-size top dict (all operands 5-byte ints)
    val topLen = dictInt(15, 0).length + dictInt(16, 0).length +
      dictInt(17, 0).length + dictInt(18, 0, 0).length
    val topIdxLen = 2 + 1 + 2 * 4 + topLen // INDEX with 1 entry, offSize 4
    val base = header.length + nameIdx.length + topIdxLen + strIdx.length +
      gsubIdx.length
    val charsetOff = base
    val encodingOff = charsetOff + charset.length
    val csOff = encodingOff + encoding.length
    val privOff = csOff + charStrings.length
    val top = dictInt(15, charsetOff) ++ dictInt(16, encodingOff) ++
      dictInt(17, csOff) ++ dictInt(18, privDict.length, privOff)
    require(top.length == topLen, "top dict size drift")
    val topIdx = writeIndex(Seq(top))
    require(topIdx.length == topIdxLen, "top index size drift")
    header ++ nameIdx ++ topIdx ++ strIdx ++ gsubIdx ++ charset ++
      encoding ++ charStrings ++ privFull
  }
}
