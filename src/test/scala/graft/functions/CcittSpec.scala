package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** CCITT G3/G4 fax codec: encode→decode round trips across all /K
  * disciplines, absolute spot codes from the T.4 tables, structural
  * table invariants, and PDF-filter integration.
  */
class CcittSpec extends AnyFunSuite {

  private def bitmap(cols: Int, rows: Int)(
      black: (Int, Int) => Boolean): Array[Byte] = {
    // packed 1-bit rows, BlackIs1=false convention: black = 0 bit
    val rowBytes = (cols + 7) / 8
    val out = Array.fill[Byte](rows * rowBytes)(0)
    for (y <- 0 until rows; x <- 0 until cols)
      if (!black(x, y)) {
        val i = y * rowBytes * 8 + x
        out(i >> 3) = (out(i >> 3) | (1 << (7 - (i & 7)))).toByte
      }
    out
  }

  private def roundTrip(cols: Int, rows: Int, k: Int,
      byteAlign: Boolean = false, blackIs1: Boolean = false,
      endOfLine: Boolean = false)(black: (Int, Int) => Boolean): Unit = {
    val bm0 = bitmap(cols, rows)(black)
    val bm = if (blackIs1) bm0.map(b => (~b).toByte) else bm0
    // mask padding bits in the blackIs1-inverted copy so comparison is
    // on pixel bits only
    def norm(a: Array[Byte]): Seq[Int] = {
      val rowBytes = (cols + 7) / 8
      (0 until rows).flatMap { y =>
        (0 until cols).map { x =>
          val i = y * rowBytes * 8 + x
          (a(i >> 3) >> (7 - (i & 7))) & 1
        }
      }
    }
    val enc = CcittFax.encode(bm, k, cols, rows, blackIs1, byteAlign,
      endOfLine)
    val dec = CcittFax.decode(enc, k, cols, rows, blackIs1, byteAlign)
    assert(norm(dec) == norm(bm),
      s"round trip k=$k cols=$cols rows=$rows align=$byteAlign " +
        s"blackIs1=$blackIs1 eol=$endOfLine")
  }

  test("G4 round trip: rectangles, stripes, checkers, solid, empty") {
    roundTrip(40, 25, k = -1)((x, y) => x >= 7 && x < 23 && y >= 4 && y < 19)
    roundTrip(64, 16, k = -1)((_, y) => y % 2 == 0)
    roundTrip(33, 12, k = -1)((x, y) => (x + y) % 2 == 0) // worst case
    roundTrip(17, 9, k = -1)((_, _) => true) // solid black
    roundTrip(17, 9, k = -1)((_, _) => false) // solid white
    roundTrip(1, 5, k = -1)((_, y) => y % 2 == 1) // 1-wide column
  }

  test("G3 1-D and mixed 2-D round trips, byte-align, EOL, BlackIs1") {
    for (k <- Seq(-1, 0, 4); align <- Seq(false, true))
      roundTrip(29, 11, k, byteAlign = align)(
        (x, y) => (x * 3 + y * 7) % 5 < 2)
    roundTrip(29, 11, k = 0, endOfLine = true)((x, y) => x % 4 == y % 3)
    roundTrip(29, 11, k = -1, blackIs1 = true)(
      (x, y) => x > y && x < y + 9)
  }

  test("random bitmaps round trip at every K (seeded)") {
    val rnd = new scala.util.Random(41189)
    for (trial <- 0 until 30) {
      val cols = 1 + rnd.nextInt(80)
      val rows = 1 + rnd.nextInt(30)
      val cells = Array.fill(rows, cols)(rnd.nextInt(3) == 0)
      val k = Seq(-1, 0, 2)(trial % 3)
      roundTrip(cols, rows, k, byteAlign = trial % 2 == 0)(
        (x, y) => cells(y)(x))
    }
  }

  test("all MH run lengths 0..2800 survive a single-row round trip") {
    // one row of `r` black pixels then white tail exercises every
    // terminating + makeup code (incl. chained extended makeups > 2623)
    for (r <- 0 to 2800 by 7; pad <- Seq(1, 64)) {
      val cols = r + pad
      roundTrip(cols, 1, k = 0)((x, _) => x < r)
    }
    roundTrip(2800, 1, k = 0)((_, _) => true) // exact-width black run
  }

  test("absolute spot codes match the published T.4 tables") {
    // white 1 = 000111, black 1 = 010, black 2 = 11: a 1-column
    // black/white pair row encodes deterministically
    def bits(bytes: Array[Byte], n: Int): String =
      (0 until n).map(i => (bytes(i >> 3) >> (7 - (i & 7))) & 1).mkString
    // K=0, single row [black, white] over 2 columns: lines conceptually
    // start white → white0 + black1 + white1
    val e1 = CcittFax.encode(bitmap(2, 1)((x, _) => x == 0), 0, 2, 1,
      blackIs1 = false, byteAlign = false)
    assert(bits(e1, 17) == "00110101" + "010" + "000111")
    // single all-white row of 64 columns: white-makeup64 + white-term0
    val e2 = CcittFax.encode(bitmap(64, 1)((_, _) => false), 0, 64, 1,
      blackIs1 = false, byteAlign = false)
    assert(bits(e2, 13) == "11011" + "00110101")
    // G4 single row all white: V-codes impossible at 0 transitions →
    // first mode must be vertical V0 against imaginary b1=columns
    val e3 = CcittFax.encode(bitmap(8, 1)((_, _) => false), -1, 8, 1,
      blackIs1 = false, byteAlign = false)
    assert(bits(e3, 1) == "1") // V0
    // EOFB = two EOLs
    assert(bits(e3, 25).drop(1).startsWith("000000000001" + "000000000001"))
  }

  test("MH tables: prefix-free, complete coverage, makeup grid") {
    def check(t: Array[(Int, String)], ext: Boolean): Unit = {
      val codes = t.map(_._2).toSeq ++
        (if (ext) CcittFax.ExtMakeupCodes.map(_._2).toSeq else Seq.empty)
      // prefix-freeness across the color's full alphabet
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$a prefixes $b")
      // terminating codes 0..63 all present exactly once
      val runs = t.map(_._1)
      assert((0 to 63).forall(r => runs.count(_ == r) == 1))
      // makeup codes at every multiple of 64 in 64..1728
      assert((64 to 1728 by 64).forall(m => runs.count(_ == m) == 1))
    }
    check(CcittFax.WhiteCodes, ext = true)
    check(CcittFax.BlackCodes, ext = true)
    assert(CcittFax.ExtMakeupCodes.map(_._1).toSeq == (1792 to 2560 by 64))
    // no code may contain 11 leading zeros (reserved for EOL)
    (CcittFax.WhiteCodes ++ CcittFax.BlackCodes ++ CcittFax.ExtMakeupCodes)
      .foreach { case (_, c) =>
        assert(!c.startsWith("00000000000"), s"code $c collides with EOL")
      }
  }

  test("PDF filter integration: CCITTFaxDecode via applyStreamFilters") {
    val bm = bitmap(30, 10)((x, y) => x >= 5 && x < 20 && y >= 2 && y < 8)
    val enc = CcittFax.encode(bm, -1, 30, 10, blackIs1 = false,
      byteAlign = false)
    val dict = "<< /Filter /CCITTFaxDecode /DecodeParms " +
      "<< /K -1 /Columns 30 /Rows 10 >> >>"
    val dec = Pdf.applyStreamFilters(enc, Seq("CCITTFaxDecode"), dict)
    assert(dec.toSeq == bm.toSeq)
    // /Rows absent → falls back to /Height
    val dict2 = "<< /Filter /CCITTFaxDecode /Height 10 /DecodeParms " +
      "<< /K -1 /Columns 30 >> >>"
    assert(Pdf.applyStreamFilters(enc, Seq("CCITTFaxDecode"), dict2).toSeq
      == bm.toSeq)
  }

  test("corrupt input fails fast with IAE (truncation + bit flips)") {
    val bm = bitmap(40, 12)((x, y) => (x / 3 + y / 2) % 2 == 0)
    val enc = CcittFax.encode(bm, -1, 40, 12, blackIs1 = false,
      byteAlign = false)
    val rnd = new scala.util.Random(1789)
    var failures = 0
    for (_ <- 0 until 200) {
      val t = enc.take(rnd.nextInt(enc.length))
      try { CcittFax.decode(t, -1, 40, 12, blackIs1 = false,
        byteAlign = false); () }
      catch { case _: IllegalArgumentException => failures += 1 }
      val c = enc.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      try { CcittFax.decode(c, -1, 40, 12, blackIs1 = false,
        byteAlign = false); () }
      catch { case _: IllegalArgumentException => failures += 1 }
    }
    assert(failures > 0) // most corruptions must be caught, none may hang
    // oversize dimensions rejected before allocation
    intercept[IllegalArgumentException] {
      CcittFax.decode(enc, -1, 65536, 1 << 20, blackIs1 = false,
        byteAlign = false)
    }
  }
}
