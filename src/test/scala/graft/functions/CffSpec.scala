package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** CFF parser + Type 2 interpreter: fixture-writer round trips, outline
  * geometry, width-operand handling, subr calls with bias, hint-mask
  * skipping, encoding/charset lookups, and fail-fast fuzz.
  */
class CffSpec extends AnyFunSuite {

  private def rectGlyph(x: Int, y: Int, w: Int, h: Int): Array[Byte] =
    Cff.charstring(Seq(x, y, "rmoveto", w, "hlineto", h, "vlineto",
      -w, "hlineto", "endchar"))

  private def area(p: java.awt.geom.Path2D.Double): (Double, Double,
      Double, Double) = {
    val b = p.getBounds2D
    (b.getMinX, b.getMinY, b.getWidth, b.getHeight)
  }

  test("rectangle glyph: parse(write) round trip, geometry exact") {
    val font = Cff.parse(Cff.write(
      Seq("A" -> rectGlyph(100, 100, 200, 150)), Seq(65)))
    assert(font.nGlyphs == 2 && !font.isCid)
    assert(font.nameToGid("A") == 1)
    assert(font.codeToGid(65) == 1)
    val p = font.outline(1)
    assert(area(p) == ((100.0, 100.0, 200.0, 150.0)))
    assert(p.contains(200, 175) && !p.contains(50, 50))
    assert(font.fontMatrix.toSeq == Seq(0.001, 0, 0, 0.001, 0, 0))
  }

  test("width operand before the first stack-clearing op is dropped") {
    // 3-arg rmoveto: leading 550 is the width; glyph identical
    val g = Cff.charstring(Seq(550, 100, 100, "rmoveto", 200, "hlineto",
      150, "vlineto", -200, "hlineto", "endchar"))
    val font = Cff.parse(Cff.write(Seq("B" -> g), Seq(66)))
    assert(area(font.outline(1)) == ((100.0, 100.0, 200.0, 150.0)))
    // odd-count hstem with width: 3 args → width + one stem pair
    val g2 = Cff.charstring(Seq(550, 10, 20, "hstem", 100, 100, "rmoveto",
      50, "hlineto", 50, "vlineto", -50, "hlineto", "endchar"))
    val f2 = Cff.parse(Cff.write(Seq("C" -> g2), Seq(67)))
    assert(area(f2.outline(1)) == ((100.0, 100.0, 50.0, 50.0)))
  }

  test("curve ops: rrcurveto with collinear controls draws straight edges") {
    // "curved" rectangle side: each control point on the segment
    val g = Cff.charstring(Seq(0, 0, "rmoveto",
      100, 0, 100, 0, 100, 0, "rrcurveto", // → (300, 0)
      0, 50, 0, 50, 0, 50, "rrcurveto", // → (300, 150)
      -300, "hlineto", "endchar"))
    val font = Cff.parse(Cff.write(Seq("D" -> g), Seq(68)))
    val p = font.outline(1)
    assert(area(p) == ((0.0, 0.0, 300.0, 150.0)))
    assert(p.contains(150, 75))
  }

  test("alternating ops: hlineto/vlineto runs and hv/vhcurveto") {
    val g = Cff.charstring(Seq(0, 0, "rmoveto",
      100, 50, 100, 50, "hlineto", // h v h v staircase to (200, 100)
      "endchar"))
    val font = Cff.parse(Cff.write(Seq("E" -> g), Seq(69)))
    assert(area(font.outline(1)) == ((0.0, 0.0, 200.0, 100.0)))
    val g2 = Cff.charstring(Seq(0, 0, "rmoveto",
      50, 0, 0, 50, "hvcurveto", // degenerate quarter: (0,0)→(50,50)
      "endchar"))
    val f2 = Cff.parse(Cff.write(Seq("F" -> g2), Seq(70)))
    val b2 = area(f2.outline(1))
    assert(b2 == ((0.0, 0.0, 50.0, 50.0)))
  }

  test("local and global subrs with small bias") {
    // subr draws the rectangle body; charstring calls it (bias 107)
    val body = Cff.charstring(Seq(200, "hlineto", 150, "vlineto",
      -200, "hlineto", "return"))
    val g = Cff.charstring(Seq(100, 100, "rmoveto", -107, "callsubr",
      "endchar"))
    val font = Cff.parse(Cff.write(Seq("G" -> g), Seq(71),
      localSubrs = Seq(body)))
    assert(area(font.outline(1)) == ((100.0, 100.0, 200.0, 150.0)))
    val g2 = Cff.charstring(Seq(100, 100, "rmoveto", -107, "callgsubr",
      "endchar"))
    val f2 = Cff.parse(Cff.write(Seq("H" -> g2), Seq(72),
      globalSubrs = Seq(body)))
    assert(area(f2.outline(1)) == ((100.0, 100.0, 200.0, 150.0)))
  }

  test("hintmask consumes stem args and mask bytes") {
    val pre = Cff.charstring(Seq(10, 20, 30, 40, "hstem"))
    val mask = Array[Byte](19, 0xff.toByte) // hintmask, 2 stems → 1 byte
    val post = Cff.charstring(Seq(100, 100, "rmoveto", 50, "hlineto",
      50, "vlineto", -50, "hlineto", "endchar"))
    val font = Cff.parse(Cff.write(Seq("I" -> (pre ++ mask ++ post)),
      Seq(73)))
    assert(area(font.outline(1)) == ((100.0, 100.0, 50.0, 50.0)))
  }

  test("flex family renders (degenerate-straight controls)") {
    val g = Cff.charstring(Seq(0, 0, "rmoveto",
      // flex: two curves along y=0 to (300,0), fd ignored
      50, 0, 50, 0, 50, 0, 50, 0, 50, 0, 50, 0, 50, "12:35",
      100, "vlineto", -300, "hlineto", "endchar"))
    val font = Cff.parse(Cff.write(Seq("J" -> g), Seq(74)))
    val p = font.outline(1)
    assert(area(p) == ((0.0, 0.0, 300.0, 100.0)))
  }

  test("custom glyph names go through the String INDEX") {
    val font = Cff.parse(Cff.write(
      Seq("uniF8FF" -> rectGlyph(0, 0, 10, 10),
        "A" -> rectGlyph(0, 0, 20, 20)), Seq(1, 65)))
    assert(font.nameToGid("uniF8FF") == 1 && font.nameToGid("A") == 2)
    assert(font.codeToGid(1) == 1 && font.codeToGid(65) == 2)
  }

  test("corrupt input fails fast (truncation + bit flips)") {
    val data = Cff.write(Seq("A" -> rectGlyph(100, 100, 200, 150)),
      Seq(65))
    val rnd = new scala.util.Random(120012)
    def poke(f: => Any): Unit =
      try { f; () } catch { case _: IllegalArgumentException => () }
    for (_ <- 0 until 150) {
      poke {
        val fnt = Cff.parse(data.take(rnd.nextInt(data.length)))
        (0 until fnt.nGlyphs).foreach(fnt.outline)
      }
      poke {
        val c = data.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        val fnt = Cff.parse(c)
        (0 until fnt.nGlyphs).foreach(fnt.outline)
      }
    }
  }
}
