package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Type 4 (PostScript calculator) functions: the operator battery
  * against hand-computed results, conditionals, stack manipulation
  * semantics (copy/index/roll per PLRM), degree-based trig, integer
  * ops, and fail-closed behavior on malformed or unbounded programs.
  */
class PsCalcSpec extends AnyFunSuite {

  private def eval1(src: String, nOut: Int, xs: Double*): Seq[Double] =
    PsCalc.compile(src, nOut).get(xs)

  test("arithmetic and rounding operators") {
    assert(eval1("{ 2 add 3 mul }", 1, 4.0) == Seq(18.0))
    assert(eval1("{ dup mul }", 1, 3.0) == Seq(9.0))
    assert(eval1("{ 7 3 idiv }", 1) == Seq(2.0))
    assert(eval1("{ -7 3 idiv }", 1) == Seq(-2.0)) // truncation toward 0
    assert(eval1("{ 7 3 mod }", 1) == Seq(1.0))
    assert(eval1("{ -2.5 abs }", 1) == Seq(2.5))
    assert(eval1("{ 2.5 floor }", 1) == Seq(2.0))
    assert(eval1("{ 2.5 ceiling }", 1) == Seq(3.0))
    assert(eval1("{ 2.5 round }", 1) == Seq(3.0)) // ties to greater
    assert(eval1("{ -2.5 round }", 1) == Seq(-2.0))
    assert(eval1("{ 2.9 truncate }", 1) == Seq(2.0))
    assert(eval1("{ -2.9 truncate }", 1) == Seq(-2.0))
    assert(eval1("{ 9 sqrt }", 1) == Seq(3.0))
    assert(eval1("{ 2 3 exp }", 1) == Seq(8.0))
    assert(math.abs(eval1("{ 100 log }", 1).head - 2.0) < 1e-12)
  }

  test("trig is degree-based; atan returns [0, 360)") {
    assert(math.abs(eval1("{ 90 sin }", 1).head - 1.0) < 1e-12)
    assert(math.abs(eval1("{ 60 cos }", 1).head - 0.5) < 1e-12)
    assert(math.abs(eval1("{ 1 1 atan }", 1).head - 45.0) < 1e-9)
    assert(math.abs(eval1("{ -1 1 atan }", 1).head - 315.0) < 1e-9)
    assert(math.abs(eval1("{ 1 0 atan }", 1).head - 90.0) < 1e-9)
  }

  test("comparison, boolean and bitwise operators") {
    assert(eval1("{ 2 3 lt { 10 } { 20 } ifelse }", 1) == Seq(10.0))
    assert(eval1("{ 3 2 le { 10 } { 20 } ifelse }", 1) == Seq(20.0))
    assert(eval1("{ 5 5 eq { 1 } { 0 } ifelse }", 1) == Seq(1.0))
    assert(eval1("{ true false or { 7 } { 8 } ifelse }", 1) == Seq(7.0))
    assert(eval1("{ true not { 7 } { 8 } ifelse }", 1) == Seq(8.0))
    assert(eval1("{ 12 10 and }", 1) == Seq(8.0)) // bitwise on ints
    assert(eval1("{ 12 10 or }", 1) == Seq(14.0))
    assert(eval1("{ 12 10 xor }", 1) == Seq(6.0))
    assert(eval1("{ 1 3 bitshift }", 1) == Seq(8.0))
    assert(eval1("{ 16 -2 bitshift }", 1) == Seq(4.0))
  }

  test("stack operators: exch dup pop copy index roll") {
    assert(eval1("{ exch }", 2, 1.0, 2.0) == Seq(2.0, 1.0))
    assert(eval1("{ pop }", 1, 1.0, 2.0) == Seq(1.0))
    assert(eval1("{ 2 copy }", 4, 1.0, 2.0) == Seq(1.0, 2.0, 1.0, 2.0))
    assert(eval1("{ 1 index }", 3, 5.0, 6.0) == Seq(5.0, 6.0, 5.0))
    // 3 1 roll: abc -> cab
    assert(eval1("{ 3 1 roll }", 3, 1.0, 2.0, 3.0) == Seq(3.0, 1.0, 2.0))
    // 3 -1 roll: abc -> bca
    assert(eval1("{ 3 -1 roll }", 3, 1.0, 2.0, 3.0) == Seq(2.0, 3.0, 1.0))
  }

  test("nested conditionals and an invert tint transform") {
    val f = PsCalc.compile(
      "{ dup 0.5 lt { 2 mul } { 1 exch sub 2 mul } ifelse }", 1).get
    assert(f(Seq(0.25)) == Seq(0.5))
    assert(f(Seq(0.75)) == Seq(0.5))
    // the classic 1-in 4-out separation tint: t -> 0 0 0 t (CMYK K)
    val sep = PsCalc.compile("{ 0 0 0 4 -1 roll }", 4).get
    assert(sep(Seq(0.7)) == Seq(0.0, 0.0, 0.0, 0.7))
  }

  test("multi-input programs (DeviceN tints)") {
    // 2-in 3-out: (a, b) -> (1-a, 1-b, a*b)
    val f = PsCalc.compile(
      "{ 1 2 index sub 1 2 index sub 3 index 3 index mul }", 3).get
    assert(f(Seq(0.25, 0.5)) == Seq(0.75, 0.5, 0.125))
  }

  test("fail-closed: malformed, underflow, unknown ops, step budget") {
    assert(PsCalc.compile("no braces", 1).isEmpty)
    assert(PsCalc.compile("{ 1 2 add", 1).isEmpty) // unterminated
    intercept[IllegalArgumentException] {
      PsCalc.compile("{ add }", 1).get(Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      PsCalc.compile("{ frobnicate }", 1).get(Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      PsCalc.compile("{ 1 2 3 }", 5).get(Seq.empty) // too few outputs
    }
    intercept[IllegalArgumentException] {
      // dup bomb: exceeds the stack cap, not memory
      PsCalc.compile("{ " + ("dup " * 300) + "}", 1).get(Seq(1.0))
    }
  }
}
