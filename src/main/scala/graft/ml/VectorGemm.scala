package graft.ml

import jdk.incubator.vector.{DoubleVector, FloatVector, VectorOperators}

/** SIMD 8-row GEMM tile on the Panama Vector API (jdk.incubator.vector,
  * enabled via `--add-modules` in build.sbt). Each of the 8 vector LANES
  * carries one row's accumulator, so per-(row, out) accumulation stays
  * strictly k-sequential in Double — bit-identical to the scalar loop
  * (TensorsGemmSpec pins it). `mul` then `add` are kept as two separate
  * roundings (NO fma), again matching scalar `acc + x*w` semantics.
  *
  * This class is the only one referencing the incubator module;
  * `Tensors` instantiates it inside a LinkageError guard and falls back
  * to the scalar tile when the module is absent at runtime.
  */
private[ml] final class VectorGemm {
  private val preferred = DoubleVector.SPECIES_PREFERRED.length()
  /** 512-bit (8 lanes) and 256-bit (4 lanes) paths exist; anything else
    * (SVE oddities, 128-bit-only) reports unusable → scalar fallback.
    */
  val usable: Boolean = preferred == 8 || preferred == 4

  /** acc[r] = bias + Σ_k xt(k*8+r)·wd(wOff+k), r = 0..7 — one blocked
    * tile column; `xt` is the pre-widened transposed row tile.
    */
  def tile8(xt: Array[Double], wd: Array[Float], wOff: Int, in: Int,
      bias: Double, outAcc: Array[Double]): Unit = {
    if (preferred == 8) {
      val sp = DoubleVector.SPECIES_512
      var acc = DoubleVector.broadcast(sp, bias)
      var k = 0
      var kk = 0
      while (k < in) {
        val wv: Double = wd(wOff + k).toDouble
        acc = DoubleVector.fromArray(sp, xt, kk).mul(wv).add(acc)
        k += 1; kk += 8
      }
      acc.intoArray(outAcc, 0)
    } else {
      val sp = DoubleVector.SPECIES_256
      var accA = DoubleVector.broadcast(sp, bias)
      var accB = DoubleVector.broadcast(sp, bias)
      var k = 0
      var kk = 0
      while (k < in) {
        val wv: Double = wd(wOff + k).toDouble
        accA = DoubleVector.fromArray(sp, xt, kk).mul(wv).add(accA)
        accB = DoubleVector.fromArray(sp, xt, kk + 4).mul(wv).add(accB)
        k += 1; kk += 8
      }
      accA.intoArray(outAcc, 0)
      accB.intoArray(outAcc, 4)
    }
  }

  /** Whether the linearT column-chunk path is available (needs the
    * 8-float→8-double widening convert, i.e. 512-bit doubles).
    */
  val usableT: Boolean = preferred == 8

  /** linearT tile: 4 rows × 8 output columns [o, o+8), accumulators in
    * registers, k inner and strictly sequential per (row, column) —
    * bit-identical to the scalar loop. `w` is the Conv1D [in, out]
    * layout, so each k step loads w(k*out+o .. +7) and widens to
    * doubles (vcvtps2pd); each row's x value broadcasts as a scalar.
    */
  def tileT4x8(x: Array[Float], x0: Int, x1: Int, x2: Int, x3: Int,
      wd: Array[Float], in: Int, out: Int, o: Int, bias: Array[Float],
      acc: Array[Double]): Unit = {
    val spD = DoubleVector.SPECIES_512
    val spF = FloatVector.SPECIES_256
    val bv = FloatVector.fromArray(spF, bias, o)
      .convertShape(VectorOperators.F2D, spD, 0).asInstanceOf[DoubleVector]
    var a0 = bv; var a1 = bv; var a2 = bv; var a3 = bv
    var k = 0
    while (k < in) {
      val wv = FloatVector.fromArray(spF, wd, k * out + o)
        .convertShape(VectorOperators.F2D, spD, 0).asInstanceOf[DoubleVector]
      a0 = wv.mul(x(x0 + k).toDouble).add(a0)
      a1 = wv.mul(x(x1 + k).toDouble).add(a1)
      a2 = wv.mul(x(x2 + k).toDouble).add(a2)
      a3 = wv.mul(x(x3 + k).toDouble).add(a3)
      k += 1
    }
    a0.intoArray(acc, 0); a1.intoArray(acc, 8)
    a2.intoArray(acc, 16); a3.intoArray(acc, 24)
  }
}
