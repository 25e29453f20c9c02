package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernel: for each hash index j, the minimum of
  * md5("<j>_" ++ shingle) over the shingle set, emitted as the first
  * `prefixLen` hex chars — bit-identical to the Column composition
  * `substring(array_min(transform(sh, s -> md5(concat(lit(s"${j}_"), s)))),
  * 1, prefixLen)` (and to the DuckDB oracle), because the hex string's
  * lexicographic order IS the digest bytes' unsigned order.
  *
  * Why native: the HOF form is CodegenFallback and materializes, PER ROW
  * PER HASH, an array of 32-char hex strings just to take its min — k
  * interpreted passes with 2k·|shingles| allocations. This kernel keeps k
  * running-min 16-byte digests in one pass, allocates nothing per shingle
  * but the digest, and hex-encodes only the k winners (measured: q32
  * 9.7s → see DESIGN.md).
  */
case class MinHashSigExpr(child: Expression, numHashes: Int, prefixLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)

  private val HexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes)) // nulls
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(null: Array[Byte])
    val prefixes = Array.tabulate(numHashes)(j =>
      s"${j}_".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val sb = s.getBytes
        var j = 0
        while (j < numHashes) {
          md.reset()
          md.update(prefixes(j))
          md.update(sb)
          val d = md.digest()
          if (mins(j) == null || unsignedLess(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map { d =>
      if (d == null) null
      else {
        val out = new Array[Char](prefixLen)
        var p = 0
        while (p < prefixLen) {
          val b = d(p / 2) & 0xff
          out(p) = HexChars(if (p % 2 == 0) b >>> 4 else b & 0xf)
          p += 1
        }
        UTF8String.fromString(new String(out))
      }
    }.asInstanceOf[Array[Any]])
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass SimHash kernel: ONE md5 per token yields all 16 bit
  * contributions (nibble i of the digest, top bit), vs the HOF composition
  * that recomputes md5(token) separately for every bit — 16 interpreted
  * array passes and 16× the digest work (q35 measured 16.6× at the 10×
  * ScaleCheck before; the arithmetic is bit-identical to the Column form
  * and the DuckDB oracle: bit i = sign of Σ ±1 by hex digit i+1 >= '8').
  * A null token contributes −1 to every bit, matching
  * `when(null >= "8", 1).otherwise(-1)`.
  */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](16)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s == null) {
        var b = 0
        while (b < 16) { counts(b) -= 1; b += 1 }
      } else {
        md.reset()
        val d = md.digest(s.getBytes)
        var b = 0
        while (b < 16) {
          val nib = if (b % 2 == 0) (d(b / 2) >>> 4) & 0xf else d(b / 2) & 0xf
          counts(b) += (if (nib >= 8) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Char](16)
    var b = 0
    while (b < 16) { out(b) = if (counts(b) > 0) '1' else '0'; b += 1 }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNative {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSigExpr(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash16_native", exprs => SimHashExpr(exprs.head), "scala_udf")
  }

  /** 16-char '0'/'1' SimHash for a token-array column (one digest pass). */
  def simhash16(spark: SparkSession,
      tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    // null token-array → all-zero bits, as the HOF form's when(...) yields
    org.apache.spark.sql.functions.coalesce(
      org.apache.spark.sql.functions.call_function("simhash16_native", tokens),
      org.apache.spark.sql.functions.lit("0" * 16))
  }

  /** array of `numHashes` minhash prefixes for a shingle-set column. */
  def minhashSignature(spark: SparkSession, shingles: org.apache.spark.sql.Column,
      numHashes: Int = 8, prefixLen: Int = 12): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("minhash_sig", shingles,
      org.apache.spark.sql.functions.lit(numHashes),
      org.apache.spark.sql.functions.lit(prefixLen))
  }
}
