package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Z-value (Morton code) kernel for multi-column data clustering —
  * the write-path layout behind `graft.operators.ZOrder` (the OPTIMIZE
  * ZORDER analog of Delta/Iceberg, on plain parquet).
  *
  * Left child: the row's values packed as `array<double>` (one per z-order
  * column, in order). Right child: a FOLDABLE matrix of per-column quantile
  * cut points (each row 2^bits − 1 ascending doubles). Per column, the
  * bucket id is the count of cut points ≤ value (binary search over the
  * reference matrix — quantile buckets, so skew cannot collapse the curve);
  * the bucket ids' bits are then interleaved column-major into one long.
  * Rows close on EVERY z-column land close on the z-value, so range
  * partitioning + sorting by it gives parquet min/max stats that prune
  * scans filtered on ANY clustered column, not just a prefix.
  *
  * Same codegen discipline as `NearestCentroidExpr`: the cut-point matrix
  * rides as a codegen reference object, keeping generated source identical
  * across writes so janino's stage cache hits.
  */
case class ZValueExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val cuts: Array[Array[Double]] = {
    require(right.foldable, "z-order cut-point matrix must be foldable")
    right.eval(null).asInstanceOf[ArrayData].toObjectArray(
      org.apache.spark.sql.types.ArrayType(DoubleType))
      .map(_.asInstanceOf[ArrayData].toDoubleArray())
  }

  /** bits per column; every column shares one bucket count (2^bits). */
  @transient private lazy val bits: Int =
    64 - java.lang.Long.numberOfLeadingZeros(cuts(0).length.toLong)

  private def bucketOf(col: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = col.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (col(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def nullSafeEval(a: Any, unused: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    val n = cuts.length
    var z = 0L
    var j = 0
    while (j < n) {
      val b = bucketOf(cuts(j), v(j))
      var i = 0
      while (i < bits) {
        z |= ((b >>> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zcuts", cuts, "double[][]")
    val leftGen = left.genCode(ctx)
    val v = ctx.freshName("v")
    val z = ctx.freshName("z")
    val j = ctx.freshName("j")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val i = ctx.freshName("i")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        |${leftGen.code}
        |boolean ${ev.isNull} = ${leftGen.isNull};
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |  double[] $v = ${leftGen.value}.toDoubleArray();
        |  long $z = 0L;
        |  int ${j};
        |  for ($j = 0; $j < $ref.length; $j++) {
        |    int $lo = 0, $hi = $ref[$j].length;
        |    while ($lo < $hi) {
        |      int $mid = ($lo + $hi) >>> 1;
        |      if ($ref[$j][$mid] <= $v[$j]) $lo = $mid + 1; else $hi = $mid;
        |    }
        |    for (int $i = 0; $i < $bits; $i++) {
        |      $z |= ((long) (($lo >>> $i) & 1)) << ($i * $ref.length + $j);
        |    }
        |  }
        |  ${ev.value} = $z;
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderNative {
  /** Column form: z-value of `values` (array<double>, one element per
    * z-order column) against the per-column cut-point matrix.
    */
  def zvalue(spark: SparkSession, values: org.apache.spark.sql.Column,
      cuts: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zvalue_native",
      exprs => ZValueExpr(exprs.head, exprs(1)),
      "scala_udf")
    org.apache.spark.sql.functions.call_function("zvalue_native",
      values.cast("array<double>"),
      org.apache.spark.sql.functions.typedlit(cuts.map(_.toSeq)))
  }
}
