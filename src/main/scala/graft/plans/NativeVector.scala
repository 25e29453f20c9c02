package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native Catalyst expression for cosine similarity over `array<double>` —
  * the hot kernel of similarity search. One fused loop (dot + both norms)
  * with `doGenCode`, so it runs inside whole-stage codegen with no lambda
  * dispatch, no HOF intermediate arrays, and no UDF serialization. This is
  * tier (b) of the custom-operator ladder (compose built-ins → custom
  * Expression → custom plan) — used where the zip_with/aggregate composition
  * in `VectorFunctions` shows up in profiles.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // analysis-time contract (ADVICE r5): these kernels read raw ArrayData
  // slots, so a mistyped child (array<float>, non-array) would silently
  // return garbage at runtime — declare the types and let the analyzer
  // implicit-cast compatible inputs or fail the plan
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](ArrayType(DoubleType), ArrayType(DoubleType))


  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = java.lang.Math.min($x.length, $y.length);
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $x[$i] * $y[$i];
         |  $nx += $x[$i] * $x[$i];
         |  $ny += $y[$i] * $y[$i];
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Copy-free dot product over `array<double>`: reads elements straight off
  * the columnar/unsafe array via `getDouble(i)` — no `toDoubleArray()`
  * materialization. Built for JOIN CONDITIONS evaluated millions of times
  * per task (semantic-dedup's cluster-pair join): the fused cosine kernel
  * above allocates+copies two arrays per evaluation, which is fine in a
  * projection evaluated once per row but becomes pure GC churn when a
  * condition fires |cluster|² times per key group. With pre-normalized
  * vectors, `dot >= tau` IS the cosine test at a third of the flops and
  * zero allocation.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // analysis-time contract (ADVICE r5): these kernels read raw ArrayData
  // slots, so a mistyped child (array<float>, non-array) would silently
  // return garbage at runtime — declare the types and let the analyzer
  // implicit-cast compatible inputs or fail the plan
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](ArrayType(DoubleType), ArrayType(DoubleType))


  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over `array<double>` — the k-means / exact-ANN
  * hot kernel (assignment computes k of these per row per iteration; the
  * HOF zip_with/aggregate form is CodegenFallback and runs interpreted).
  */
case class L2SquaredExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // analysis-time contract (ADVICE r5): these kernels read raw ArrayData
  // slots, so a mistyped child (array<float>, non-array) would silently
  // return garbage at runtime — declare the types and let the analyzer
  // implicit-cast compatible inputs or fail the plan
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](ArrayType(DoubleType), ArrayType(DoubleType))


  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { val d = x(i) - y(i); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = java.lang.Math.min($x.length, $y.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x[$i] - $y[$i];
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native argmin-over-centroids for k-means assignment / IVF probing: one
  * fused k×dim loop returning the nearest centroid's index. The centroid
  * matrix rides along as a codegen REFERENCE OBJECT, not as literals —
  * inlining k·dim literal doubles makes every iteration's plan textually
  * unique, so janino recompiles the whole stage once per iteration (the
  * dominant cost of a small k-means fit); a reference keeps the generated
  * source identical across iterations and the compiled stage cached.
  */
case class NearestCentroidExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // analysis-time contract (ADVICE r5): these kernels read raw ArrayData
  // slots, so a mistyped child (array<float>, non-array) would silently
  // return garbage at runtime — declare the types and let the analyzer
  // implicit-cast compatible inputs or fail the plan
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))


  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  /** The k×dim matrix rides in as a FOLDABLE literal (array<array<double>>)
    * and is evaluated exactly once per plan, never code-generated — so the
    * generated source is identical across k-means iterations and janino's
    * compiled-stage cache hits instead of recompiling per iteration.
    */
  @transient private lazy val mat: Array[Array[Double]] = {
    require(right.foldable, "centroid matrix must be foldable")
    right.eval(null).asInstanceOf[ArrayData].toObjectArray(
      org.apache.spark.sql.types.ArrayType(DoubleType))
      .map(_.asInstanceOf[ArrayData].toDoubleArray())
  }

  override def nullSafeEval(a: Any, unused: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < mat.length) {
      val ctr = mat(c)
      val n = math.min(v.length, ctr.length)
      var s = 0.0
      var i = 0
      while (i < n) { val d = v(i) - ctr(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", mat, "double[][]")
    val leftGen = left.genCode(ctx)
    val v = ctx.freshName("v")
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val c = ctx.freshName("c")
    val s = ctx.freshName("s")
    val n = ctx.freshName("n")
    val d = ctx.freshName("d")
    val i = ctx.freshName("i")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        |${leftGen.code}
        |boolean ${ev.isNull} = ${leftGen.isNull};
        |int ${ev.value} = -1;
        |if (!${ev.isNull}) {
        |  double[] $v = ${leftGen.value}.toDoubleArray();
        |  int $best = 0;
        |  double $bestD = Double.MAX_VALUE;
        |  for (int $c = 0; $c < $ref.length; $c++) {
        |    int $n = java.lang.Math.min($v.length, $ref[$c].length);
        |    double $s = 0.0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      double $d = $v[$i] - $ref[$c][$i];
        |      $s += $d * $d;
        |    }
        |    if ($s < $bestD) { $bestD = $s; $best = $c; }
        |  }
        |  ${ev.value} = $best;
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native merge-scan intersection count over two SORTED string arrays —
  * the exact-Jaccard verification kernel. `array_intersect` builds a hash
  * set per invocation (per candidate pair); on pre-sorted distinct shingle
  * arrays a single merge scan does the same count with zero allocation,
  * and |A∪B| = |A|+|B|−|A∩B| needs no union array. Sort once per row,
  * merge per pair.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // analysis-time contract (ADVICE r5): these kernels read raw ArrayData
  // slots, so a mistyped child (array<float>, non-array) would silently
  // return garbage at runtime — declare the types and let the analyzer
  // implicit-cast compatible inputs or fail the plan
  override def inputTypes = Seq[org.apache.spark.sql.types.DataType](ArrayType(StringType), ArrayType(StringType))


  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeVector {
  /** Register `cosine_sim_native(a, b)` / `l2_sq_native(a, b)` for use via
    * expr()/SQL; both arguments must be `array<double>`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_native",
      exprs => CosineSimilarityExpr(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq_native",
      exprs => L2SquaredExpr(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_native",
      exprs => DotProductExpr(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCountExpr(exprs.head, exprs(1)),
      "scala_udf")
  }

  /** Merge-scan |A∩B| of two sorted string arrays (see
    * SortedIntersectCountExpr); sort each side once with `array_sort`.
    */
  def sortedIntersectCount(spark: SparkSession, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("sorted_intersect_count", a, b)
  }

  /** Column form (registers on first use in the session). */
  def cosine(spark: SparkSession, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("cosine_sim_native", a, b)
  }

  /** Column form of the copy-free dot product (see DotProductExpr). */
  def dot(spark: SparkSession, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("dot_native", a, b)
  }

  /** Column form of squared L2 distance. */
  def l2Sq(spark: SparkSession, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("l2_sq_native", a, b)
  }

  /** Column form of nearest-centroid argmin (see NearestCentroidExpr): the
    * centroid matrix is passed as a typedlit literal (foldable) so the
    * expression can lift it out of codegen as a reference object.
    */
  def nearestCentroid(spark: SparkSession, vec: org.apache.spark.sql.Column,
      centroids: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_centroid_native",
      exprs => NearestCentroidExpr(exprs.head, exprs(1)),
      "scala_udf")
    org.apache.spark.sql.functions.call_function("nearest_centroid_native",
      vec.cast("array<double>"),
      org.apache.spark.sql.functions.typedlit(centroids.map(_.toSeq)))
  }
}
