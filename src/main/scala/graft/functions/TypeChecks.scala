package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structural value validation — the reference's constrained column types
  * (`/root/reference/pixeltable/type_system.py`): `Json[TypeSchema]`
  * (:1007-1115), `Array[shape, dtype]` (:1466-1624) and
  * `Image[(w, h), mode]` size/mode constraints. Each validator yields a
  * STRING Column: null = valid, otherwise the violation message — so a
  * check composes into inserts (fail on first violation) or into per-cell
  * error columns (`on_error='ignore'`), same as the reference's two modes.
  */
object TypeChecks {

  // ---------- Json[TypeSchema] ----------

  /** type schema for JSON values: the reference's TypeSchema shapes —
    * fixed-field objects (extra keys allowed, like TypedDict total=False
    * for the unspecified remainder), variadic arrays, fixed tuples,
    * scalars, and Any.
    */
  sealed trait JSpec
  object JSpec {
    case object JAny extends JSpec
    case object JStr extends JSpec
    case object JNum extends JSpec
    case object JBool extends JSpec
    /** variadic array `[T]` */
    final case class JArr(elem: JSpec) extends JSpec
    /** fixed tuple `(T1, T2, …)` */
    final case class JTuple(elems: Seq[JSpec]) extends JSpec
    /** object with required typed fields; extra keys allowed */
    final case class JObj(fields: Seq[(String, JSpec)]) extends JSpec
  }

  private def validateNode(node: JsonNode, spec: JSpec, path: String): String = {
    import JSpec._
    spec match {
      case JAny => null
      case JStr =>
        if (node.isTextual) null else s"$path: expected string, got ${node.getNodeType}"
      case JNum =>
        if (node.isNumber) null else s"$path: expected number, got ${node.getNodeType}"
      case JBool =>
        if (node.isBoolean) null else s"$path: expected bool, got ${node.getNodeType}"
      case JArr(elem) =>
        if (!node.isArray) s"$path: expected array, got ${node.getNodeType}"
        else {
          var i = 0
          while (i < node.size()) {
            val e = validateNode(node.get(i), elem, s"$path[$i]")
            if (e != null) return e
            i += 1
          }
          null
        }
      case JTuple(elems) =>
        if (!node.isArray) s"$path: expected array, got ${node.getNodeType}"
        else if (node.size() != elems.length)
          s"$path: expected ${elems.length} elements, got ${node.size()}"
        else {
          elems.zipWithIndex.foreach { case (sp, i) =>
            val e = validateNode(node.get(i), sp, s"$path[$i]")
            if (e != null) return e
          }
          null
        }
      case JObj(fields) =>
        if (!node.isObject) s"$path: expected object, got ${node.getNodeType}"
        else {
          fields.foreach { case (name, sp) =>
            val child = node.get(name)
            if (child == null) return s"$path: missing required field '$name'"
            val e = validateNode(child, sp, s"$path.$name")
            if (e != null) return e
          }
          null
        }
    }
  }

  /** Json[TypeSchema] check over a JSON string column: null if the value
    * parses AND conforms, else the first violation (path + reason).
    */
  def jsonCheck(jsonCol: Column, spec: JSpec): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else
        try validateNode(new ObjectMapper().readTree(s), spec, "$")
        catch { case e: Exception => s"$$: not valid JSON (${e.getMessage})" }
    }
    f(jsonCol)
  }

  // ---------- Array[shape] ----------

  /** Array shape check for nested array columns: one (dim) entry per rank,
    * None = wildcard (the reference's `None` dims). Codegen'd Column
    * composition — no UDF.
    */
  def arrayShapeCheck(arrCol: Column, shape: Seq[Option[Int]]): Column = {
    def rank(c: Column, dims: Seq[Option[Int]], depth: Int): Column = dims match {
      case Nil => lit(null).cast("string")
      case d +: rest =>
        val sizeErr = d match {
          case Some(n) => when(size(c) =!= n,
            concat(lit(s"dim $depth: expected $n, got "), size(c).cast("string")))
          case None => lit(null).cast("string")
        }
        val deeperErr =
          if (rest.isEmpty) lit(null).cast("string")
          else array_max(transform(c, x => rank(x, rest, depth + 1)))
        coalesce(sizeErr, deeperErr)
    }
    when(arrCol.isNull, lit(null).cast("string"))
      .otherwise(rank(arrCol, shape, 0))
  }

  // ---------- Image[(w, h), mode] ----------

  /** Image constraint check over a binary column: decodes the header and
    * compares (width, height) and/or mode; decode failure is itself a
    * violation. None = unconstrained.
    */
  def imageCheck(imgCol: Column, size: Option[(Int, Int)], mode: Option[String]): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else
        try {
          val img = Images.decode(bytes)
          val m = Images.mode(img)
          if (size.exists { case (w, h) => img.getWidth != w || img.getHeight != h })
            s"expected size ${size.get._1}x${size.get._2}, got ${img.getWidth}x${img.getHeight}"
          else if (mode.exists(_ != m)) s"expected mode ${mode.get}, got $m"
          else null
        } catch { case e: Exception => s"not a decodable image: ${e.getMessage}" }
    }
    f(imgCol)
  }

  // ---------- enforcement modes ----------

  /** Fail fast on the first violating row (the reference's validating
    * insert): throws with the row's message. Runs as ONE distributed scan
    * with limit 1 — no full materialization.
    */
  def enforce(df: DataFrame, checks: Map[String, Column]): DataFrame = {
    val errs = checks.map { case (name, c) =>
      when(c.isNotNull, concat(lit(s"$name: "), c))
    }.toSeq
    val firstErr = coalesce(errs: _*)
    val bad = df.withColumn("_violation", firstErr)
      .filter(col("_violation").isNotNull)
      .select("_violation").limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(s"validation failed: ${bad.head.getString(0)}")
    df
  }

  /** Per-cell capture (`on_error='ignore'`): append `<name>_errormsg`
    * columns, rows always pass through.
    */
  def flag(df: DataFrame, checks: Map[String, Column]): DataFrame =
    checks.foldLeft(df) { case (d, (name, c)) => d.withColumn(s"${name}_errormsg", c) }

  // ---------- rank-n array slicing ----------

  /** Multi-dimensional ArraySlice (reference `exprs/array_slice.py`,
    * `arr[a:b, c:d, …]`): one (start, stop) per rank, Python half-open
    * semantics, None = open end. Pure Column composition (slice/transform),
    * codegen'd at every rank.
    */
  def sliceNd(arrCol: Column, dims: Seq[(Option[Int], Option[Int])]): Column =
    dims match {
      case Nil => arrCol
      case (s0, e0) +: rest =>
        val start = s0.getOrElse(0)
        val len = e0 match {
          case Some(e) => least(lit(math.max(e - start, 0)),
            greatest(size(arrCol) - start, lit(0)))
          case None => greatest(size(arrCol) - start, lit(0))
        }
        val head = slice(arrCol, lit(start + 1), len)
        if (rest.isEmpty) head else transform(head, x => sliceNd(x, rest))
    }
}
