package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Function-catalog introspection (reference `pxt.list_functions`,
  * `globals.py:1049`): every public Column-returning builder in the scalar
  * families, enumerated by reflection so the listing can never drift from
  * the code. Returns (family, name, arity) rows.
  */
object FunctionsCatalog {

  private def families: Seq[(String, AnyRef)] = Seq(
    "strings" -> Strings,
    "maths" -> Maths,
    "timestamps" -> Timestamps,
    "jsons" -> Jsons,
    "images" -> Images,
    "video" -> Video,
    "audio" -> Audio,
    "vision" -> Vision,
    "scene" -> SceneDetect,
    "text" -> TextFunctions,
    "html" -> Html,
    "vector" -> VectorFunctions,
    "ranking" -> Ranking,
    "net" -> Net,
    "udfs" -> Udfs,
  )

  /** (family, name, arity) for every public builder returning a Column.
    * Overloads collapse to their minimum arity; synthetic/accessor methods
    * are excluded.
    */
  def functions: Seq[(String, String, Int)] =
    families.flatMap { case (fam, obj) =>
      obj.getClass.getMethods.toSeq
        .filter(m => m.getReturnType == classOf[Column] ||
          // scalar UDF members (media/scene kernels are surfaced as
          // UserDefinedFunction vals rather than Column builders)
          m.getReturnType ==
            classOf[org.apache.spark.sql.expressions.UserDefinedFunction])
        .filterNot(m => m.isSynthetic || m.getName.contains("$"))
        .groupBy(_.getName)
        .map { case (n, ms) => (fam, n, ms.map(_.getParameterCount).min) }
    }.sortBy(t => (t._1, t._2))

  /** The listing as a DataFrame (the reference renders a pandas Styler). */
  def listFunctions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    functions.toDF("family", "name", "arity")
  }
}
