package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's json family (`/root/reference/pixeltable/functions/
  * json.py:26-619`) over UNTYPED JSON string columns (the reference's Json
  * type is dynamic; SURVEY §7.4 hard part 3): scalar reducers operate on a
  * JSON array **within one row** (per-row, not across rows), mirroring
  * `json.sum/min/max/mean/count`.
  */
object Jsons {

  private def darr(js: Column): Column = from_json(js, ArrayType(DoubleType))

  def dumps(c: Column): Column = to_json(c)

  /** len over the JSON value's own type (reference semantics, pinned by
    * `tests/functions/test_json.py:95-135`): array → element count,
    * object → key count, string → character count, null → NULL; numbers
    * and booleans raise ("not defined for a JSON scalar"). Malformed
    * arrays/objects yield NULL — a state the reference's parsed Json type
    * cannot represent, so no behavior is pinned there.
    */
  def len(js: Column): Column = {
    val t = trim(js)
    when(js.isNull || t === "null", lit(null).cast("long"))
      .when(t.startsWith("["), json_array_length(js).cast("long"))
      .when(t.startsWith("{"), size(json_object_keys(js)).cast("long"))
      .when(t.startsWith("\""), length(get_json_object(js, "$")).cast("long"))
      .otherwise(raise_error(concat(
        lit("len() is not defined for a JSON scalar: "), js)).cast("long"))
  }

  /** is_empty (same reference test): null, [], {} and "" are empty;
    * numbers/booleans (and anything non-empty) are not. Always a required
    * bool — a malformed array/object (where the parse helpers yield NULL)
    * coalesces to false rather than propagating NULL.
    */
  def is_empty(js: Column): Column = {
    val t = trim(js)
    js.isNull || t === "null" ||
      coalesce(
        (t.startsWith("[") && json_array_length(js) === 0) ||
        (t.startsWith("{") && size(json_object_keys(js)) === 0) ||
        (t.startsWith("\"") && length(get_json_object(js, "$")) === 0),
        lit(false))
  }
  def contains(js: Column, path: String): Column =
    get_json_object(js, path).isNotNull
  def get(js: Column, path: String): Column = get_json_object(js, path)
  def sum(js: Column): Column =
    aggregate(darr(js), lit(0.0), (a, x) => a + x)
  def min(js: Column): Column = array_min(darr(js))
  def max(js: Column): Column = array_max(darr(js))
  def mean(js: Column): Column = sum(js) / size(darr(js))
  def count(js: Column): Column = size(darr(js)).cast("long")
  def keys(js: Column): Column = json_object_keys(js)
  def values(js: Column): Column =
    map_values(from_json(js, MapType(StringType, StringType)))
  def items(js: Column): Column =
    map_entries(from_json(js, MapType(StringType, StringType)))
  def flatten(js: Column): Column =
    to_json(org.apache.spark.sql.functions.flatten(
      from_json(js, ArrayType(ArrayType(StringType)))))
  def concat(a: Column, b: Column): Column =
    to_json(org.apache.spark.sql.functions.concat(
      from_json(a, ArrayType(StringType)), from_json(b, ArrayType(StringType))))
  def merge(a: Column, b: Column): Column =
    to_json(map_concat(
      from_json(a, MapType(StringType, StringType)),
      from_json(b, MapType(StringType, StringType))))
  /** make_list UDA: collect values into a JSON list (deterministic order). */
  def make_list(c: Column): Column = to_json(sort_array(collect_list(c)))

  /** The reference's global map/filter/sort HOFs over a JSON array column
    * (`functions/globals.py:267-420`; sort semantics pinned by
    * `tests/test_exprs.py:980` — keyless asc/desc plus a per-element key
    * expression). These typed forms cover the numeric-list case the
    * reference tests; the fully-untyped path composes `get` with raw
    * transform/filter HOFs (q27/q58).
    */
  def json_map(js: Column, f: Column => Column): Column =
    to_json(transform(darr(js), f))
  def json_filter(js: Column, p: Column => Column): Column =
    to_json(filter(darr(js), p))
  def json_sort(js: Column, asc: Boolean = true): Column =
    to_json(sort_array(darr(js), asc))
  def json_sort_by(js: Column, key: Column => Column,
      asc: Boolean = true): Column =
    to_json(array_sort(darr(js), (l, r) => {
      val cmp = when(key(l) < key(r), -1)
        .when(key(l) > key(r), 1).otherwise(0)
      if (asc) cmp else cmp * -1
    }))

  @transient private lazy val jm = new com.fasterxml.jackson.databind.ObjectMapper()

  /** list_iterator single-column form (reference `json.py:494`): one
    * element per row out of a JSON array — each element emitted as its own
    * JSON string for posexplode into a component view; downstream
    * `get`/`from_json` pulls the keys (the schema-on-read analog of the
    * reference's per-key output columns).
    */
  val list_iterator = udf { (js: String) =>
    if (js == null) null
    else {
      val n = jm.readTree(js)
      require(n.isArray, "list_iterator: input is not a JSON array")
      (0 until n.size()).map(i => n.get(i).toString)
    }
  }

  /** list_iterator keyword form (reference `json.py:494`): zip N JSON
    * arrays positionally into per-row objects keyed by `names`, with the
    * reference's length semantics — strict (error on mismatch), truncated
    * (stop at the shortest), padded (nulls for exhausted lists).
    */
  val list_iterator_zip = udf { (lists: Seq[String], names: Seq[String],
      mode: String) =>
    require(lists != null && names != null && lists.length == names.length,
      "list_iterator: one name per list")
    val arrs = lists.map { js =>
      val n = jm.readTree(js)
      require(n.isArray, "list_iterator: every input must be a JSON array")
      (0 until n.size()).map(n.get)
    }
    val lens = arrs.map(_.size)
    val count = mode match {
      case "strict" =>
        require(lens.distinct.size <= 1, s"length mismatch: $lens")
        lens.headOption.getOrElse(0)
      case "truncated" => if (lens.isEmpty) 0 else lens.min
      case "padded"    => if (lens.isEmpty) 0 else lens.max
      case m => throw new IllegalArgumentException(s"invalid mode: $m")
    }
    (0 until count).map { i =>
      val o = jm.createObjectNode()
      names.zip(arrs).foreach { case (k, a) =>
        if (i < a.size) o.set[com.fasterxml.jackson.databind.JsonNode](k, a(i))
        else o.putNull(k)
      }
      o.toString
    }
  }
}
