package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.9): string, math, timestamp/date,
  * regexp, JSON path over untyped JSON strings, and higher-order array
  * functions. Spark built-ins only (codegen'd, no UDFs) — the reference's
  * Python function library (`functions/string.py`, `math.py`, `timestamp.py`,
  * `json.py`) maps onto `org.apache.spark.sql.functions`.
  *
  * Cross-engine parity notes (vs the DuckDB oracle):
  *  - DuckDB length/instr/year/... return BIGINT → Spark side casts to long;
  *  - DuckDB ceil/floor on DOUBLE return DOUBLE → oracle casts to BIGINT;
  *  - DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday → oracle adds 1;
  *  - DuckDB regexp_replace needs the 'g' flag to replace all;
  *  - transcendental fns (exp/ln/log10/pow) may differ in the last ulp across
  *    libm implementations → rounded to 8 decimals.
  */
object Scalars {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q22_string_funcs",
      (s, dir) => {
        T(s, dir, "customer").select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"),
          length(col("c_name")).cast("long").as("len"),
          substring(col("c_name"), 10, 4).as("sub"),
          concat_ws("-", col("c_name"), col("c_mktsegment")).as("cat"),
          regexp_replace(col("c_name"), "Customer#", "C").as("rep"),
          lpad(col("c_custkey").cast("string"), 12, "0").as("pad"),
          rpad(col("c_mktsegment"), 12, ".").as("rpadded"),
          reverse(col("c_mktsegment")).as("rev"),
          col("c_name").contains("00").as("has00"),
          col("c_name").startsWith("Customer").as("sw"),
          col("c_mktsegment").endsWith("ING").as("ew"),
          instr(col("c_name"), "9").cast("long").as("pos9"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
          ltrim(concat(lit("xx"), col("c_mktsegment")), "x").as("ltrimmed"),
          element_at(split(col("c_name"), "#"), 2).as("after_hash"),
        ).orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |upper(c_name) AS up, lower(c_name) AS lo, length(c_name) AS len,
             |substr(c_name, 10, 4) AS sub,
             |concat_ws('-', c_name, c_mktsegment) AS cat,
             |replace(c_name, 'Customer#', 'C') AS rep,
             |lpad(c_custkey::VARCHAR, 12, '0') AS pad,
             |rpad(c_mktsegment, 12, '.') AS rpadded,
             |reverse(c_mktsegment) AS rev,
             |contains(c_name, '00') AS has00,
             |starts_with(c_name, 'Customer') AS sw,
             |ends_with(c_mktsegment, 'ING') AS ew,
             |instr(c_name, '9') AS pos9,
             |trim('  ' || c_mktsegment || '  ') AS trimmed,
             |ltrim('xx' || c_mktsegment, 'x') AS ltrimmed,
             |split_part(c_name, '#', 2) AS after_hash
             |FROM customer ORDER BY c_custkey""".stripMargin),
    ),
    QueryDef(
      "q23_math_funcs",
      (s, dir) => {
        T(s, dir, "orders").select(
          col("o_orderkey"),
          round(abs(col("o_totalprice") - 150000.0), 2).as("absdiff"),
          ceil(col("o_totalprice")).as("c"),
          floor(col("o_totalprice")).as("f"),
          round(col("o_totalprice") / 1000.0, 1).as("kprice"),
          round(sqrt(col("o_totalprice")), 6).as("sq"),
          round(pow(col("o_totalprice"), 2.0), 2).as("p2"),
          round(exp(col("o_totalprice") / 1000000.0), 8).as("ex"),
          round(log(col("o_totalprice")), 8).as("ln_"),
          round(log10(col("o_totalprice")), 8).as("l10"),
          (col("o_orderkey") % 7).as("mo"),
          col("o_orderkey").bitwiseAND(255).as("band"),
          col("o_orderkey").bitwiseOR(16).as("bor"),
          greatest(col("o_totalprice"), lit(150000.0)).as("gr"),
          least(col("o_totalprice"), lit(150000.0)).as("le"),
        ).orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |round(abs(o_totalprice - 150000.0), 2) AS absdiff,
             |ceil(o_totalprice)::BIGINT AS c,
             |floor(o_totalprice)::BIGINT AS f,
             |round(o_totalprice / 1000.0, 1) AS kprice,
             |round(sqrt(o_totalprice), 6) AS sq,
             |round(pow(o_totalprice, 2.0), 2) AS p2,
             |round(exp(o_totalprice / 1000000.0), 8) AS ex,
             |round(ln(o_totalprice), 8) AS ln_,
             |round(log10(o_totalprice), 8) AS l10,
             |o_orderkey % 7 AS mo,
             |o_orderkey & 255 AS band,
             |o_orderkey | 16 AS bor,
             |greatest(o_totalprice, 150000.0) AS gr,
             |least(o_totalprice, 150000.0) AS le
             |FROM orders ORDER BY o_orderkey""".stripMargin),
    ),
    QueryDef(
      "q24_datetime_funcs",
      (s, dir) => {
        T(s, dir, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("trunc_mon"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("datestr"),
          to_date(col("o_orderdate")).cast("string").as("dt"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
        ).orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |year(o_orderdate) AS yr, month(o_orderdate) AS mon,
             |dayofmonth(o_orderdate) AS dom,
             |dayofweek(o_orderdate) + 1 AS dow,
             |quarter(o_orderdate) AS qtr,
             |dayofyear(o_orderdate) AS doy,
             |date_trunc('month', o_orderdate) AS trunc_mon,
             |strftime(o_orderdate, '%Y-%m-%d') AS datestr,
             |(o_orderdate::DATE)::VARCHAR AS dt,
             |o_orderdate + INTERVAL 30 DAY AS plus30,
             |epoch(o_orderdate)::BIGINT AS epoch_s
             |FROM orders ORDER BY o_orderkey""".stripMargin),
    ),
    QueryDef(
      "q25_regexp_funcs",
      (s, dir) => {
        T(s, dir, "documents").select(
          col("doc_id"),
          regexp_extract(col("text"), "^([a-z]+)", 1).as("first_w"),
          regexp_replace(col("text"), "(value|table)", "X").as("masked"),
          col("text").rlike("spark").as("has_spark"),
          ((length(col("text")) - length(regexp_replace(col("text"), "the", ""))) / 3)
            .cast("long").as("n_the"),
          size(regexp_extract_all(col("text"), lit("(ro\\w+)"), lit(1))).cast("long").as("n_ro"),
        ).orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |regexp_extract(text, '^([a-z]+)', 1) AS first_w,
             |regexp_replace(text, '(value|table)', 'X', 'g') AS masked,
             |regexp_matches(text, 'spark') AS has_spark,
             |((length(text) - length(regexp_replace(text, 'the', '', 'g'))) / 3)::BIGINT AS n_the,
             |len(regexp_extract_all(text, '(ro\w+)', 1)) AS n_ro
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    QueryDef(
      "q26_json_path",
      (s, dir) => {
        // untyped JSON (reference JsonPath, `exprs/json_path.py:22-90`): the
        // props column is a JSON string; dynamic access via get_json_object.
        T(s, dir, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"),
          get_json_object(col("props"), "$.missing").isNull.as("no_missing"),
          get_json_object(col("props"), "$.k").isNotNull.as("has_k"),
        ).orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |json_extract_string(props, '$.k')::BIGINT AS k,
             |json_extract_string(props, '$.k')::BIGINT % 10 AS k_mod,
             |json_extract_string(props, '$.missing') IS NULL AS no_missing,
             |json_extract_string(props, '$.k') IS NOT NULL AS has_k
             |FROM events ORDER BY event_id""".stripMargin),
    ),
    QueryDef(
      "q27_array_hof",
      (s, dir) => {
        // higher-order array functions over the embedding column (reference
        // JsonMapper / json array reducers, `functions/json.py:171-262`).
        val e = col("embedding").cast("array<double>")
        T(s, dir, "embeddings").select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("n"),
          round(aggregate(e, lit(0.0), (acc, x) => acc + x), 4).as("s"),
          array_max(e).as("mx"),
          array_min(e).as("mn"),
          round(aggregate(slice(e, 1, 3), lit(0.0), (acc, x) => acc + x), 4).as("first3"),
          size(filter(e, x => x > 0.0)).cast("long").as("n_pos"),
          round(element_at(transform(e, x => x * 2.0), 1), 4).as("d1"),
        ).orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id,
             |len(embedding) AS n,
             |round(list_sum(embedding::DOUBLE[]), 4) AS s,
             |list_max(embedding::DOUBLE[]) AS mx,
             |list_min(embedding::DOUBLE[]) AS mn,
             |round(list_sum((embedding::DOUBLE[])[1:3]), 4) AS first3,
             |len(list_filter(embedding::DOUBLE[], x -> x > 0.0)) AS n_pos,
             |round(list_transform(embedding::DOUBLE[], x -> x * 2.0)[1], 4) AS d1
             |FROM embeddings ORDER BY vec_id""".stripMargin),
    ),
  )
}
