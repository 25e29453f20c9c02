package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Python-semantics checks for the reference function families — expected
  * values hand-computed from CPython behavior.
  */
class RefFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c.as("r")).head().getAs[T]("r")

  private def oneSeq(c: org.apache.spark.sql.Column): Seq[String] =
    Seq("x").toDF("dummy").select(c.as("r")).head()
      .getAs[scala.collection.Seq[String]]("r").toList

  test("string family python semantics") {
    assert(one[String](Strings.capitalize(lit("hELLO wOrld"))) == "Hello world")
    assert(one[Long](Strings.find(lit("hello"), "zz")) == -1L)
    assert(one[Long](Strings.find(lit("hello"), "l")) == 2L)
    assert(one[Long](Strings.rfind(lit("abcabc"), "abc")) == 3L)
    assert(one[Long](Strings.rfind(lit("abcabc"), "zz")) == -1L)
    assert(one[Long](Strings.count(lit("aaaa"), "aa")) == 2L) // non-overlapping
    // CPython pad split: odd fill char goes LEFT when width is odd
    assert(one[String](Strings.center(lit("ab"), 5, "*")) == "**ab*")
    assert(one[String](Strings.center(lit("abc"), 5, "*")) == "*abc*")
    assert(one[String](Strings.center(lit("ab"), 6, "*")) == "**ab**")
    assert(one[String](Strings.center(lit("abc"), 6, "*")) == "*abc**") // even width: extra goes right
    // fill == textwrap.fill (wrap + join '\n'), NOT zfill
    assert(one[String](Strings.fill(lit("aa bb cc dd"), 5)) == "aa bb\ncc dd")
    // pad maps side names exactly as the reference: left→ljust, right→rjust
    assert(one[String](Strings.pad(lit("ab"), 5, "left", ".")) == "ab...")
    assert(one[String](Strings.pad(lit("ab"), 5, "right", ".")) == "...ab")
    assert(one[String](Strings.pad(lit("ab"), 5, "both", ".")) == "..ab.")
    assertThrows[IllegalArgumentException](Strings.pad(lit("ab"), 5, "middle"))
    assert(one[String](Strings.swapcase(lit("AbC"))) == "aBc")
    assert(one[String](Strings.title(lit("x1y two"))) == "X1Y Two") // alpha-run semantics
    assert(one[Boolean](Strings.istitle(lit("Hello World"))))
    assert(!one[Boolean](Strings.istitle(lit("Hello world"))))
    assert(one[String](Strings.removeprefix(lit("testcase"), "test")) == "case")
    assert(one[String](Strings.removeprefix(lit("case"), "test")) == "case")
    assert(oneSeq(Strings.partition(lit("a=b=c"), "=")) == Seq("a", "=", "b=c"))
    assert(oneSeq(Strings.rpartition(lit("a=b=c"), "=")) == Seq("a=b", "=", "c"))
    assert(oneSeq(Strings.partition(lit("abc"), "=")) == Seq("abc", "", ""))
    assert(one[String](Strings.slice(lit("hello"), 1, 3)) == "el") // s[1:3]
    assert(one[String](Strings.slice_replace(lit("hello"), 1, 3, "XY")) == "hXYlo")
    assert(one[String](Strings.zfill(lit("-42"), 6)) == "-00042")
    assert(oneSeq(Strings.wrap(lit("aa bb cc dd"), 5)) == Seq("aa bb", "cc dd"))
    assert(one[Boolean](Strings.isidentifier(lit("_x1"))))
    assert(!one[Boolean](Strings.isidentifier(lit("1x"))))
    assert(one[Boolean](Strings.fullmatch(lit("abc"), "a.c")))
    assert(!one[Boolean](Strings.fullmatch(lit("abcd"), "a.c")))
    assert(one[Boolean](Strings.`match`(lit("abcd"), "a.c")))   // prefix match
    assert(one[Boolean](Strings.isspace(lit("  \t"))))
    assert(!one[Boolean](Strings.isspace(lit(" x "))))
    assert(oneSeq(Strings.splitlines(lit("a\nb\r\nc"))) == Seq("a", "b", "c"))
    assert(one[String](Strings.join(",", Strings.split(lit("a|b|c"), "|"))) == "a,b,c")
    assert(one[String](Strings.ljust(lit("ab"), 5, ".")) == "ab...")
    assert(one[String](Strings.rjust(lit("ab"), 5, ".")) == "...ab")
    assert(one[String](Strings.ljust(lit("abcdef"), 3)) == "abcdef") // never truncates
    assert(one[Boolean](Strings.islower(lit("abc1"))))
    assert(!one[Boolean](Strings.islower(lit("Abc"))))
    assert(one[Boolean](Strings.isupper(lit("ABC1"))))
    assert(one[String](Strings.casefold(lit("AbC"))) == "abc")
  }

  test("timestamp family") {
    val ts = lit("2024-07-01 10:20:30.123456").cast("timestamp")
    assert(one[Long](Timestamps.weekday(ts)) == 0L)      // Monday = 0
    assert(one[Long](Timestamps.isoweekday(ts)) == 1L)   // Monday = 1
    assert(one[Long](Timestamps.microsecond(ts)) == 123456L)
    assert(one[Long](Timestamps.toordinal(lit("0001-01-01").cast("timestamp"))) == 1L)
    assert(one[String](Timestamps.isoformat(ts)) == "2024-07-01T10:20:30")
    assert(one[Double](Timestamps.posix_timestamp(
      lit("1970-01-01 00:00:01.5").cast("timestamp"))) == 1.5)
  }

  test("json family per-row reducers") {
    val arr = lit("""[1.0, 2.0, 3.0]""")
    assert(one[Double](Jsons.sum(arr)) == 6.0)
    assert(one[Double](Jsons.mean(arr)) == 2.0)
    assert(one[Long](Jsons.count(arr)) == 3L)
    assert(one[Long](Jsons.len(arr)) == 3L)
    val obj = lit("""{"a": "1", "b": "2"}""")
    assert(oneSeq(Jsons.keys(obj)) == Seq("a", "b"))
    assert(oneSeq(Jsons.values(obj)) == Seq("1", "2"))
    assert(one[String](Jsons.merge(lit("""{"a":"1"}"""), lit("""{"b":"2"}"""))) ==
      """{"a":"1","b":"2"}""")
    assert(one[String](Jsons.get(obj, "$.b")) == "2")
  }

  test("json len/is_empty: the reference's own test fixture (test_json.py:95-135)") {
    // {[1,2,3]:3, []:0, {a,b}:2, {}:0, "hello":5, "":0, null:NULL}
    val cases = Seq(
      ("""[1, 2, 3]""", Some(3L), false),
      ("""[]""", Some(0L), true),
      ("""{"a": 1, "b": 2}""", Some(2L), false),
      ("""{}""", Some(0L), true),
      ("\"hello\"", Some(5L), false),
      ("\"\"", Some(0L), true),
      (null, None, true),
    )
    cases.foreach { case (js, wantLen, wantEmpty) =>
      val c = lit(js).cast("string")
      val got = Seq(1).toDF("one")
        .select(Jsons.len(c).as("n"), Jsons.is_empty(c).as("e")).head()
      assert((if (got.isNullAt(0)) None else Some(got.getLong(0))) == wantLen,
        s"len($js)")
      assert(got.getBoolean(1) == wantEmpty, s"is_empty($js)")
    }
    // numbers are not empty; len() of a scalar raises cleanly
    assert(!Seq(1).toDF("one").select(Jsons.is_empty(lit("5"))).head().getBoolean(0))
    assertThrows[Exception] {
      Seq(1).toDF("one").select(Jsons.len(lit("5"))).collect()
    }
  }

  test("json map/filter/sort HOFs (globals.py; sort pins from test_exprs.py:980)") {
    val arr = lit("[3.0,1.0,2.0]")
    assert(one[String](Jsons.json_sort(arr)) == "[1.0,2.0,3.0]")
    assert(one[String](Jsons.json_sort(arr, asc = false)) == "[3.0,2.0,1.0]")
    // keyed sort: key = -x reverses, exactly sorted(key=lambda x: -x)
    assert(one[String](Jsons.json_sort_by(arr, x => -x)) == "[3.0,2.0,1.0]")
    assert(one[String](Jsons.json_sort_by(arr, x => -x, asc = false)) ==
      "[1.0,2.0,3.0]")
    assert(one[String](Jsons.json_map(arr, x => x * 2)) == "[6.0,2.0,4.0]")
    assert(one[String](Jsons.json_filter(arr, x => x > 1.5)) == "[3.0,2.0]")
  }

  test("json list_iterator: element rows, zipped kwargs with strict/truncated/padded") {
    val objs = lit("""[{"a":1,"b":"x"},{"a":2,"b":"y"}]""")
    assert(oneSeq(Jsons.list_iterator(objs)) ==
      Seq("""{"a":1,"b":"x"}""", """{"a":2,"b":"y"}"""))
    val names = org.apache.spark.sql.functions.array(lit("u"), lit("v"))
    def zipped(a: String, b: String, mode: String): Seq[String] =
      oneSeq(Jsons.list_iterator_zip(
        org.apache.spark.sql.functions.array(lit(a), lit(b)), names, lit(mode)))
    assert(zipped("[1,2]", """["p","q"]""", "strict") ==
      Seq("""{"u":1,"v":"p"}""", """{"u":2,"v":"q"}"""))
    assert(zipped("[1,2,3]", """["p"]""", "truncated") ==
      Seq("""{"u":1,"v":"p"}"""))
    assert(zipped("[1,2]", """["p"]""", "padded") ==
      Seq("""{"u":1,"v":"p"}""", """{"u":2,"v":null}"""))
    // strict rejects mismatched lengths — per-row failure, surfaced as a throw
    assertThrows[Exception] { zipped("[1,2]", "[1]", "strict") }
  }

  test("shingles guard on short text") {
    assert(oneSeq(TextFunctions.shingles(lit("abcd"), 3)) == Seq("abc", "bcd"))
    assert(oneSeq(TextFunctions.shingles(lit("ab"), 3)) == Seq.empty)
    assert(oneSeq(TextFunctions.shingles(lit(""), 3)) == Seq.empty)
  }

  test("math family") {
    assert(one[Long](Maths.bitwise_xor(lit(6L), lit(3L))) == 5L)
    assert(one[Long](Maths.to_int(lit(3.9))) == 3L)
    // CPython builtins.round pins (reference math.round,
    // tests/functions/test_math.py): half-even over the TRUE binary value
    assert(one[Double](Maths.round(lit(2.345), 2)) == 2.35)  // binary is 2.345…000195 → up
    assert(one[Double](Maths.round(lit(2.675), 2)) == 2.67)  // binary is 2.674999… → down
    assert(one[Double](Maths.round(lit(0.125), 2)) == 0.12)  // exact tie → even
    assert(one[Double](Maths.round(lit(2.5))) == 2.0)        // no-digits tie → even
    // ceil/floor keep float semantics; infinities pass through
    assert(one[Double](Maths.ceil(lit(2.1))) == 3.0)
    assert(one[Double](Maths.floor(lit(-2.1))) == -3.0)
    assert(one[Double](Maths.ceil(lit(Double.PositiveInfinity))).isPosInfinity)
    assert(one[Double](Maths.floor(lit(Double.NegativeInfinity))).isNegInfinity)
  }
}
