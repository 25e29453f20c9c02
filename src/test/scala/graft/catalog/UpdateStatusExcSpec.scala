package graft.catalog

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The reference `UpdateStatus.num_excs` / `cols_with_excs`
  * (`catalog/update_status.py`): DML ops report how many cells landed in
  * error state. graft's error-state conventions are a cellmd-style struct
  * with an `errortype` field (media metadata, capture structs) and a
  * `<col>_errormsg` string sidecar; counts come from parquet footer null
  * statistics on insert and ride the existing Observation on updates —
  * zero extra Spark jobs either way.
  */
class UpdateStatusExcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog() =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-exc").toString)

  // inv = 10/x captured try_*-style: value column + errormsg sidecar,
  // plus a cellmd-style struct column with errortype/errormsg fields
  private val cols = Seq(
    ColumnDef("id", "bigint"),
    ColumnDef("x", "double"),
    ColumnDef("inv", "double",
      computedExpr = Some("CASE WHEN x <> 0 THEN 10 / x END")),
    ColumnDef("inv_errormsg", "string",
      computedExpr = Some("CASE WHEN x = 0 THEN 'division by zero' END")),
    ColumnDef("md", "struct<errortype:string,errormsg:string>",
      computedExpr = Some(
        "named_struct('errortype', CASE WHEN x < 0 THEN 'ValueError' END, " +
          "'errormsg', CASE WHEN x < 0 THEN 'negative input' END)")),
  )

  test("insertStatus counts error cells from footer null stats") {
    val t = GraftTable.create(spark, freshCatalog(), "exc1", cols)
    val st = t.insertStatus(
      Seq((1L, 2.0), (2L, 0.0), (3L, -1.0), (4L, 0.0)).toDF("id", "x"))
    assert(st.numRows == 4)
    // two x=0 rows error on inv (sidecar), one x<0 row errors on md (struct)
    assert(st.numExcs == 3)
    assert(st.colsWithExcs.sorted == Seq("inv", "md"))
  }

  test("clean insert reports zero excs") {
    val t = GraftTable.create(spark, freshCatalog(), "exc2", cols)
    val st = t.insertStatus(Seq((1L, 2.0), (2L, 5.0)).toDF("id", "x"))
    assert(st.numExcs == 0L && st.colsWithExcs.isEmpty)
  }

  test("updateStatus counts only THIS op's error cells, not carried rows") {
    val t = GraftTable.create(spark, freshCatalog(), "exc3", cols)
    // seed one pre-existing error row (id=2, x=0) in the same file as id=1
    t.insert(Seq((1L, 2.0), (2L, 0.0)).toDF("id", "x"))
    // update id=1 to x=0: the rewrite carries id=2's old error row in the
    // same file, but num_excs must count only the freshly-updated cell
    val st = t.updateStatus(Map("x" -> "0.0"), "id = 1")
    assert(st.numRows == 1)
    assert(st.numExcs == 1)
    assert(st.colsWithExcs == Seq("inv"))
    // an update that clears the error reports zero
    val st2 = t.updateStatus(Map("x" -> "4.0"), "id = 1")
    assert(st2.numExcs == 0L && st2.colsWithExcs.isEmpty)
  }

  test("batchUpdateStatus carries exc counts through the keyed path") {
    val t = GraftTable.create(spark, freshCatalog(), "exc4", cols)
    t.insert(Seq((1L, 2.0), (2L, 3.0), (3L, 4.0)).toDF("id", "x"))
    val st = t.batchUpdateStatus(
      Seq((1L, -5.0), (2L, 0.0)).toDF("id", "x"), Seq("id"))
    assert(st.numRows == 2)
    // id=1 → md struct error (x<0); id=2 → inv sidecar error (x=0)
    assert(st.numExcs == 2)
    assert(st.colsWithExcs.sorted == Seq("inv", "md"))
  }
}
