package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** `QueryUtil.stageStreamFiles` contract (r15 ADVICE item 3): in-range
  * fileIdx values land one mtime-ordered file per slice; out-of-range or
  * null values must FAIL the staging instead of silently dropping rows
  * (the pre-r15 per-slice filters lost them the same way, wordlessly).
  */
class StageStreamFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("in-range indices stage one file per slice, empty slices included") {
    import spark.implicits._
    val df = Seq((0L, "a"), (1L, "b"), (3L, "d")).toDF("id", "v")
    val dir = QueryUtil.stageStreamFiles(df, col("id"), nFiles = 4,
      prefix = "ssf_ok", mtimeBase = 1_700_000_000_000L)
    val files = new java.io.File(dir.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.map(_.getName).toSeq ==
      Seq("b00.parquet", "b01.parquet", "b02.parquet", "b03.parquet"))
    // slice 2 is empty but still a readable schema-only file
    assert(spark.read.parquet(files(2).getPath).count() == 0)
    assert(spark.read.parquet(dir.toString).count() == 3)
  }

  test("an out-of-range index fails loudly instead of dropping rows") {
    import spark.implicits._
    val df = Seq((0L, "a"), (7L, "late")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      QueryUtil.stageStreamFiles(df, col("id"), nFiles = 2,
        prefix = "ssf_oob", mtimeBase = 1_700_000_000_000L)
    }
    assert(e.getMessage.contains("outside [0, 2)"))
  }
}
