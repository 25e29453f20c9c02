package graft.catalog

import graft.TestSpark
import graft.functions.Office
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit: office documents (round-10 `Office` conversion) as
  * COMPONENT-VIEW iterators — the reference's document_splitter-over-
  * docx shape (`create_view(chunks, tbl, iterator=document_splitter(...))`
  * where the docx converts to markdown first). Pins: heading chunks of a
  * binary docx column land as a versioned view, later inserts expand
  * incrementally, base deletes cascade, and compaction of the base
  * between syncs stays invisible.
  */
class OfficeViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val chunkType = "struct<text:string,title:string," +
    "heading:map<string,string>,sourceline:int>"
  private val iterExpr = "md_chunks(office_md(doc))"

  private def docx(id: Long, parts: Int): Array[Byte] =
    Office.writeDocx(
      (1, s"Doc $id") +: (0 until parts).flatMap(j =>
        Seq((2, s"Part $j"), (0, s"body $id $j"))))

  test("office heading chunks drive an incrementally-maintained component view") {
    spark.udf.register("office_md", Office.documentText)
    spark.udf.register("md_chunks", graft.functions.Iterators.headingChunks)
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-odoc").toString)
    val base = GraftTable.create(spark, cat, "odocs", Seq(
      ColumnDef("doc_id", "bigint"), ColumnDef("doc", "binary")))
    base.insert(Seq((1L, docx(1, 2)), (2L, docx(2, 1)))
      .toDF("doc_id", "doc"))
    val view = Views.createComponentView(spark, cat, "odoc_chunks", base,
      iterExpr, "chunk", chunkType,
      keepCols = Seq(ColumnDef("doc_id", "bigint")))
    assert(view.read().count() == 3) // chunks = parts per doc (no intro text)
    val texts = view.read()
      .select(col("doc_id"), col("chunk.text"), col("chunk.title"))
      .orderBy("doc_id", "_pos").collect()
    assert(texts.map(_.getString(2)).toSeq == Seq("Doc 1", "Doc 1", "Doc 2"))
    assert(texts.map(_.getString(1)).toSeq ==
      Seq("body 1 0", "body 1 1", "body 2 0"))

    // incremental expansion of a later insert
    base.insert(Seq((3L, docx(3, 3))).toDF("doc_id", "doc"))
    val st = Views.syncComponentViewStatus(view, base, iterExpr, "chunk",
      Seq("doc_id"))
    assert(st.rowsInserted == 3 && st.rowsDeleted == 0, s"$st")

    // compaction between syncs is invisible to the view
    base.compact(targetFiles = 1, clusterBy = Seq("doc_id"))
    val stNoop = Views.syncComponentViewStatus(view, base, iterExpr, "chunk",
      Seq("doc_id"))
    assert(stNoop.rowsInserted == 0 && stNoop.rowsDeleted == 0, s"$stNoop")

    // base delete cascades
    base.delete("doc_id = 1")
    val stDel = Views.syncComponentViewStatus(view, base, iterExpr, "chunk",
      Seq("doc_id"))
    assert(stDel.rowsDeleted == 2 && stDel.rowsInserted == 0, s"$stDel")
    assert(view.read().select("doc_id").distinct().as[Long].collect().toSet
      == Set(2L, 3L))
  }
}
