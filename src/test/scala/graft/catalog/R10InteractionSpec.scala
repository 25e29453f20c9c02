package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit, round 10 (VERDICT r9 item 8): the r9 features crossed
  * with the catalog surfaces they compose with — clustered compaction
  * between the inserts an incremental view syncs over, and the budgeted
  * media FileCache evicting mid component-view backfill.
  */
class R10InteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-r10x").toString)

  test("clustered compaction between inserts: view sync stays incremental; time travel unaffected") {
    val cat = newCat()
    val base = GraftTable.create(spark, cat, "cdocs", Seq(
      ColumnDef("id", "bigint"), ColumnDef("text", "string")))
    val vBatch1 = base.insert(
      Seq((1L, "a b"), (2L, "x y z")).toDF("id", "text"))
    val view = Views.createComponentView(spark, cat, "ctokens", base,
      "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
    assert(view.read().count() == 5)

    // compact WITH clustering between the view's syncs: physical rewrite,
    // but rows keep _v_min/_v_max — the next sync must see nothing new
    base.compact(targetFiles = 1, clusterBy = Seq("id"))
    val stNoop = Views.syncComponentViewStatus(view, base,
      "split(text, '\\\\s+')", "token", Seq("id"))
    assert(stNoop.rowsDeleted == 0 && stNoop.rowsInserted == 0,
      s"compaction alone must not re-expand: $stNoop")
    assert(view.read().count() == 5)

    // an insert after the compact syncs incrementally (only the new row)
    base.insert(Seq((3L, "p q")).toDF("id", "text"))
    val stIns = Views.syncComponentViewStatus(view, base,
      "split(text, '\\\\s+')", "token", Seq("id"))
    assert(stIns.rowsDeleted == 0 && stIns.rowsInserted == 2, s"$stIns")
    assert(view.read().count() == 7)

    // time travel across the compaction boundary still reads batch 1
    assert(base.read(Some(vBatch1)).count() == 2)

    // delete + compact BEFORE the sync: the closed rows (copied into the
    // compacted files with their _v_max) must still cascade into the view
    base.delete("id = 1")
    base.compact(targetFiles = 1, clusterBy = Seq("id"))
    val stDel = Views.syncComponentViewStatus(view, base,
      "split(text, '\\\\s+')", "token", Seq("id"))
    assert(stDel.rowsDeleted == 2 && stDel.rowsInserted == 0, s"$stDel")
    assert(view.read().select("id").distinct().as[Long].collect().toSet
      == Set(2L, 3L))

    // the same cross on a materialized (predicate) view
    val mv = Views.createMaterializedView(spark, cat, "clong", base,
      Some("length(text) >= 3"), Seq(("id", "id"), ("text", "text")))
    assert(mv.read().count() == 2) // "x y z", "p q" — id=1 already deleted
    base.compact(targetFiles = 1, clusterBy = Seq("id"))
    val mvNoop = Views.syncMaterializedViewStatus(mv, base,
      Some("length(text) >= 3"), Seq(("id", "id"), ("text", "text")))
    assert(mvNoop.rowsDeleted == 0 && mvNoop.rowsInserted == 0, s"$mvNoop")
    assert(mv.read().count() == 2)
  }

  /** serve `files` (name -> bytes) over 127.0.0.1; returns (baseUrl, stop) */
  private def serve(files: Map[String, Array[Byte]]): (String, () => Unit) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val name = ex.getRequestURI.getPath.stripPrefix("/")
      files.get(name) match {
        case Some(bytes) =>
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}/", () => server.stop(0))
  }

  test("FileCache eviction mid component-view backfill: re-fetch is correct, exactly one warning") {
    import graft.multimodal.FileCache
    def payload(k: String) = // 4096 bytes: two pinned tokens + padding
      (s"tok${k}1,tok${k}2," + "x" * (4096 - s"tok${k}1,tok${k}2,".length))
        .getBytes("UTF-8")
    val files = Map("a.txt" -> payload("a"), "b.txt" -> payload("b"))
    val (baseUrl, stop) = serve(files)
    val cacheDir = java.nio.file.Files.createTempDirectory("graft-r10fc").toString
    try {
      val fc = FileCache.forDir(cacheDir)
      fc.setCapacity(5000) // exactly one 4096-byte file fits
      fc.setLeaseSeconds(0)
      // the media-consuming iterator: fetch through the budgeted cache
      // (the withLocalPath executor path over the public FileCache API),
      // then read the CACHED file — a re-fetch after eviction must still
      // produce the right bytes
      spark.udf.register("fetch_text_r10", (uri: String) => {
        val c = FileCache.forDir(cacheDir)
        val p = c.lookup(uri).getOrElse {
          val tmp = java.nio.file.Files.createTempFile(
            c.dir, ".fetch", ".txt.part")
          val in = new java.net.URI(uri).toURL.openStream()
          try java.nio.file.Files.copy(in, tmp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          c.add(FileCache.AnonTableId, 0, uri, tmp)
        }
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      })
      val cat = newCat()
      val base = GraftTable.create(spark, cat, "media10", Seq(
        ColumnDef("id", "bigint"), ColumnDef("uri", "string")))
      val view = Views.createComponentView(spark, cat, "mediatoks", base,
        "slice(split(fetch_text_r10(uri), ','), 1, 2)", "tok", "string",
        Seq(ColumnDef("id", "bigint")))
      // ONE task in a fixed row order (coalesce(1)) so the backfill's fetch
      // sequence is a→b→a: b evicts a, the second a is a working-set
      // re-download mid-backfill
      base.insert(Seq(
        (1L, baseUrl + "a.txt"), (2L, baseUrl + "b.txt"),
        (3L, baseUrl + "a.txt")).toDF("id", "uri").coalesce(1))
      val st = Views.syncComponentViewStatus(view, base,
        "slice(split(fetch_text_r10(uri), ','), 1, 2)", "tok", Seq("id"))
      assert(st.rowsInserted == 6)
      // correctness through the eviction: every expansion has the right
      // tokens, including row 3's re-fetched copy of a.txt
      val got = view.read().orderBy("id", Views.Pos)
        .select("id", "tok").as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "toka1"), (1L, "toka2"), (2L, "tokb1"),
        (2L, "tokb2"), (3L, "toka1"), (3L, "toka2")))
      // the sync's own status carries the working-set warning…
      assert(st.cacheWarnings.exists(_.contains("downloaded multiple times")),
        s"expected a working-set warning on the sync status, got $st")
      // …exactly once: the next op drains nothing new
      val st2 = view.insertStatus(
        Seq((99L, 0, "z", 9L)).toDF("_base_rowid", "_pos", "tok", "id")
          .select(col("_base_rowid"), col("_pos"), col("tok"), col("id")))
      assert(!st2.cacheWarnings.exists(_.contains("downloaded multiple times")))
    } finally stop()
  }
}
