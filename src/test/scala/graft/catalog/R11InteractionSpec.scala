package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit, round 11 (VERDICT r10 item 7): change data feed ×
  * DML-maintained index catch-up, and the office-document pipeline ×
  * FileCache eviction mid computed-column backfill.
  *
  * The first two tests are a DIFFERENTIAL between the two change-capture
  * mechanisms the engine ships: `maintainIndexes` derives the rows to
  * index from the version log's file diff (`_v_min > indexedThrough`
  * inside files added since), while `changeFeed` derives row-level events
  * from MVCC column pairing. They must agree: the signatures/codes the
  * index appended over a DML window must be EXACTLY the signatures/codes
  * of the feed's `insert` + `update_postimage` events over that window —
  * if either mechanism over- or under-reports minted row versions, the
  * sets diverge.
  */
class R11InteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-r11x").toString)

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

  // distinct per-(id,salt) texts so signature rows never collide across ids
  private def body(id: Long, salt: String): String =
    s"${"abcd".charAt((id % 4).toInt).toString * 6} $salt doc$id " +
      s"${"wxyz".charAt((id % 4).toInt).toString * 6} tail$id"

  test("minhash catch-up == signatures of changeFeed insert+update_postimage events") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "cfmh", Seq(
      ColumnDef("id", "bigint"), ColumnDef("body", "string")))
    t.insert((0L until 6L).map(i => (i, body(i, "v1"))).toDF("id", "body"))
    t.createMinhashIndex("nd", "body", "id", segmentThreshold = 100)
    val ix0 = t.meta.indexes.head
    val v0 = ix0.indexedThrough
    // MULTISET of signature rows: an updated row's new signature can equal
    // its old one (few shingles change), so a set-diff would hide a missed
    // append — counts catch it
    def sigBag(): Map[(Long, Int, String), Int] =
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"${ix0.path}/sigs")
        .select(col("_id"), col("_b"), col("_h"))
        .as[(Long, Int, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
    val before = sigBag()

    // DML window: insert, keyed update (rewrites two rows), predicate
    // update, delete, insert — maintenance runs after every row-minting
    // commit (deletes mint no row versions: COW keeps _v_min, so they
    // leave indexedThrough behind by design and the next pass advances it)
    t.insert(Seq((10L, body(10, "v1")), (11L, body(11, "v1")))
      .toDF("id", "body"))
    t.batchUpdate(Seq((1L, body(1, "v2")), (10L, body(10, "v2")))
      .toDF("id", "body"), Seq("id"))
    t.update(Map("body" -> s"'${body(2, "v3")}'"), "id = 2")
    t.delete("id = 3")
    t.insert(Seq((12L, body(12, "v1"))).toDF("id", "body"))

    val ixN = t.meta.indexes.head
    assert(ixN.indexedThrough == t.meta.currentVersion,
      s"maintenance must be caught up: $ixN vs ${t.meta.currentVersion}")
    assert(ixN.path == ix0.path, "threshold rebuild must not trigger here")
    val after = sigBag()

    // the SAME rows, derived from the change feed instead of the file diff
    val minted = t.changeFeed(v0)
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col("id"), col("body")).filter(col("body").isNotNull)
    val expected = graft.operators.Dedup.bandSignatures(
        minted, "body", "id", ixN.m, ixN.shards, ixN.efConstruction)
      .select(col("_id"), col("_b"), col("_h"))
      .as[(Long, Int, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val sum = (before.keySet ++ expected.keySet).map(k =>
      k -> (before.getOrElse(k, 0) + expected.getOrElse(k, 0))).toMap
    assert(after == sum,
      s"file-diff catch-up and changeFeed disagree: " +
        s"extra=${after.toSet -- sum.toSet} missing=${sum.toSet -- after.toSet}")
    assert(expected.nonEmpty && expected.keySet.exists(_._1 == 10L))
    // the deleted id minted nothing in the window (its rows predate v0)
    assert(!expected.keySet.exists(_._1 == 3L))
  }

  test("ivfpq catch-up == encodings of changeFeed insert+update_postimage events") {
    val cat = newCat()
    def vec(id: Long, bump: Double): Seq[Double] = {
      val c = if (id % 2 == 0) 0.0 else 10.0
      Seq(c + (id % 3) * 0.1 + bump, c - (id % 3) * 0.2, c + 0.3, c - 0.4)
    }
    val t = GraftTable.create(spark, cat, "cfpq", Seq(
      ColumnDef("id", "bigint"), ColumnDef("vec", "array<double>")))
    t.insert((0L until 12L).map(i => (i, vec(i, 0.0))).toDF("id", "vec"))
    t.createIvfPqIndex("pq", "vec", "id", cells = 2, pqM = 2, pqKs = 4,
      segmentThreshold = 100)
    val ix0 = t.meta.indexes.head
    val v0 = ix0.indexedThrough
    def codeBag(): Map[(Long, Int, Seq[Byte]), Int] =
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"${ix0.path}/codes")
        .select(col("id"), col("cell"), col("code"))
        .as[(Long, Int, Array[Byte])].collect()
        .map { case (i, c, b) => (i, c, b.toSeq) }
        .groupBy(identity).view.mapValues(_.length).toMap
    val before = codeBag()

    t.insert(Seq((20L, vec(20, 0.05)), (21L, vec(21, 0.05))).toDF("id", "vec"))
    t.batchUpdate(Seq((1L, vec(1, 0.5))).toDF("id", "vec"), Seq("id"))
    t.delete("id = 0") // mints no row versions; next insert re-advances
    t.insert(Seq((22L, vec(22, 0.05))).toDF("id", "vec"))

    val ixN = t.meta.indexes.head
    assert(ixN.indexedThrough == t.meta.currentVersion && ixN.path == ix0.path)
    val after = codeBag()

    val minted = t.changeFeed(v0)
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col("id"), col("vec")).filter(col("vec").isNotNull)
    val model = graft.operators.Pq.loadModel(spark, s"${ixN.path}/model")
    val expected = graft.operators.Pq.encode(minted, "vec", "id", model)
      .as[(Long, Int, Array[Byte])].collect()
      .map { case (i, c, b) => (i, c, b.toSeq) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val sum = (before.keySet ++ expected.keySet).map(k =>
      k -> (before.getOrElse(k, 0) + expected.getOrElse(k, 0))).toMap
    assert(after == sum,
      s"extra=${after.toSet -- sum.toSet} missing=${sum.toSet -- after.toSet}")
    assert(expected.keySet.map(_._1) == Set(20L, 21L, 22L, 1L))
  }

  test("office pipeline: FileCache eviction mid computed-column backfill stays correct and warns") {
    import graft.multimodal.FileCache
    // docx payloads padded with incompressible text so each zip is bigger
    // than half the cache capacity (one fits, two don't)
    val rnd = new scala.util.Random(11)
    def pad() = Seq.fill(6000)(('a' + rnd.nextInt(26)).toChar).mkString
    val docA = graft.functions.Office.writeDocx(Seq(
      1 -> "Alpha Report", 0 -> s"alpha body ${pad()}"))
    val docB = graft.functions.Office.writeDocx(Seq(
      1 -> "Beta Report", 0 -> s"beta body ${pad()}"))
    val files = Map("a.docx" -> docA, "b.docx" -> docB)
    val (baseUrl, stop) = serve(files)
    val cacheDir = java.nio.file.Files.createTempDirectory("graft-r11fc").toString
    try {
      val fc = FileCache.forDir(cacheDir)
      fc.setCapacity(docA.length.toLong max docB.length.toLong + 512)
      fc.setLeaseSeconds(0)
      spark.udf.register("fetch_docx_r11", (uri: String) => {
        val c = FileCache.forDir(cacheDir)
        val p = c.lookup(uri).getOrElse {
          val tmp = java.nio.file.Files.createTempFile(
            c.dir, ".fetch", ".docx.part")
          val in = new java.net.URI(uri).toURL.openStream()
          try java.nio.file.Files.copy(in, tmp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          c.add(FileCache.AnonTableId, 0, uri, tmp)
        }
        java.nio.file.Files.readAllBytes(p)
      })
      spark.udf.register("office_md_r11", graft.functions.Office.documentText)
      val cat = newCat()
      // computed column DECLARED up front: the insert itself runs the
      // office conversion through the budgeted cache (the backfill path)
      val t = GraftTable.create(spark, cat, "officefc", Seq(
        ColumnDef("id", "bigint"), ColumnDef("uri", "string"),
        ColumnDef("md", "string",
          computedExpr = Some("office_md_r11(fetch_docx_r11(uri))"))))
      // one task, row order a -> b -> a: b evicts a, the second a is a
      // mid-backfill working-set re-download
      val st = t.insertStatus(Seq(
        (1L, baseUrl + "a.docx"), (2L, baseUrl + "b.docx"),
        (3L, baseUrl + "a.docx")).toDF("id", "uri").coalesce(1))
      assert(st.numRows == 3)
      assert(st.cacheWarnings.exists(_.contains("downloaded multiple times")),
        s"expected the working-set eviction warning on insert status, got $st")
      // conversion correctness THROUGH the eviction: the re-fetched copy
      // of a.docx still converts to the same markdown
      val got = t.read().orderBy("id")
        .select(col("id"), substring_index(col("md"), "\n", 1).as("h1"))
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "# Alpha Report"), (2L, "# Beta Report"),
        (3L, "# Alpha Report")), s"got $got")
    } finally stop()
  }
}
