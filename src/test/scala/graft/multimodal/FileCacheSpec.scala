package graft.multimodal

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's `tests/test_file_cache.py::test_eviction`:
  * files served over a localhost HTTP server, a small byte budget, exact
  * LRU accounting (count / total size / evictions) verified after every
  * insert, physical-directory state matching the tracker including
  * mtime-recency order, and the "working set re-downloaded" warning.
  */
class FileCacheSpec extends AnyFunSuite {

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

  private def download(url: String, tmpDir: Path): Path = {
    val seg = url.substring(url.lastIndexOf('/') + 1)
    val dot = seg.lastIndexOf('.')
    val tmp = Files.createTempFile(tmpDir, "dl",
      if (dot >= 0) seg.substring(dot) else ".bin")
    val in = new java.net.URI(url).toURL.openStream()
    try Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp
  }

  private val tblId = "ab" * 16 // 32-hex table id

  /** miss → download + add; hit → cached path (the reference insert path) */
  private def retrieve(fc: FileCache, url: String, tmpDir: Path): Path =
    fc.lookup(url).getOrElse(fc.add(tblId, 0, url, download(url, tmpDir)))

  test("LRU eviction under a byte budget with exact per-step accounting") {
    // ~5-10 KiB files like the reference's imagenette images, deterministic
    val files = (0 until 50).map { i =>
      f"img_$i%02d.bin" -> Array.fill[Byte](5120 + (i * 977) % 5120)((i % 251).toByte)
    }.toMap
    val (base, stop) = serve(files)
    try {
      val cacheDir = Files.createTempDirectory("graft-fc")
      val tmpDir = Files.createTempDirectory("graft-fc-dl")
      val fc = new FileCache(cacheDir.toString)
      val capacity = 200L << 10
      fc.clear()
      fc.setCapacity(capacity)
      fc.setLeaseSeconds(0) // pure LRU accounting, as in the reference test

      val names = (0 until 50).map(i => f"img_$i%02d.bin")
      val urls = names.map(base + _)
      // index -> (url, size), insertion order = expected LRU order
      val tracker = mutable.LinkedHashMap.empty[Int, (String, Long)]
      var expectedSize = 0L
      var expectedEvictions = 0

      for (i <- 0 until 50) {
        if (i % 5 == 2) {
          // query the expected-eldest entry to perturb the eviction order
          val eldest = tracker.head._1
          assert(fc.lookup(tracker(eldest)._1).isDefined, s"expected hit for $eldest")
          val bumped = tracker.remove(eldest).get
          tracker.put(eldest, bumped)
        }
        retrieve(fc, urls(i), tmpDir)
        val size = files(names(i)).length.toLong
        tracker.put(i, (urls(i), size))
        expectedSize += size
        while (expectedSize > capacity) {
          val (oldest, (_, s)) = tracker.head
          tracker.remove(oldest)
          expectedSize -= s
          expectedEvictions += 1
        }
        assert(fc.numFiles() == tracker.size, s"at step $i")
        assert(fc.totalSize == expectedSize, s"at step $i")
        assert(fc.numEvictions == expectedEvictions, s"at step $i")
      }
      assert(fc.numEvictions > 0) // the test actually evicted something

      // physical directory matches the cache state
      val onDisk = Files.list(cacheDir).iterator()
      val entryFiles = new mutable.ArrayBuffer[Path]
      onDisk.forEachRemaining(p =>
        if (p.getFileName.toString.endsWith(".bin")) entryFiles += p)
      assert(entryFiles.size == tracker.size)
      assert(entryFiles.map(Files.size).sum == expectedSize)

      // mtime is the recency signal: sorting the dir by mtime reproduces the
      // LRU tracker exactly (the reference's strongest assertion)
      val byMtime = entryFiles.sortBy(p => Files.getLastModifiedTime(p).toInstant)
      assert(byMtime.map(Files.size(_)).toList == tracker.values.map(_._2).toList)

      // re-retrieve 10 previously-evicted files → one warning, counting 10
      for (n <- 0 until 10) retrieve(fc, urls(n), tmpDir)
      val w1 = fc.evictionWarning()
      assert(w1.exists(_.contains("10 media file(s)")), s"got $w1")
      assert(fc.evictionWarning().isEmpty) // flag consumed: one per operation

      // 5 more → another warning with CUMULATIVE session stats (15)
      for (n <- 10 until 15) retrieve(fc, urls(n), tmpDir)
      val w2 = fc.evictionWarning()
      assert(w2.exists(_.contains("15 media file(s)")), s"got $w2")
      fc.validate()
    } finally stop()
  }

  test("leased files are never evicted; FILE_CACHE_FULL when all leased") {
    val files = Map(
      "a.bin" -> Array.fill[Byte](8192)(1),
      "b.bin" -> Array.fill[Byte](8192)(2))
    val (base, stop) = serve(files)
    try {
      val fc = new FileCache(Files.createTempDirectory("graft-fc2").toString)
      val tmpDir = Files.createTempDirectory("graft-fc2-dl")
      fc.setCapacity(10L << 10) // fits one 8 KiB file, not two
      fc.setLeaseSeconds(3600) // freshly-added files stay leased
      retrieve(fc, base + "a.bin", tmpDir)
      val e = intercept[IllegalStateException](
        retrieve(fc, base + "b.bin", tmpDir))
      assert(e.getMessage.contains("FILE_CACHE_FULL"))
      // lease expiry (here: disabled) makes the same add succeed via eviction
      fc.setLeaseSeconds(0)
      retrieve(fc, base + "b.bin", tmpDir)
      assert(fc.numFiles() == 1 && fc.numEvictions == 1)
      assert(fc.lookup(base + "b.bin").isDefined)
    } finally stop()
  }

  test("index reconciles with the filesystem as the source of truth") {
    val files = Map("x.bin" -> Array.fill[Byte](100)(7))
    val (base, stop) = serve(files)
    try {
      val dir = Files.createTempDirectory("graft-fc3")
      val fc = new FileCache(dir.toString)
      val tmpDir = Files.createTempDirectory("graft-fc3-dl")
      val p = retrieve(fc, base + "x.bin", tmpDir)
      Files.delete(p) // an external process evicted the file
      assert(fc.lookup(base + "x.bin").isEmpty) // miss + index reconciled
      assert(fc.numFiles() == 0 && fc.totalSize == 0)
      // a NEW FileCache over a pre-populated dir adopts the existing entries
      val p2 = retrieve(fc, base + "x.bin", tmpDir)
      val fc2 = new FileCache(dir.toString)
      assert(fc2.numFiles() == 1 && fc2.totalSize == Files.size(p2))
    } finally stop()
  }

  test("clear(tblId) removes one table's entries; stats aggregate per column") {
    val files = Map(
      "p.bin" -> Array.fill[Byte](300)(1),
      "q.bin" -> Array.fill[Byte](500)(2),
      "r.bin" -> Array.fill[Byte](700)(3))
    val (base, stop) = serve(files)
    try {
      val fc = new FileCache(Files.createTempDirectory("graft-fc4").toString)
      val tmpDir = Files.createTempDirectory("graft-fc4-dl")
      val tblA = "aa" * 16
      val tblB = "bb" * 16
      fc.add(tblA, 0, base + "p.bin", download(base + "p.bin", tmpDir))
      fc.add(tblA, 1, base + "q.bin", download(base + "q.bin", tmpDir))
      fc.add(tblB, 0, base + "r.bin", download(base + "r.bin", tmpDir))
      val st = fc.stats
      assert(st.totalSize == 1500)
      assert(st.columnStats.map(c => (c.tblId, c.colId, c.numFiles, c.totalSize)) ==
        List((tblB, 0, 1, 700L), (tblA, 1, 1, 500L), (tblA, 0, 1, 300L)))
      fc.clear(Some(tblA))
      assert(fc.numFiles() == 1 && fc.totalSize == 700)
      assert(fc.numFiles(Some(tblA)) == 0 && fc.numFiles(Some(tblB)) == 1)
      fc.validate()
    } finally stop()
  }

  test("concurrent adds and lookups race safely; one file per url survives") {
    val files = (0 until 8).map(i => s"c$i.bin" -> Array.fill[Byte](512)(i.toByte)).toMap
    val (base, stop) = serve(files)
    try {
      val fc = new FileCache(Files.createTempDirectory("graft-fc6").toString)
      val tmpDir = Files.createTempDirectory("graft-fc6-dl")
      // 16 threads × 8 urls: every url downloaded by multiple racers —
      // the cache must keep exactly one file per url, sizes consistent
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 16).map(t => new Thread(() =>
        try (0 until 8).foreach { i =>
          val p = retrieve(fc, base + s"c$i.bin", tmpDir)
          assert(Files.size(p) == 512)
        } catch { case e: Throwable => errs.add(e) }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"racers failed: $errs")
      assert(fc.numFiles() == 8 && fc.totalSize == 8 * 512)
      fc.validate()
      // every retrieval was counted; racers that missed concurrently had
      // their redundant downloads discarded by add() (dedup, not a hit),
      // so hits are only a lower-bounded subset of the 128 requests
      assert(fc.numRequests == 16 * 8)
      assert(fc.numHits >= 8 && fc.numHits <= 16 * 8 - 8)
    } finally stop()
  }

  test("clusterStats: one row per executor holding the cache, none created by probing") {
    val spark = graft.TestSpark.spark
    val files = Map("s.bin" -> Array.fill[Byte](128)(3))
    val (base, stop) = serve(files)
    try {
      val cacheDir = Files.createTempDirectory("graft-fc-stats").toString
      // probing an unknown dir yields zero rows and creates nothing
      assert(FileCache.clusterStats(spark,
        Files.createTempDirectory("graft-fc-none").toString).count() == 0)
      val fc = FileCache.forDir(cacheDir)
      fc.add(tblId, 0, base + "s.bin",
        download(base + "s.bin", Files.createTempDirectory("d2")))
      fc.lookup(base + "s.bin")
      val rows = FileCache.clusterStats(spark, cacheDir).collect()
      assert(rows.length == 1) // local[32] = one executor JVM ("driver")
      val r = rows.head
      assert(r.getAs[Long]("total_size") == 128 && r.getAs[Int]("num_files") == 1)
      assert(r.getAs[Int]("num_hits") >= 1)
    } finally stop()
  }

  test("dropTable clears the dropped table's cached media, nothing else") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val files = Map(
      "a.bin" -> Array.fill[Byte](256)(1),
      "b.bin" -> Array.fill[Byte](256)(2))
    val (base, stop) = serve(files)
    try {
      val cat = new graft.catalog.Catalog(
        Files.createTempDirectory("graft-fc-drop").toString)
      val t = graft.catalog.GraftTable.create(spark, cat, "media_tbl",
        Seq(graft.catalog.ColumnDef("id", "bigint"),
          graft.catalog.ColumnDef("uri", "string")))
      t.insert(Seq((1L, base + "a.bin")).toDF("id", "uri"))
      val cacheDir = Files.createTempDirectory("graft-fc-drop-cache").toString
      // the table's media cached under ITS id — through the catalog
      // surface, which threads tableId itself; an unrelated entry alongside
      t.localPath("uri", "lp", cacheDir).collect()
      val fc = FileCache.forDir(cacheDir)
      fc.add(FileCache.tableId("other_tbl"), 0, base + "b.bin",
        download(base + "b.bin", Files.createTempDirectory("d")))
      assert(fc.numFiles() == 2)
      cat.dropTable("media_tbl")
      assert(fc.numFiles(Some(FileCache.tableId("media_tbl"))) == 0)
      assert(fc.numFiles(Some(FileCache.tableId("other_tbl"))) == 1)
      fc.validate()
    } finally stop()
  }

  test("withLocalPath honors the spark.graft.fileCache.* session conf") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val files = (0 until 6).map(i => s"m$i.bin" -> Array.fill[Byte](4096)((i + 1).toByte)).toMap
    val (base, stop) = serve(files)
    try {
      val cacheDir = Files.createTempDirectory("graft-fc7").toString
      spark.conf.set("spark.graft.fileCache.capacityBytes", (10L * 1024).toString)
      spark.conf.set("spark.graft.fileCache.leaseSeconds", "0")
      try {
        val df = (0 until 6).map(i => (i.toLong, base + s"m$i.bin")).toDF("id", "uri")
        Multimodal.withLocalPath(df, "uri", "localpath", cacheDir).collect()
        val fc = FileCache.forDir(cacheDir)
        // 6 × 4 KiB through a 10 KiB budget: at most 2 files survive
        assert(fc.capacityBytes == 10L * 1024)
        assert(fc.totalSize <= 10L * 1024 && fc.numEvictions >= 4)
      } finally {
        spark.conf.unset("spark.graft.fileCache.capacityBytes")
        spark.conf.unset("spark.graft.fileCache.leaseSeconds")
      }
    } finally stop()
  }

  test("eviction working-set warning surfaces on DML status exactly once per op") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val cacheDir = Files.createTempDirectory("graft-fc-warn").toString
    val fc = FileCache.forDir(cacheDir)
    fc.setCapacity(5000)
    fc.setLeaseSeconds(0)
    def tmpFile(sz: Int) = {
      val t = Files.createTempFile(fc.dir, ".fetch", ".bin")
      Files.write(t, Array.fill[Byte](sz)(1))
      t
    }
    fc.add(FileCache.AnonTableId, 0, "http://warn/a", tmpFile(4096))
    fc.add(FileCache.AnonTableId, 0, "http://warn/b", tmpFile(4096)) // evicts a
    assert(fc.lookup("http://warn/a").isEmpty)
    // downloaded AGAIN after eviction: the working set exceeds the budget
    fc.add(FileCache.AnonTableId, 0, "http://warn/a", tmpFile(4096))
    val cat = new graft.catalog.Catalog(
      Files.createTempDirectory("graft-fc-warn-cat").toString)
    val t = graft.catalog.GraftTable.create(spark, cat, "warn_tbl",
      Seq(graft.catalog.ColumnDef("id", "bigint")))
    // the next top-level DML op drains the warning onto its status…
    val st1 = t.insertStatus(Seq(1L).toDF("id"))
    assert(st1.cacheWarnings.exists(_.contains("downloaded multiple times")),
      s"expected a working-set warning, got ${st1.cacheWarnings}")
    // …and exactly once: the following op reports none
    val st2 = t.insertStatus(Seq(2L).toDF("id"))
    assert(!st2.cacheWarnings.exists(_.contains("downloaded multiple times")))
  }

  test("FILE_CACHE_FULL during withLocalPath does not leak the downloaded temp file") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // 4 KiB file through a 1 KiB budget: ensureCapacity can never fit it,
    // add throws FILE_CACHE_FULL — the per-cell error must also clean up
    // the '.fetch…' temp (invisible to scans/clear/budget otherwise)
    val files = Map("big.bin" -> Array.fill[Byte](4096)(7))
    val (base, stop) = serve(files)
    try {
      val cacheDir = Files.createTempDirectory("graft-fc-leak").toString
      spark.conf.set("spark.graft.fileCache.capacityBytes", "1024")
      try {
        val df = Seq((1L, base + "big.bin"), (2L, base + "big.bin"))
          .toDF("id", "uri")
        val out = Multimodal.withLocalPath(df, "uri", "localpath", cacheDir)
          .collect()
        assert(out.forall(r => Option(r.getAs[String]("localpath_errormsg"))
          .exists(_.contains("FILE_CACHE_FULL"))))
        val s = Files.list(java.nio.file.Paths.get(cacheDir))
        val leftover = try {
          val it = s.iterator(); val b = Seq.newBuilder[String]
          while (it.hasNext) b += it.next().getFileName.toString
          b.result()
        } finally s.close()
        assert(leftover.forall(!_.startsWith(".fetch")),
          s"leaked temp files: $leftover")
      } finally spark.conf.unset("spark.graft.fileCache.capacityBytes")
    } finally stop()
  }

  test("withLocalPath routes remote URLs through the cache; hits skip refetch") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val png = graft.functions.Images.solidPng(8, 8, 0x123456)
    val files = Map("one.png" -> png, "two.png" -> Array.fill[Byte](2048)(9))
    val (base, stop) = serve(files)
    try {
      val cacheDir = Files.createTempDirectory("graft-fc5").toString
      val df = Seq((1L, base + "one.png"), (2L, base + "two.png"))
        .toDF("id", "uri")
      val out1 = Multimodal.withLocalPath(df, "uri", "localpath", cacheDir)
        .orderBy("id").collect()
      assert(out1.forall(_.getAs[String]("localpath_errormsg") == null))
      val p1 = java.nio.file.Paths.get(out1(0).getAs[String]("localpath"))
      assert(Files.exists(p1) &&
        java.util.Arrays.equals(Files.readAllBytes(p1), png))
      assert(p1.getParent.toString == cacheDir) // cached in the budgeted dir
      assert(p1.getFileName.toString.endsWith(".png")) // extension retained
      val fc = FileCache.forDir(cacheDir)
      assert(fc.numFiles() == 2)
      val hitsBefore = fc.numHits
      // second pass: cache hits, same paths, no new files
      val out2 = Multimodal.withLocalPath(df, "uri", "localpath", cacheDir)
        .orderBy("id").collect()
      assert(out2(0).getAs[String]("localpath") == out1(0).getAs[String]("localpath"))
      assert(fc.numFiles() == 2 && fc.numHits >= hitsBefore + 2)
    } finally stop()
  }
}
