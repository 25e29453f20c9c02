package graft.multimodal

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.util.concurrent.TimeUnit

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Size-budgeted LRU cache of externally-fetched media files — the Spark
  * mapping of the reference's `FileCache`
  * (`/root/reference/pixeltable/utils/filecache.py`, exercised by
  * `tests/test_file_cache.py`).
  *
  * Semantics kept from the reference:
  *  - entries are named `<tblId>_<colId>_<sha256(url)><ext>` in the cache dir;
  *  - a file's mtime IS its last-used time (lookup/add touch the file), so the
  *    filesystem is the source of truth and the in-memory index is advisory —
  *    every access verifies against the filesystem and reconciles on mismatch;
  *  - eviction is LRU by mtime, skipping any file whose mtime is within
  *    `leaseSeconds` (an auto-expiring in-use lease, so a crashed holder never
  *    leaks a permanent pin); if the budget can't be met because everything
  *    left is leased, `add` fails with a FILE_CACHE_FULL-style error;
  *  - session stats (requests/hits/evictions, per-column sizes) plus the
  *    "working set was evicted and re-downloaded" warning machinery
  *    (reference `emit_eviction_warnings`).
  *
  * Deployment shape at 100 TB: this cache is EXECUTOR-LOCAL. Each executor
  * process caches under its own local dir (Spark's per-executor local/scratch
  * space), so there is no cross-process sharing to coordinate and the
  * intra-process lock suffices; the byte budget is what keeps a long-lived
  * executor on a media-heavy corpus from filling local disk. Instances are
  * per-directory singletons (`FileCache.forDir`) so all tasks in an executor
  * share one index and one budget.
  */
final class FileCache(dirStr: String) {

  val dir: Path = Paths.get(dirStr)
  Files.createDirectories(dir)

  import FileCache.{CacheEntry, EntryNameRe}

  /** insertion order = LRU order (oldest first); guarded by `this` */
  private val cache = mutable.LinkedHashMap.empty[String, CacheEntry]

  private var capacityBytesV: Long = Long.MaxValue // default: never evict
  private var leaseSecondsV: Double = 10.0

  private var totalSizeV: Long = 0L
  private var numRequestsV: Int = 0
  private var numHitsV: Int = 0
  private var numEvictionsV: Int = 0

  // session working-set tracking (reference filecache.py:103-117)
  private val keysRetrieved = mutable.Set.empty[String]
  private val keysEvictedAfterRetrieval = mutable.Set.empty[String]
  private val evictedWorkingSetKeys = mutable.Set.empty[String]
  private var newRedownloadWitnessed = false

  // Strictly-increasing touch times so LRU order is total even when two
  // touches land in the same clock tick (the reference relies on os.utime's
  // ns resolution; we enforce monotonicity explicitly).
  private var lastTouchNanos: Long = 0L

  initIndex()

  def capacityBytes: Long = synchronized(capacityBytesV)
  def totalSize: Long = synchronized(totalSizeV)
  def numRequests: Int = synchronized(numRequestsV)
  def numHits: Int = synchronized(numHitsV)
  def numEvictions: Int = synchronized(numEvictionsV)

  def numFiles(tblId: Option[String] = None): Int = synchronized {
    tblId match {
      case None     => cache.size
      case Some(id) => cache.valuesIterator.count(_.tblId == id)
    }
  }

  def avgFileSize: Long = synchronized {
    if (cache.isEmpty) 0L else totalSizeV / cache.size
  }

  def setCapacity(bytes: Long): Unit = synchronized {
    capacityBytesV = bytes
    ensureCapacity(0L) // shrink if necessary (best-effort; size=0 never throws)
  }

  def setLeaseSeconds(s: Double): Unit = synchronized { leaseSecondsV = s }

  /** dir listing with the stream closed (Files.list leaks an fd otherwise) */
  private def listDir(): List[Path] =
    try {
      val s = Files.list(dir)
      try s.iterator().asScala.toList finally s.close()
    } catch { case _: java.io.IOException => Nil }

  /** rebuild the index from the directory's current contents, oldest first */
  private def initIndex(): Unit = synchronized {
    val entries = mutable.ArrayBuffer.empty[(FileTime, CacheEntry)]
    val listing = listDir()
    for (p <- listing) {
      val name = p.getFileName.toString
      name match {
        case EntryNameRe(tbl, col, key, ext) =>
          try {
            val attrs = Files.readAttributes(
              p, classOf[java.nio.file.attribute.BasicFileAttributes])
            entries += ((attrs.lastModifiedTime(),
              CacheEntry(key, tbl, col.toInt, attrs.size(),
                Option(ext).getOrElse(""))))
          } catch {
            // matched the pattern but vanished between list and stat
            // (concurrent eviction); ignore
            case _: java.io.IOException => ()
          }
        case _ => () // not a cache entry file (lock files, temp downloads)
      }
    }
    cache.clear()
    totalSizeV = 0L
    for ((_, e) <- entries.sortBy(_._1)) {
      cache.put(e.key, e)
      totalSizeV += e.size
    }
  }

  private def urlHash(url: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(url.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def entryPath(e: CacheEntry): Path =
    dir.resolve(s"${e.tblId}_${e.colId}_${e.key}${e.ext}")

  /** touch = renew the lease / record last-used; strictly-increasing mtimes */
  private def touch(p: Path): Unit = {
    val nowN = System.currentTimeMillis() * 1000000L
    lastTouchNanos = math.max(nowN, lastTouchNanos + 1000L) // +1µs on ties
    Files.setLastModifiedTime(p, FileTime.from(lastTouchNanos, TimeUnit.NANOSECONDS))
  }

  private def tryRemoveFile(p: Path): Boolean =
    try { Files.deleteIfExists(p); true }
    catch { case _: java.io.IOException => false }

  /** Look up a cached file by URL; touches it (renewing the lease) and
    * promotes it to most-recently-used. Returns None on a miss, reconciling
    * the index if the file was evicted out from under us.
    */
  def lookup(url: String): Option[Path] = synchronized {
    numRequestsV += 1
    val key = urlHash(url)
    cache.get(key) match {
      case None => None
      case Some(e) =>
        val p = entryPath(e)
        if (!Files.exists(p)) { // evicted externally: reconcile, report miss
          cache.remove(key)
          totalSizeV -= e.size
          None
        } else {
          touch(p)
          cache.remove(key); cache.put(key, e) // move to MRU end
          numHitsV += 1
          keysRetrieved += key
          Some(p)
        }
    }
  }

  /** Adds `url`'s downloaded bytes at `tmpPath` to the cache and returns the
    * cached path; `tmpPath` is consumed. Retains `tmpPath`'s extension. If the
    * url is already cached (a concurrent download won), the redundant download
    * is discarded and the existing file returned.
    */
  def add(tblId: String, colId: Int, url: String, tmpPath: Path): Path = synchronized {
    val key = urlHash(url)
    cache.get(key) match {
      case Some(existing) if Files.exists(entryPath(existing)) =>
        touch(entryPath(existing))
        tryRemoveFile(tmpPath)
        cache.remove(key); cache.put(key, existing)
        keysRetrieved += key
        return entryPath(existing)
      case Some(stale) => // index entry whose file was evicted externally
        cache.remove(key)
        totalSizeV -= stale.size
      case None => ()
    }
    val size = Files.size(tmpPath)
    ensureCapacity(size)
    if (keysEvictedAfterRetrieval.contains(key)) {
      // retrieved earlier this session, evicted, now downloaded AGAIN: the
      // working set does not fit the budget (reference filecache.py:334-338)
      evictedWorkingSetKeys += key
      newRedownloadWitnessed = true
    }
    keysRetrieved += key
    val name = tmpPath.getFileName.toString
    val dot = name.lastIndexOf('.')
    val ext = if (dot >= 0) name.substring(dot) else ""
    val e = CacheEntry(key, tblId, colId, size, ext)
    val target = entryPath(e)
    Files.move(tmpPath, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    touch(target)
    cache.put(key, e)
    totalSizeV += size
    target
  }

  /** Evict LRU entries until `size` more bytes fit in the budget, skipping
    * leased (recently-touched) files. size == 0 is a best-effort shrink and
    * never throws; otherwise throws if everything left is leased.
    */
  def ensureCapacity(size: Long): Unit = synchronized {
    if (totalSizeV + size <= capacityBytesV) return
    initIndex() // see the directory's current state before deciding evictions
    val keys = cache.keys.toList // oldest-accessed first
    for (key <- keys if totalSizeV + size > capacityBytesV) {
      val e = cache(key)
      val p = entryPath(e)
      val mtimeMs =
        try Some(Files.getLastModifiedTime(p).toMillis)
        catch { case _: java.io.IOException => None }
      val leased = mtimeMs.exists(m =>
        (System.currentTimeMillis() - m) < leaseSecondsV * 1000.0)
      if (!leased && (mtimeMs.isEmpty || tryRemoveFile(p))) {
        cache.remove(key)
        totalSizeV -= e.size
        numEvictionsV += 1
        if (keysRetrieved.contains(key)) keysEvictedAfterRetrieval += key
      }
    }
    if (size > 0 && totalSizeV + size > capacityBytesV)
      throw new IllegalStateException(
        f"FILE_CACHE_FULL: the file cache (${capacityBytesV / (1L << 30).toDouble}%.2f GB) " +
          "is too small for the set of media files in concurrent use. " +
          "Increase the cache capacity.")
  }

  /** Remove entries (all, or one table's); full clear also resets stats —
    * reference `FileCache.clear` (filecache.py:196-225).
    */
  def clear(tblId: Option[String] = None): Unit = synchronized {
    newRedownloadWitnessed = false
    evictedWorkingSetKeys.clear()
    tblId match {
      case None =>
        // remove every cache-entry file on disk, not just tracked ones
        for (p <- listDir()
             if EntryNameRe.pattern.matcher(p.getFileName.toString).matches())
          tryRemoveFile(p)
        cache.clear()
        totalSizeV = 0L
        numRequestsV = 0; numHitsV = 0; numEvictionsV = 0
        keysRetrieved.clear()
        keysEvictedAfterRetrieval.clear()
      case Some(id) =>
        val victims = cache.valuesIterator.filter(_.tblId == id).toList
        for (e <- victims) {
          tryRemoveFile(entryPath(e))
          cache.remove(e.key)
          totalSizeV -= e.size
        }
    }
  }

  /** every tracked entry must still exist on disk (test utility) */
  def validate(): Unit = synchronized {
    for (e <- cache.valuesIterator)
      require(Files.exists(entryPath(e)), s"${entryPath(e)} does not exist")
  }

  /** The reference's `emit_eviction_warnings`: if any file retrieved this
    * session was evicted and then downloaded a second time, return a warning
    * recommending a larger budget (cumulative across the session); None
    * otherwise. Consumes the "new since last warning" flag, so repeated calls
    * without new re-downloads return None — one warning per top-level op.
    */
  def evictionWarning(): Option[String] = synchronized {
    if (!newRedownloadWitnessed) None
    else {
      val extraNeeded = evictedWorkingSetKeys.iterator
        .flatMap(cache.get).map(_.size).sum
      val suggested = capacityBytesV + extraNeeded + (1L << 30)
      newRedownloadWitnessed = false
      Some(
        s"${evictedWorkingSetKeys.size} media file(s) had to be downloaded multiple times " +
          "this session, because they were evicted from the file cache after their first " +
          f"access. The total size of the evicted file(s) is ${extraNeeded / (1L << 30).toDouble}%.1f GiB. " +
          f"Consider increasing the cache capacity to at least ${suggested / (1L << 30).toDouble}%.1f GiB " +
          f"(it is currently ${capacityBytesV / (1L << 30).toDouble}%.1f GiB).")
    }
  }

  /** per-(table, column) usage, largest first — reference `FileCache.stats` */
  def stats: FileCache.Stats = synchronized {
    val byCol = mutable.LinkedHashMap.empty[(String, Int), (Int, Long)]
    for (e <- cache.valuesIterator) {
      val (n, s) = byCol.getOrElse((e.tblId, e.colId), (0, 0L))
      byCol((e.tblId, e.colId)) = (n + 1, s + e.size)
    }
    val colStats = byCol.iterator
      .map { case ((t, c), (n, s)) => FileCache.ColumnStats(t, c, n, s) }
      .toList.sortBy(-_.totalSize)
    FileCache.Stats(totalSizeV, numRequestsV, numHitsV, numEvictionsV, colStats)
  }

  /** sizes of tracked entries in LRU order (oldest first) — test helper */
  def lruSizes: List[Long] = synchronized(cache.valuesIterator.map(_.size).toList)
}

object FileCache {

  final case class CacheEntry(key: String, tblId: String, colId: Int,
      size: Long, ext: String)

  final case class ColumnStats(tblId: String, colId: Int, numFiles: Int,
      totalSize: Long)

  final case class Stats(totalSize: Long, numRequests: Int, numHits: Int,
      numEvictions: Int, columnStats: List[ColumnStats])

  /** `<tblId 32-hex>_<colId>_<sha256 64-hex><ext>` — reference
    * filecache.py:28; lock/temp files don't match and are ignored by scans.
    */
  private val EntryNameRe =
    "([0-9a-f]{32})_([0-9]+)_([0-9a-f]{64})(\\..*)?".r

  /** synthetic table id for callers outside the catalog (plain DataFrames) */
  val AnonTableId: String = "0" * 32

  /** 32-hex cache-entry table id for a catalog table name (the analog of
    * the reference's tbl_id.hex)
    */
  def tableId(tableName: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(tableName.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** clear `tblId`'s entries from every cache instance in this JVM —
    * invoked by Catalog.dropTable (reference drop → FileCache.clear(tbl_id))
    */
  def clearTable(tblId: String): Unit =
    instances.values().forEach(_.clear(Some(tblId)))

  /** Drain the pending working-set re-download warnings from every cache
    * in this JVM (reference `emit_eviction_warnings`) — called by the
    * catalog's DML surfaces once per top-level op; consumes each cache's
    * "new since last warning" flag.
    */
  def drainEvictionWarnings(): Seq[String] = {
    val out = Seq.newBuilder[String]
    instances.values().forEach(fc => fc.evictionWarning().foreach(out += _))
    out.result()
  }

  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, FileCache]()

  /** per-directory executor-local singleton: all tasks in the executor share
    * one index and one byte budget for a given cache dir
    */
  def forDir(dirStr: String): FileCache = {
    val key = Paths.get(dirStr).toAbsolutePath.normalize.toString
    instances.computeIfAbsent(key, _ => new FileCache(key))
  }

  /** existing instance for a dir, without creating one (stats probes) */
  private def peek(dirStr: String): Option[FileCache] =
    Option(instances.get(Paths.get(dirStr).toAbsolutePath.normalize.toString))

  /** Cluster-wide cache observability (the reference's user-facing
    * `FileCache.stats()`): one row per EXECUTOR that holds a cache for
    * `cacheDir`. The sweep is a BARRIER stage with exactly
    * `defaultParallelism` tasks — gang scheduling fills every executor's
    * task slots simultaneously, so no executor can be silently missing
    * from the stats (the plain `spark.range` fan-out could skip an
    * executor under dynamic allocation or locality skew; tasks on the
    * same JVM report identical values and dedupe by executor id).
    * Executors that never cached under the dir are absent — the probe
    * never creates caches. Result size is bounded by executor count.
    */
  def clusterStats(spark: org.apache.spark.sql.SparkSession,
      cacheDir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val slots = math.max(1, spark.sparkContext.defaultParallelism)
    // Barrier stages are rejected under dynamic allocation (and stall when
    // fewer slots are live than defaultParallelism), so this observability
    // probe must not insist on gang scheduling there: fall back to an
    // oversubscribed plain fan-out, which degrades to partial coverage
    // instead of failing.
    val dynAlloc = spark.sparkContext.getConf
      .getBoolean("spark.dynamicAllocation.enabled", defaultValue = false)
    val statRows: Iterator[Int] => Iterator[(String, Long, Int, Int, Int, Int, Long)] =
      _ => {
        val execId = org.apache.spark.SparkEnv.get.executorId
        FileCache.peek(cacheDir).iterator.map { fc =>
          val st = fc.stats
          (execId, st.totalSize, fc.numFiles(), st.numRequests, st.numHits,
            st.numEvictions, fc.capacityBytes)
        }
      }
    val rows =
      (if (dynAlloc)
        spark.sparkContext.parallelize(0 until slots * 4, slots * 4)
          .mapPartitions(statRows)
      else
        spark.sparkContext.parallelize(0 until slots, slots)
          .barrier()
          .mapPartitions { it =>
            // every task holds its slot until all have reached the barrier →
            // each executor is occupied by exactly its core count of tasks
            org.apache.spark.BarrierTaskContext.get().barrier()
            statRows(it)
          })
      .collect() // bounded: ≤ one row per task slot, deduped next
    rows.toSeq
      .toDF("executor_id", "total_size", "num_files", "num_requests",
        "num_hits", "num_evictions", "capacity_bytes")
      .dropDuplicates("executor_id")
  }
}
