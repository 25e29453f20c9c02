package graft.streaming

import graft.catalog.GraftTable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference has no stream processing —
  * its incremental story is view maintenance on insert (SURVEY.md §2.11,
  * reference `plan.py:761-834`); `foreachBatchInto` is the streaming analog
  * (micro-batches land as table versions, computed columns evaluate per
  * batch), and `windowedCounts` is the watermarked event-time aggregation
  * the north star asks for beyond the reference surface.
  */
object Streaming {

  /** File stream over a directory of parquet drops. */
  def fileStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Stateful streaming dedup: drop rows whose key was already seen, with a
    * watermark bounding the dedup state (keys older than the watermark are
    * evicted — the streaming form of exact dedup at unbounded input).
    * Key-ONLY dedup: the same key at a different timestamp inside the
    * watermark is still a duplicate, so state is keyed on `keyCols` alone
    * (`dropDuplicatesWithinWatermark`, Spark 3.5+), not on (key, ts).
    */
  def dedupStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Incremental maintenance into a versioned table: every micro-batch is an
    * insert (one table version per batch), so computed columns, MVCC and
    * time travel apply to streamed data exactly as to batch inserts.
    */
  def foreachBatchInto(stream: DataFrame, table: GraftTable,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { table.insert(batch); () }
      }
      .start()

  /** One closed gap-session (same fields q40's batch sessionization emits,
    * so the two surfaces are directly comparable).
    */
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** Open-session state carried between micro-batches. */
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)

  /** Streaming gap-based sessionization — the batch q40 semantics (a
    * `gapMs` quiet period closes the session) on an unbounded stream via
    * `flatMapGroupsWithState` with an EVENT-time timeout: per-key state is
    * one open session; a batch's events extend it or close it (gap inside
    * the batch), and the watermark passing `end + gap` closes it between
    * batches — so state is O(keys), eviction is driven by event time, and
    * late data inside the watermark still lands in its session. This is
    * the custom-state tier Structured Streaming's built-in windowed aggs
    * can't express (`session_window` exists, but not with per-event custom
    * merge/emit logic — this operator is the template for any such state).
    *
    * Input columns: user_id (long), ts (timestamp), pre-sorted within a
    * group per micro-batch by Spark? NO — Spark gives batch order, so the
    * handler sorts each group's batch slice by event time before folding.
    */
  def sessionizeStream(events: DataFrame, gapMs: Long,
      watermark: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          def close(s: OpenSession): Unit =
            out += Session(key, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.endMs), s.n)
          if (!rows.hasNext && state.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            state.getOption.foreach(close)
            state.remove()
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  cur = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
                case Some(s) => // gap exceeded inside the batch: session closed
                  close(s)
                  cur = Some(OpenSession(t, t, 1))
                case None =>
                  cur = Some(OpenSession(t, t, 1))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // fires once the event-time watermark passes this instant
                state.setTimeoutTimestamp(s.endMs + gapMs)
              case None => state.remove()
            }
          }
          out.iterator
      }
  }

  /** One near-dup verdict: `dup_of` is the id of the FIRST seen document
    * within `maxHamming` SimHash bits, or −1 when the document is novel.
    */
  final case class NearDupVerdict(doc_id: Long, simhash: String, dup_of: Long)

  /** Streaming near-duplicate detection — the crawl-ingest shape: incoming
    * documents are SimHashed declaratively, then checked against per-bucket
    * state (`flatMapGroupsWithState`, bucket = the signature's 8-bit
    * prefix) holding the signatures seen so far. A document within
    * `maxHamming` bits of ANY prior same-bucket signature reports that
    * first document in `dup_of`; every signature enters state regardless
    * (transitive chains keep pointing at the earliest seen copy's bucket
    * entry). Per-batch processing order is doc_id (deterministic); state
    * per bucket is FIFO-capped at `maxPerBucket` signatures.
    *
    * Scale/fidelity contract: state is O(buckets × maxPerBucket), keyed
    * shuffle only. Bucketing is the single-pass approximation — a pair
    * whose differing bits fall inside the bucket band lands in different
    * buckets and is missed. The pigeonhole-exact composition runs FOUR
    * passes of this operator with disjoint 4-char bands (`bucketFrom` =
    * 0/4/8/12, `bucketLen` = 4): any pair within 3 signature chars has
    * an identical band, so min-combining the passes' verdicts equals the
    * batch banded-LSH answer exactly — gated end-to-end by q197 against
    * a full-hamming SQL oracle. Multiple stateful operators can't stack
    * in one append-mode query, so the passes run as separate streams
    * over the same source and combine in batch.
    */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, maxPerBucket: Int = 10000,
      bucketFrom: Int = 0, bucketLen: Int = 8): Dataset[NearDupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def hamming(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    val withSig = docs.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.TextFunctions.simhash16(
          split(lower(col(textCol)), "\\s+")).as("sig"))
      .as[(Long, String)]
    withSig
      .groupByKey(_._2.substring(bucketFrom, bucketFrom + bucketLen))
      .flatMapGroupsWithState[List[(String, Long)], NearDupVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String)],
         state: GroupState[List[(String, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil) // newest-first FIFO
          val out = rows.toSeq.sortBy(_._1).map { case (id, sig) =>
            // earliest matching doc = LAST match in the newest-first list
            val hit = seen.reverseIterator
              .find { case (s, _) => hamming(s, sig) <= maxHamming }
            seen = (sig, id) :: seen
            NearDupVerdict(id, sig, hit.map(_._2).getOrElse(-1L))
          }
          state.update(seen.take(maxPerBucket))
          out.iterator
      }
  }
}
