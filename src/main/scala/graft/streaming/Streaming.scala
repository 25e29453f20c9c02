package graft.streaming

import graft.catalog.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
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
}
