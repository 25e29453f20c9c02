package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import java.util.concurrent.{Callable, Executors, Future}
import scala.util.control.NonFatal

/** Rate-limited batched executor for expensive per-row calls (model
  * inference, remote APIs) — the Spark analog of the reference's
  * ExprEvalNode + resource-pool schedulers
  * (`/root/reference/pixeltable/exec/expr_eval/expr_eval_node.py:25-110`,
  * `schedulers.py:25-269`): batching to amortize call overhead, bounded
  * in-flight requests, a token-bucket rate limit, retries with exponential
  * backoff, and per-cell error capture instead of task failure.
  *
  * Runs inside `mapPartitions`, so limits apply per partition — on a large
  * cluster set `requestsPerSecond` to clusterBudget / concurrentPartitions.
  * Output preserves input order (the reference's maintain_input_order).
  * At most `maxBufferedRows` (reference MAX_BUFFERED_ROWS=2048) are held
  * per partition: input is consumed lazily, completed batches emit as soon
  * as every earlier batch has emitted — a fat partition streams through in
  * bounded memory instead of buffering entirely.
  */
object AsyncBatcher {

  final case class Config(
      batchSize: Int = 64,             // reference BATCH_SIZE=64
      maxConcurrent: Int = 8,
      requestsPerSecond: Double = 0.0, // 0 = unlimited
      maxRetries: Int = 3,
      retryBackoffMs: Long = 50,
      maxBufferedRows: Int = 2048,     // reference MAX_BUFFERED_ROWS
  )

  /** Map `fn` (a batch call: inputs → outputs, may throw) over a string
    * column, appending `outputCol` and `<outputCol>_errormsg`. A failing
    * batch is retried with exponential backoff; after `maxRetries` its rows
    * carry the error message instead of failing the job (the reference's
    * on_error='ignore' cell capture).
    */
  def mapColumn(df: DataFrame, inputCol: String, outputCol: String,
      fn: Seq[String] => Seq[String], config: Config = Config()): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(outputCol, StringType),
      StructField(s"${outputCol}_errormsg", StringType)))
    val idx = df.schema.fieldIndex(inputCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val conf = config
    df.mapPartitions { rows =>
      val pool = Executors.newFixedThreadPool(conf.maxConcurrent)
      val limiter = new TokenBucket(conf.requestsPerSecond)
      val maxPendingBatches = math.max(1, conf.maxBufferedRows / conf.batchSize)
      val batches = rows.grouped(conf.batchSize) // lazy: consumes input on demand
      val pending =
        scala.collection.mutable.Queue.empty[(IndexedSeq[Row], Future[Seq[(String, String)]])]
      def submitOne(): Unit = {
        val orig = batches.next().toIndexedSeq
        val inputs = orig.map(r => r.getAs[String](idx))
        val fut = pool.submit(new Callable[Seq[(String, String)]] {
          def call(): Seq[(String, String)] =
            try {
              limiter.acquire()
              callWithRetry(fn, inputs, conf).map(v => (v, null: String))
            } catch {
              case NonFatal(e) => inputs.map(_ => (null: String, e.getMessage))
            }
        })
        pending.enqueue((orig, fut))
      }
      new Iterator[Row] {
        private var cur: Iterator[Row] = Iterator.empty
        def hasNext: Boolean = {
          while (!cur.hasNext && (pending.nonEmpty || batches.hasNext)) {
            // keep the bounded window full, then block on the OLDEST batch
            // only (FIFO keeps input order) while later ones run concurrently
            while (pending.size < maxPendingBatches && batches.hasNext) submitOne()
            val (orig, fut) = pending.dequeue()
            cur = orig.zip(fut.get()).iterator.map { case (r, (v, err)) =>
              Row.fromSeq(r.toSeq :+ v :+ err)
            }
          }
          if (!cur.hasNext && pending.isEmpty && !batches.hasNext) pool.shutdown()
          cur.hasNext
        }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException("end of partition")
          cur.next()
        }
      }
    }(enc)
  }

  private def callWithRetry(fn: Seq[String] => Seq[String], inputs: Seq[String],
      conf: Config): Seq[String] = {
    var attempt = 0
    while (true) {
      try {
        val r = fn(inputs)
        require(r.length == inputs.length,
          s"batch fn returned ${r.length} results for ${inputs.length} inputs")
        return r
      } catch {
        case NonFatal(e) =>
          attempt += 1
          if (attempt > conf.maxRetries) throw e
          Thread.sleep(conf.retryBackoffMs * (1L << (attempt - 1)))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** token bucket: `rate` acquisitions/second with a one-second burst */
  private final class TokenBucket(rate: Double) extends Serializable {
    private var tokens = math.max(rate, 1.0)
    private var lastRefill = System.nanoTime()
    def acquire(): Unit = if (rate > 0) synchronized {
      var ok = false
      while (!ok) {
        val now = System.nanoTime()
        tokens = math.min(rate, tokens + (now - lastRefill) / 1e9 * rate)
        lastRefill = now
        if (tokens >= 1.0) { tokens -= 1.0; ok = true }
        else Thread.sleep(math.max(1L, ((1.0 - tokens) / rate * 1000).toLong))
      }
    }
  }
}
