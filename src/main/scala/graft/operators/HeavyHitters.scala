package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy hitters (Metwally/Agrawal/El Abbadi 2005, "Efficient
  * computation of frequent and top-k elements in data streams"), merged
  * per the mergeable-summaries recipe (Agarwal et al. 2013): a capacity-m
  * counter set whose estimates obey, for every item,
  * `true ≤ est` and `est − err ≤ true`, and whose MISSING items are
  * guaranteed `true ≤ min(est)` — so every item with frequency above the
  * summary's error bound is necessarily present. The distributed shape is
  * a classic partial-aggregate: each task streams its partition into a
  * local summary (O(m) state), summaries pair-merge (sum shared items;
  * an item absent from a saturated side contributes that side's min as
  * its upper bound; truncate to the m largest), and only O(m) rows reach
  * the driver — the top-k-frequent plan that never shuffles the raw
  * stream.
  *
  * Counter maintenance is O(log #distinct-counts) per offer via
  * count-bucket TreeMap (the stream-summary structure from the paper,
  * flattened); the buckets rebuild lazily after (de)serialization, so
  * the kryo buffer only carries the counts map.
  *
  * Relation to the reference: its aggregate surface stops at exact
  * `count`/custom Python UDAs (`func/aggregate_function.py`); this is the
  * sketch-sized sibling an LLM-corpus pipeline needs for vocabulary /
  * domain / n-gram frequency surveys at 100 TB.
  */
object SpaceSaving {

  /** (est, err) per tracked item. */
  final class Summary(val m: Int,
      val counts: mutable.HashMap[String, (Long, Long)]) extends Serializable {

    @transient private var buckets: java.util.TreeMap[Long, mutable.LinkedHashSet[String]] = _

    private def ensureBuckets(): Unit = if (buckets == null) {
      buckets = new java.util.TreeMap[Long, mutable.LinkedHashSet[String]]()
      counts.foreach { case (k, (c, _)) => bucketAdd(c, k) }
    }

    private def bucketAdd(c: Long, item: String): Unit = {
      val s = buckets.get(c)
      if (s == null) {
        val ns = mutable.LinkedHashSet.empty[String]
        ns += item
        buckets.put(c, ns)
      } else s += item
    }

    private def bucketRemove(c: Long, item: String): Unit = {
      val s = buckets.get(c)
      s -= item
      if (s.isEmpty) buckets.remove(c)
      ()
    }

    /** Min estimate, the bound for items NOT in a saturated summary;
      * 0 while under capacity (absent then truly means count 0).
      */
    def minBound: Long = {
      ensureBuckets()
      if (counts.size < m) 0L else if (buckets.isEmpty) 0L else buckets.firstKey()
    }

    def offer(item: String): Unit = {
      ensureBuckets()
      counts.get(item) match {
        case Some((c, e)) =>
          counts(item) = (c + 1, e)
          bucketRemove(c, item)
          bucketAdd(c + 1, item)
        case None if counts.size < m =>
          counts(item) = (1L, 0L)
          bucketAdd(1L, item)
        case None =>
          val minC = buckets.firstKey()
          val victim = buckets.get(minC).head
          bucketRemove(minC, victim)
          counts.remove(victim)
          counts(item) = (minC + 1, minC)
          bucketAdd(minC + 1, item)
      }
    }

    /** Pair-merge preserving both bounds: shared items sum; an item
      * absent from the other side contributes that side's `minBound`
      * to BOTH est and err (its true count there is ≤ that bound);
      * then truncate to the m largest estimates.
      */
    def mergeWith(o: Summary): Summary = {
      if (counts.isEmpty) return o
      if (o.counts.isEmpty) return this
      val mA = minBound
      val mB = o.minBound
      val all = mutable.HashMap.empty[String, (Long, Long)]
      counts.foreach { case (k, (c, e)) =>
        val (c2, e2) = o.counts.getOrElse(k, (mB, mB))
        all(k) = (c + c2, e + e2)
      }
      o.counts.foreach { case (k, (c, e)) =>
        if (!counts.contains(k)) all(k) = (c + mA, e + mA)
      }
      val kept =
        if (all.size <= m) all
        else mutable.HashMap(all.toSeq
          .sortBy { case (k, (c, _)) => (-c, k) }.take(m): _*)
      new Summary(m, kept)
    }
  }

  def emptySummary(m: Int): Summary =
    new Summary(m, mutable.HashMap.empty[String, (Long, Long)])
}

/** Typed UDA: `ds.as[String].select(new SpaceSavingAgg(m).toColumn)` →
  * the summary as (item, est, err) triples sorted by (est desc, item).
  */
final class SpaceSavingAgg(m: Int)
    extends Aggregator[String, SpaceSaving.Summary, Seq[(String, Long, Long)]] {
  def zero: SpaceSaving.Summary = SpaceSaving.emptySummary(m)
  def reduce(b: SpaceSaving.Summary, item: String): SpaceSaving.Summary = {
    b.offer(item); b
  }
  def merge(a: SpaceSaving.Summary, b: SpaceSaving.Summary): SpaceSaving.Summary =
    a.mergeWith(b)
  def finish(b: SpaceSaving.Summary): Seq[(String, Long, Long)] =
    b.counts.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }
  def bufferEncoder: Encoder[SpaceSaving.Summary] =
    Encoders.kryo[SpaceSaving.Summary]
  def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    Encoders.kryo[Seq[(String, Long, Long)]]
}
