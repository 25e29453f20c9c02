package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — learn merge rules from the corpus
  * (Sennrich et al. 2016, the algorithm behind the GPT-2/CLIP vocabularies
  * whose INFERENCE side `graft.ml.Bpe` implements). The reference ships
  * pretrained tokenizers; training one on your own corpus is the
  * data-pipeline-side operator this adds.
  *
  * Representation: each distinct word is held as a parenthesized symbol
  * string `(a)(b)(c)`. Applying a merge (l, r) is then the plain string
  * `replace(s, "(l)(r)", "(lr)")` — non-overlapping left-to-right, which
  * on this encoding is EXACTLY greedy BPE (adjacent occurrences cannot
  * share delimiter characters, and a match can never start mid-symbol
  * because every symbol match must begin with its own `(`). A naive
  * space-separated encoding gets both of those wrong: `" a b a b "`
  * merges only alternate pairs because each match consumes the shared
  * separator space.
  *
  * Scale shape: one word-frequency shuffle up front (map-side combined),
  * then per merge round one pair-count aggregation over the distinct-WORD
  * table (not the corpus — counts carry the weight) and a driver-side
  * 1-row argmax broadcast back into the next round's `replace`. Lineage
  * is truncated per round (`localCheckpoint`, the Iterate contract), so
  * plan depth stays constant however many merges are learned.
  */
object BpeTrain {

  final case class Merge(merge_rank: Int, lhs: String, rhs: String,
      pair_count: Long)

  /** Word-frequency table: lowercased whitespace tokens, alphabetic only
    * (`^[a-z]+$` — the oracle mirrors this exactly).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Learn `nMerges` merge rules. Ties break on (count DESC, lhs, rhs). */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    var repr = wordCounts(docs, textCol)
      .select(regexp_replace(col("w"), "(.)", "($1)").as("s"), col("cnt"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    for (rank <- 1 to nMerges) {
      val syms = split(regexp_replace(col("s"), "^\\(|\\)$", ""), "\\)\\(")
      val pairs = repr
        .select(col("cnt"), explode(arrays_zip(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1))).as("p"))
        .select(col("cnt"), col("p.0").as("lhs"), col("p.1").as("rhs"))
        .groupBy("lhs", "rhs").agg(sum(col("cnt")).as("c"))
      val top = pairs
        .orderBy(col("c").desc, col("lhs"), col("rhs")).limit(1).collect()
      if (top.isEmpty) return merges.result() // corpus exhausted of pairs
      val l = top(0).getString(0)
      val r = top(0).getString(1)
      val c = top(0).getLong(2)
      merges += Merge(rank, l, r, c)
      // symbols are [a-z]+ so the literals are injection-safe in the expr
      repr = repr.select(
        expr(s"replace(s, '($l)($r)', '($l$r)')").as("s"), col("cnt"))
        .localCheckpoint(true)
    }
    merges.result()
  }

  /** Production-scale trainer: ONE distributed word-count aggregation
    * (the only pass over the corpus — at 100 TB this is the map-side-
    * combined shuffle that matters), then merge learning runs on the
    * BOUNDED distinct-word table in memory with indexed delta updates —
    * the HF-tokenizers/fastBPE shape, and the same bounded-driver-state
    * pattern as PQ/k-means training (bit-determinism documented there).
    * `maxWords` caps driver state (top words by count, md5-free
    * deterministic (cnt DESC, w) order); with the cap not binding the
    * result is EXACTLY `learnMerges` (BpeTrainFastSpec pins equality),
    * and per-merge cost is O(affected words) + O(log P), not a Spark
    * round trip — 10k merges run in seconds (COVERAGE table).
    */
  def learnMergesFast(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 1000000): Seq[Merge] = {
    val words: Array[(Array[String], Long)] =
      wordCounts(docs, textCol)
        .orderBy(col("cnt").desc, col("w")).limit(maxWords)
        .collect()
        .map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))
    learnInMemory(words, nMerges)
  }

  /** The in-memory core (exposed for the equality/scale specs). */
  private[operators] def learnInMemory(words0: Array[(Array[String], Long)],
      nMerges: Int): Seq[Merge] = {
    val words = words0.map { case (syms, cnt) =>
      (scala.collection.mutable.ArrayBuffer.from(syms), cnt)
    }
    type Pair = (String, String)
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    val where = scala.collection.mutable.HashMap
      .empty[Pair, scala.collection.mutable.Set[Int]]
    // ordered view for O(log P) argmax: (-count, lhs, rhs)
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String, Ordering.String)
    val heap = scala.collection.mutable.TreeSet.empty[(Long, String, String)]

    def pairsOf(syms: scala.collection.mutable.ArrayBuffer[String]): Seq[Pair] =
      if (syms.length < 2) Nil
      else (0 until syms.length - 1).map(i => (syms(i), syms(i + 1)))

    def bump(p: Pair, delta: Long, wi: Int, add: Boolean): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) heap.remove((old, p._1, p._2))
      val now = old + delta
      if (now != 0L) { counts(p) = now; heap.add((now, p._1, p._2)) }
      else counts.remove(p)
      val set = where.getOrElseUpdate(p, scala.collection.mutable.Set.empty)
      if (add) set.add(wi) else if (!pairStillIn(p, wi)) set.remove(wi)
    }
    def pairStillIn(p: Pair, wi: Int): Boolean = {
      val s = words(wi)._1
      (0 until s.length - 1).exists(i => s(i) == p._1 && s(i + 1) == p._2)
    }

    words.zipWithIndex.foreach { case ((syms, cnt), wi) =>
      pairsOf(syms).foreach(p => bump(p, cnt, wi, add = true))
    }

    val merges = Seq.newBuilder[Merge]
    var rank = 1
    while (rank <= nMerges && heap.nonEmpty) {
      val (c, l, r) = heap.head
      merges += Merge(rank, l, r, c)
      val affected = where.getOrElse((l, r), Set.empty[Int]).toArray.sorted
      affected.foreach { wi =>
        val (syms, cnt) = words(wi)
        // subtract the word's old pairs, apply greedy L2R, add new pairs
        pairsOf(syms).foreach(p => bump(p, -cnt, wi, add = false))
        var i = 0
        while (i < syms.length - 1) {
          if (syms(i) == l && syms(i + 1) == r) {
            syms(i) = l + r
            syms.remove(i + 1)
            // greedy: do NOT retry at i with the merged symbol as lhs of
            // the same pair unless l+r happens to match — scanning on is
            // exactly left-to-right non-overlapping
          }
          i += 1
        }
        pairsOf(syms).foreach(p => bump(p, cnt, wi, add = true))
      }
      // the merged pair is gone from every word that held it
      counts.remove((l, r)).foreach(v => heap.remove((v, l, r)))
      where.remove((l, r))
      rank += 1
    }
    merges.result()
  }
}
