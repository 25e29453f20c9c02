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
}
