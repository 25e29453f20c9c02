package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance ranking over a document corpus: inverted-index term
  * statistics, TF-IDF keyword extraction, and BM25 query scoring.
  *
  * The reference has no ranking surface (its text retrieval is embedding
  * similarity, `index/embedding_index.py`); these are north-star
  * training-data-pipeline operators (corpus quality filtering / keyword
  * search belongs next to dedup and lang-id).
  *
  * Scale shapes (100 TB):
  *  - `termStats` is the classic inverted-index build: explode to
  *    (doc, term) pairs, one shuffle keyed on (doc, term) with map-side
  *    combine, then a term-keyed aggregate for document frequencies. All
  *    stages are linear in corpus size; no driver materialization.
  *  - `bm25` filters the exploded pairs to the query's terms BEFORE any
  *    shuffle, so the aggregation only ever sees matching postings
  *    (a 3-term query over 100 TB shuffles only the rows containing those
  *    3 terms). Corpus stats (N, avgdl) are a 1-row aggregate, broadcast
  *    via crossJoin; per-term document frequencies are a <=|query| row
  *    broadcast join. Top-k is orderBy+limit = TakeOrderedAndProject
  *    (per-partition heaps, no global sort).
  *  - `topTfidfTerms` joins postings to the vocabulary-sized df table on
  *    term (shuffle join — vocabulary can be large) and reduces per doc
  *    with max_by (single hash aggregate, no window sort).
  */
object Ranking {

  /** lowercase whitespace tokens (parity with the DuckDB oracle's
    * string_split_regex(trim(lower(text)), '\s+'))
    */
  def lowerTokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** (doc_id, term, tf, dl): one row per posting, with the document's
    * total token count carried alongside (computed map-side, no extra
    * shuffle or self-join).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = lowerTokens(col(textCol))
    docs
      .select(col(idCol), toks.as("_toks"))
      .select(col(idCol), size(col("_toks")).as("dl"), explode(col("_toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Per-term corpus statistics: document frequency and total frequency. */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postings(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))

  /** BM25 relevance of every matching document for `query`, descending.
    * Standard Robertson/Lucene formulation:
    *   idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    *   w(t, d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    * Emits (idCol, bm25, terms_hit) with bm25 rounded to `roundDp` for
    * cross-engine determinism; ties broken by idCol.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, query: String,
      topK: Int, k1: Double = 1.2, b: Double = 0.75, roundDp: Int = 4): DataFrame = {
    val qTerms = query.toLowerCase.trim.split("\\s+").distinct.toSeq
    val toks = lowerTokens(col(textCol))
    val base = docs.select(col(idCol), toks.as("_toks")).select(
      col(idCol), size(col("_toks")).as("dl"), col("_toks"))
    // postings restricted to query terms before the shuffle
    val hits = base
      .select(col(idCol), col("dl"), explode(col("_toks")).as("term"))
      .where(col("term").isin(qTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfT = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val w = idf * col("tf") * (k1 + 1.0) /
      (col("tf") + (col("dl") / col("avgdl") * b + (1.0 - b)) * k1)
    hits
      .crossJoin(broadcast(stats))
      .join(broadcast(dfT), "term")
      .groupBy(col(idCol))
      .agg(round(sum(w), roundDp).as("bm25"), count(lit(1)).as("terms_hit"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Top `k` keywords of every document by smoothed TF-IDF
    * (idf = ln((1+N)/(1+df)) + 1), ties broken by term. Emits
    * (idCol, term, tfidf) — the keyword-extraction shape.
    */
  def topTfidfTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 1, roundDp: Int = 4): DataFrame = {
    val post = postings(docs, idCol, textCol)
    val dfT = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1.0
    val scored = post
      .join(dfT, "term")
      .crossJoin(broadcast(stats))
      .withColumn("tfidf", round(col("tf") * idf, roundDp))
    // per-doc top-k: window partitioned on the HIGH-cardinality doc id —
    // scales to any corpus (this is not the low-cardinality-partition
    // single-task sort shape; every doc sorts its own vocabulary-sized
    // group).
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rk", row_number().over(win))
      .where(col("rk") <= k)
      .select(col(idCol), col("term"), col("tfidf"), col("rk").cast("long").as("rk"))
  }
}
