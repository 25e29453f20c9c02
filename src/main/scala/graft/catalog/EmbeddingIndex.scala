package graft.catalog

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding index over a table column (reference
  * `/root/reference/pixeltable/index/embedding_index.py`): declared as a
  * stored computed column producing `array<float>`, searched with
  * cosine / inner-product / L2 similarity.
  *
  * The stored column is the index: at query time `search` is a
  * TakeOrderedAndProject over the scan (per-partition top-k heaps, merged on
  * the driver — no global sort, no shuffle of the full table). For 100 TB,
  * `searchClustered` prunes to a cluster column first (IVF layout: partition
  * the table by cluster id so the probe is a partition-pruned scan).
  */
final class EmbeddingIndex(
    val table: GraftTable,
    val column: String,
    val metric: String,
    // maps a STRING query into the index's embedding space — the
    // reference's `similarity("query text")` form, where the index's own
    // embed fn runs on the query (embedding_index.py similarity());
    // None = vector-only index
    val queryEmbedder: Option[String => Seq[Double]] = None,
) {
  def search(query: Seq[Double], k: Int): DataFrame =
    VectorFunctions.topK(table.read(), col(column), query, k, metric)

  /** `similarity("text")`: embed the query string with the index's own
    * embedder (driver-side — ONE vector), then the normal vector search.
    */
  def searchText(query: String, k: Int): DataFrame = {
    val f = queryEmbedder.getOrElse(throw new IllegalArgumentException(
      s"index over ${table.name}.$column has no query embedder — " +
        "string similarity() needs one (pass queryEmbedder at create)"))
    search(f(query), k)
  }

  def searchClustered(clusterCol: String, probe: Seq[Int],
      query: Seq[Double], k: Int): DataFrame =
    VectorFunctions.topKClustered(table.read(), col(clusterCol), probe,
      col(column), query, k)

  /** Learn the IVF layout: fit k-means over the stored embeddings and
    * return the model — `graft.operators.KMeans.assign` materializes the
    * cluster column (partition/bucket the table by it for pruned probes).
    */
  def buildIvf(idCol: String, k: Int, maxIter: Int = 10): graft.operators.KMeans.Model =
    graft.operators.KMeans.fit(table.read(), column, idCol, k, maxIter)

  /** Probe the `nprobe` clusters nearest to the query (by centroid
    * distance) and rank inside them — the full IVF search path.
    */
  def searchIvf(model: graft.operators.KMeans.Model, clusterCol: String,
      query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val byDist = model.centroids.zipWithIndex.sortBy { case (c, _) =>
      c.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum
    }
    searchClustered(clusterCol, byDist.take(nprobe).map(_._2), query, k)
  }
}

object EmbeddingIndex {
  /** Adds the stored embedding column (backfilling existing rows) and
    * returns the index handle. `embedExprSql` maps source columns to an
    * `array<float>` — at 100 TB this is where a model UDF plugs in.
    */
  def create(table: GraftTable, indexedCol: String, embedExprSql: String,
      metric: String = "cosine",
      queryEmbedder: Option[String => Seq[Double]] = None): EmbeddingIndex = {
    val embCol = s"${indexedCol}_idx_emb"
    if (!table.meta.columns.exists(_.name == embCol))
      table.addColumn(ColumnDef(embCol, "array<float>", Some(embedExprSql)))
    new EmbeddingIndex(table, embCol, metric, queryEmbedder)
  }

  /** CLIP text-tower query embedder (the reference's clip-indexed
    * `similarity("text")`): the bundle loads lazily ON THE DRIVER and is
    * reused across queries — embedding one query string is driver math,
    * the search itself stays a TakeOrdered over the scan.
    */
  def clipTextEmbedder(modelDir: String): String => Seq[Double] = {
    lazy val bundle = graft.ml.LocalModels.loadClip(modelDir)
    (q: String) =>
      bundle.model.textEmbed(Seq(bundle.encodeText(q)))
        .head.map(_.toDouble).toSeq
  }
}
