package graft.functions

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.TestSpark
import graft.catalog.{Catalog, ColumnDef, EmbeddingIndex, GraftTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit: the remote-provider surface × the catalog.
  *
  * 1. Remote embeddings as a STORED computed column feeding an embedding
  *    index through DML — the reference's other flagship index path
  *    (`add_embedding_index(embedding=openai.embeddings.using(...))`,
  *    reference `functions/openai.py` + `index/embedding_index.py`),
  *    where the embedding server is an external API rather than a local
  *    model. Pins: backfill on index creation calls the server for every
  *    existing row, inserts embed only the new rows, batchUpdate
  *    re-embeds the touched row, search ranks by the server's vectors at
  *    every step, and revert restores the pre-update ranking without new
  *    server calls.
  *
  * 2. BM25 candidate generation × the rerank protocol — retrieval hands
  *    a bounded candidate list to a remote reranker (the jina/voyage
  *    pattern: cheap lexical recall, expensive neural precision). Pins:
  *    the candidate array rides one rerank POST per query row, indices
  *    map back to the right documents, and the reranked order differs
  *    from the BM25 order (the reranker actually reordered).
  */
class ProviderInteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def sendJson(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  /** Deterministic 3-dim "model": 1 + counts of 'a'/'g'/'z' — distinct,
    * well-separated directions for the fixture texts (a pure
    * length/first-char embedding made "bz" and "bw" collide exactly).
    */
  private def fakeEmbed(t: String): Seq[Double] =
    Seq('a', 'g', 'z').map(c => 1.0 + t.count(_ == c))

  test("remote embeddings as a stored computed column: backfill, insert, update, revert, search") {
    val calls = new AtomicInteger(0)
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/embeddings", (ex: HttpExchange) => {
      if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer emb-key")
        sendJson(ex, 401, """{"error":"unauthorized"}""")
      else {
        val req = mapper.readTree(ex.getRequestBody)
        val in = req.get("input")
        val data = (0 until in.size()).map { i =>
          calls.incrementAndGet()
          val v = fakeEmbed(in.get(i).asText())
          s"""{"index":$i,"embedding":[${v.mkString(",")}]}"""
        }
        sendJson(ex, 200, s"""{"data":[${data.mkString(",")}]}""")
      }
    })
    srv.start()
    try {
      val cfg = Providers.ProviderConfig(
        s"http://127.0.0.1:${srv.getAddress.getPort}", "emb-model",
        apiKey = "emb-key")
      // the computed-column hook: a SQL UDF that posts to the provider —
      // the per-row analog of registerEmbedUdf (bulk backfills would ride
      // Providers.withEmbeddings; the catalog contract only needs a SQL
      // expression)
      spark.udf.register("remote_embed", (text: String) =>
        if (text == null) null
        else {
          // "[5.0,97.0,1.0]" → Seq[Double]; no ObjectMapper in the closure
          // (Jackson isn't serializable; the UDF ships to executors)
          val json = Providers.embedBatch(cfg)(Seq(text)).head
          json.stripPrefix("[").stripSuffix("]").split(",").toSeq
            .filter(_.nonEmpty).map(_.trim.toDouble)
        })

      val cat = new Catalog(
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      val t = GraftTable.create(spark, cat, "docs", Seq(
        ColumnDef("id", "bigint"), ColumnDef("text", "string")))
      t.insert(Seq((1L, "alpha"), (2L, "bz"), (3L, "gamma ray")).toDF("id", "text"))

      // index creation backfills all 3 existing rows through the server
      val idx = EmbeddingIndex.create(t, "text", "remote_embed(text)")
      assert(calls.get() == 3, s"backfill calls: ${calls.get()}")
      val near = idx.search(fakeEmbed("bz"), 1).select("id").as[Long].collect()
      assert(near.toSeq == Seq(2L)) // exact direction match, cos = 1

      // inserts embed ONLY the new row
      t.insert(Seq((4L, "bw")).toDF("id", "text"))
      assert(calls.get() == 4, s"insert calls: ${calls.get()}")
      val near2 = idx.search(fakeEmbed("bz"), 2).select("id").as[Long].collect()
      assert(near2.toSeq == Seq(2L, 4L)) // [1,1,1] is next-nearest to [1,1,2]

      // update re-embeds the touched row; ranking follows the NEW text
      val beforeUpdate = calls.get()
      val vBeforeUpdate = t.meta.currentVersion
      t.batchUpdate(Seq((2L, "zzzzzzzz")).toDF("id", "text"), Seq("id"))
      assert(calls.get() > beforeUpdate)
      val near3 = idx.search(fakeEmbed("bz"), 1).select("id").as[Long].collect()
      assert(near3.toSeq == Seq(4L)) // row 2 moved away in embedding space

      // revert restores the pre-update vectors WITHOUT new server calls
      // (the stored column is versioned data, not a recompute)
      val beforeRevert = calls.get()
      t.revert(vBeforeUpdate)
      val near4 = idx.search(fakeEmbed("bz"), 1).select("id").as[Long].collect()
      assert(near4.toSeq == Seq(2L))
      assert(calls.get() == beforeRevert, "revert must not re-embed")
    } finally srv.stop(0)
  }

  test("bm25 candidates rerank through the provider: indices map back, order changes") {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/v1/rerank", (ex: HttpExchange) => {
      if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer rr-key")
        sendJson(ex, 401, """{"error":"unauthorized"}""")
      else {
        val req = mapper.readTree(ex.getRequestBody)
        val q = req.get("query").asText().toLowerCase.split("\\s+").toSet
        val docs = req.get("documents")
        // "neural" scorer: exact word overlap with the query — deliberately
        // different from BM25's tf/idf weighting so the order can flip
        val scored = (0 until docs.size()).map { i =>
          val words = docs.get(i).asText().toLowerCase.split("\\s+").toSet
          i -> (q & words).size.toDouble
        }.sortBy { case (i, s) => (-s, i) }
        val items = scored.map { case (i, s) =>
          s"""{"index":$i,"relevance_score":$s}"""
        }
        sendJson(ex, 200, s"""{"results":[${items.mkString(",")}]}""")
      }
    })
    srv.start()
    try {
      val cfg = Providers.ProviderConfig(
        s"http://127.0.0.1:${srv.getAddress.getPort}", "rr-model",
        apiKey = "rr-key")
      // doc 12 hits only the RARE term "skew" (high idf — wins BM25);
      // doc 10 overlaps three COMMON query words (wins the overlap
      // reranker): the idf-vs-coverage disagreement that motivates the
      // rerank stage in real retrieval stacks
      val docs = Seq(
        (10L, "spark shuffle partition"),
        (11L, "spark shuffle here"),
        (12L, "skew skew skew"),
        (13L, "spark partition words"),
        (14L, "spark other things"),
      ).toDF("doc_id", "text")
      val query = "spark shuffle partition skew"

      val candidates = Ranking.bm25(docs, "doc_id", "text", query, topK = 3)
      val bmOrder = candidates.select("doc_id").as[Long].collect().toSeq
      assert(bmOrder.head == 12L, s"bm25 order: $bmOrder") // rare-term doc wins lexical

      // assemble ONE rerank row: the query + candidate texts in bm25 order
      // (bounded: topK ≤ 100 — the fusion-join shape from q110)
      val cand = candidates.join(docs, "doc_id")
        .select(col("doc_id"), col("text"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .collect()
      val row = Seq((query, cand.map(_.getString(1)).toSeq))
        .toDF("query", "docs")
      val out = Providers.withRerank(row, "query", "docs", "ranked", cfg,
          path = "/v1/rerank")
        .select("ranked", "ranked_errormsg").collect().head
      assert(out.getString(1) == null, s"rerank error: ${out.getString(1)}")
      val ranked = mapper.readTree(out.getString(0))
      val rerankedDocIds = (0 until ranked.size())
        .map(i => cand(ranked.get(i).get("index").asInt()).getLong(0))
      assert(rerankedDocIds.head == 10L, s"reranked: $rerankedDocIds")
      assert(rerankedDocIds != bmOrder) // the reranker actually reordered
    } finally srv.stop(0)
  }
}
