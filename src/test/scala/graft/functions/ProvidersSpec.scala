package graft.functions

import java.net.InetSocketAddress

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic OpenAI-compatible server on localhost (JDK HttpServer):
  * /v1/embeddings returns [len(text), code(first char)] per input with the
  * protocol's out-of-order `data` allowed (emitted reversed), and the first
  * call per process returns 429 + Retry-After to exercise the retry path;
  * /v1/chat/completions echoes the prompt reversed. Auth is enforced.
  */
class ProvidersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()
  @volatile private var flaky = new java.util.concurrent.atomic.AtomicInteger(0)

  private def startServer(): (HttpServer, String) = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def handle(ex: HttpExchange)(f: com.fasterxml.jackson.databind.JsonNode => String): Unit = {
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      if (auth != "Bearer test-key") {
        val b = """{"error":"unauthorized"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(401, b.length); ex.getResponseBody.write(b)
      } else if (flaky.getAndIncrement() == 0) {
        // first request of the test run: rate-limited with a hint
        ex.getResponseHeaders.add("Retry-After", "0")
        val b = """{"error":"rate limited"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(429, b.length); ex.getResponseBody.write(b)
      } else {
        val req = mapper.readTree(ex.getRequestBody)
        val out = f(req).getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, out.length); ex.getResponseBody.write(out)
      }
      ex.close()
    }
    srv.createContext("/v1/embeddings", (ex: HttpExchange) => handle(ex) { req =>
      assert(req.get("model").asText() == "test-embed")
      val inputs = req.get("input")
      val root = mapper.createObjectNode()
      val data = root.putArray("data")
      // reversed order: the client must re-sort by `index`
      ((inputs.size() - 1) to 0 by -1).foreach { i =>
        val t = inputs.get(i).asText()
        val d = data.addObject()
        d.put("index", i)
        val e = d.putArray("embedding")
        e.add(t.length.toDouble)
        e.add(if (t.isEmpty) 0.0 else t.charAt(0).toDouble)
      }
      mapper.writeValueAsString(root)
    })
    srv.createContext("/v1/chat/completions", (ex: HttpExchange) => handle(ex) { req =>
      val msgs = req.get("messages")
      val prompt = msgs.get(msgs.size() - 1).get("content").asText()
      val root = mapper.createObjectNode()
      root.putArray("choices").addObject()
        .putObject("message").put("role", "assistant")
        .put("content", prompt.reverse)
      mapper.writeValueAsString(root)
    })
    // Messages wire shape: x-api-key auth (NOT Authorization: Bearer),
    // anthropic-version pinned, system as a top-level field, response
    // content as typed blocks
    srv.createContext("/v1/messages", (ex: HttpExchange) => {
      val out: Array[Byte] =
        if (ex.getRequestHeaders.getFirst("x-api-key") != "test-key" ||
            ex.getRequestHeaders.getFirst("anthropic-version") == null) {
          val b = """{"error":"unauthorized"}""".getBytes("UTF-8")
          ex.sendResponseHeaders(401, b.length); b
        } else {
          val req = mapper.readTree(ex.getRequestBody)
          assert(req.get("max_tokens").asInt() > 0)
          assert(req.get("system").asText() == "reverse it")
          val prompt = req.get("messages").get(0).get("content").asText()
          val root = mapper.createObjectNode()
          val content = root.putArray("content")
          // two text blocks + a non-text block the client must skip
          content.addObject().put("type", "text").put("text", prompt.reverse)
          content.addObject().put("type", "tool_use").put("id", "t1")
          content.addObject().put("type", "text").put("text", "!")
          val b = mapper.writeValueAsString(root).getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, b.length); b
        }
      ex.getResponseBody.write(out)
      ex.close()
    })
    // Gemini generateContent wire shape: x-goog-api-key auth, model in the
    // URL path, contents/parts request, candidates/content/parts response
    srv.createContext("/v1/models/test-gem:generateContent",
      (ex: HttpExchange) => {
        val out: Array[Byte] =
          if (ex.getRequestHeaders.getFirst("x-goog-api-key") != "test-key") {
            val b = """{"error":"unauthorized"}""".getBytes("UTF-8")
            ex.sendResponseHeaders(401, b.length); b
          } else {
            val req = mapper.readTree(ex.getRequestBody)
            assert(req.get("systemInstruction").get("parts").get(0)
              .get("text").asText() == "reverse it")
            assert(req.get("generationConfig").get("maxOutputTokens").asInt() > 0)
            val prompt = req.get("contents").get(0).get("parts").get(0)
              .get("text").asText()
            val root = mapper.createObjectNode()
            val parts = root.putArray("candidates").addObject()
              .putObject("content").putArray("parts")
            parts.addObject().put("text", prompt.reverse)
            parts.addObject().put("inlineData", "skipped") // non-text part
            parts.addObject().put("text", "!")
            val b = mapper.writeValueAsString(root).getBytes("UTF-8")
            ex.getResponseHeaders.add("Content-Type", "application/json")
            ex.sendResponseHeaders(200, b.length); b
          }
        ex.getResponseBody.write(out)
        ex.close()
      })
    // Bedrock Converse wire shape: bearer auth, model in the URL path,
    // typed content blocks, system as a top-level array
    srv.createContext("/v1/model/test-bdr/converse",
      (ex: HttpExchange) => {
        val out: Array[Byte] =
          if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer test-key") {
            val b = """{"error":"unauthorized"}""".getBytes("UTF-8")
            ex.sendResponseHeaders(403, b.length); b
          } else {
            val req = mapper.readTree(ex.getRequestBody)
            assert(req.get("system").get(0).get("text").asText() == "reverse it")
            assert(req.get("inferenceConfig").get("maxTokens").asInt() > 0)
            val prompt = req.get("messages").get(0).get("content").get(0)
              .get("text").asText()
            val root = mapper.createObjectNode()
            val content = root.putObject("output").putObject("message")
              .put("role", "assistant").putArray("content")
            content.addObject().put("text", prompt.reverse)
            content.addObject().put("toolUse", "skipped")
            content.addObject().put("text", "!")
            val b = mapper.writeValueAsString(root).getBytes("UTF-8")
            ex.getResponseHeaders.add("Content-Type", "application/json")
            ex.sendResponseHeaders(200, b.length); b
          }
        ex.getResponseBody.write(out)
        ex.close()
      })
    // SigV4-authed Converse: the server recomputes the signature over the
    // bindings the client claims (host, date, path, payload) and rejects
    // any mismatch — so a wrong body/date/host cannot carry a valid header
    srv.createContext("/v1/model/test-sig/converse",
      (ex: HttpExchange) => {
        val body = ex.getRequestBody.readAllBytes()
        val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
        val host = ex.getRequestHeaders.getFirst("Host")
        val expect = SigV4.sign("POST", "/v1/model/test-sig/converse", "",
          Seq("content-type" -> "application/json", "host" -> host,
            "x-amz-date" -> amzDate),
          body, "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
          "us-west-2", "bedrock", amzDate)
        val got = ex.getRequestHeaders.getFirst("Authorization")
        val out: Array[Byte] =
          if (got != expect) {
            val b = """{"error":"bad signature"}""".getBytes("UTF-8")
            ex.sendResponseHeaders(403, b.length); b
          } else {
            val req = mapper.readTree(body)
            val prompt = req.get("messages").get(0).get("content").get(0)
              .get("text").asText()
            val root = mapper.createObjectNode()
            root.putObject("output").putObject("message")
              .put("role", "assistant").putArray("content")
              .addObject().put("text", prompt.reverse)
            val b = mapper.writeValueAsString(root).getBytes("UTF-8")
            ex.sendResponseHeaders(200, b.length); b
          }
        ex.getResponseBody.write(out)
        ex.close()
      })
    srv.start()
    (srv, s"http://127.0.0.1:${srv.getAddress.getPort}/v1")
  }

  test("embeddings: native batching, index re-sort, 429 retry, auth, errors") {
    flaky = new java.util.concurrent.atomic.AtomicInteger(0)
    val (srv, endpoint) = startServer()
    try {
      val cfg = Providers.ProviderConfig(endpoint, "test-embed", apiKey = "test-key")
      val docs = Seq("alpha", "be", "", "gamma!").toDF("text")
      val out = Providers.withEmbeddings(docs, "text", "emb", cfg)
        .withColumn("v", from_json(col("emb"),
          org.apache.spark.sql.types.DataType.fromDDL("array<float>")))
        .select("text", "v", "emb_errormsg").collect()
        .map(r => (r.getString(0), Option(r.getSeq[Float](1)).map(_.toSeq), r.getString(2)))
      assert(out.forall(_._3 == null), s"unexpected errors: ${out.toSeq}")
      val byText = out.map(x => x._1 -> x._2.get).toMap
      assert(byText("alpha") == Seq(5.0f, 'a'.toFloat))
      assert(byText("be") == Seq(2.0f, 'b'.toFloat))
      assert(byText("") == Seq(0.0f, 0.0f))
      assert(byText("gamma!") == Seq(6.0f, 'g'.toFloat))
      // bad credentials: per-cell error capture, job does not fail
      val bad = Providers.withEmbeddings(docs, "text", "emb",
        cfg.copy(apiKey = "wrong",
          batch = graft.operators.AsyncBatcher.Config(maxRetries = 0)))
        .select("emb", "emb_errormsg").collect()
      assert(bad.forall(r => r.getString(0) == null && r.getString(1).contains("401")))
    } finally srv.stop(0)
  }

  test("chat completions over a DataFrame with a system prompt") {
    flaky = new java.util.concurrent.atomic.AtomicInteger(1) // no 429 this time
    val (srv, endpoint) = startServer()
    try {
      val cfg = Providers.ProviderConfig(endpoint, "test-chat", apiKey = "test-key")
      val out = Providers.withChatCompletion(
          Seq("stressed", "drawer").toDF("prompt"), "prompt", "answer",
          cfg, system = Some("reverse it"))
        .select("prompt", "answer").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(out == Map("stressed" -> "desserts", "drawer" -> "reward"))
    } finally srv.stop(0)
  }

  test("anthropic Messages wire format: x-api-key auth, system field, text blocks") {
    flaky = new java.util.concurrent.atomic.AtomicInteger(1)
    val (srv, endpoint) = startServer()
    try {
      val cfg = Providers.ProviderConfig(endpoint, "test-msgs", apiKey = "test-key")
      val out = Providers.withAnthropicCompletion(
          Seq("stressed", "drawer").toDF("prompt"), "prompt", "answer",
          cfg, system = Some("reverse it"))
        .select("prompt", "answer").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      // text blocks concatenated, non-text block skipped
      assert(out == Map("stressed" -> "desserts!", "drawer" -> "reward!"))
      // wrong key → per-cell 401 capture, not a job failure
      val bad = Providers.withAnthropicCompletion(
          Seq("x").toDF("prompt"), "prompt", "answer",
          cfg.copy(apiKey = "wrong",
            batch = graft.operators.AsyncBatcher.Config(maxRetries = 0)),
          system = Some("reverse it"))
        .select("answer", "answer_errormsg").collect()
      assert(bad(0).getString(0) == null && bad(0).getString(1).contains("401"))
    } finally srv.stop(0)
  }

  test("gemini generateContent wire format: goog auth, parts, model-in-path") {
    flaky = new java.util.concurrent.atomic.AtomicInteger(1)
    val (srv, endpoint) = startServer()
    try {
      val cfg = Providers.ProviderConfig(endpoint, "test-gem", apiKey = "test-key")
      val out = Providers.withGeminiCompletion(
          Seq("stressed", "drawer").toDF("prompt"), "prompt", "answer",
          cfg, system = Some("reverse it"))
        .select("prompt", "answer").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      // text parts concatenated, non-text part skipped
      assert(out == Map("stressed" -> "desserts!", "drawer" -> "reward!"))
      val bad = Providers.withGeminiCompletion(
          Seq("x").toDF("prompt"), "prompt", "answer",
          cfg.copy(apiKey = "wrong",
            batch = graft.operators.AsyncBatcher.Config(maxRetries = 0)),
          system = Some("reverse it"))
        .select("answer", "answer_errormsg").collect()
      assert(bad(0).getString(0) == null && bad(0).getString(1).contains("401"))
    } finally srv.stop(0)
  }

  test("bedrock Converse wire format: bearer auth, content blocks, system array") {
    flaky = new java.util.concurrent.atomic.AtomicInteger(1)
    val (srv, endpoint) = startServer()
    try {
      val cfg = Providers.ProviderConfig(endpoint, "test-bdr", apiKey = "test-key")
      val out = Providers.withBedrockCompletion(
          Seq("stressed", "drawer").toDF("prompt"), "prompt", "answer",
          cfg, system = Some("reverse it"))
        .select("prompt", "answer").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(out == Map("stressed" -> "desserts!", "drawer" -> "reward!"))
      val bad = Providers.withBedrockCompletion(
          Seq("x").toDF("prompt"), "prompt", "answer",
          cfg.copy(apiKey = "wrong",
            batch = graft.operators.AsyncBatcher.Config(maxRetries = 0)),
          system = Some("reverse it"))
        .select("answer", "answer_errormsg").collect()
      assert(bad(0).getString(0) == null && bad(0).getString(1).contains("403"))
    } finally srv.stop(0)
  }

  test("rerank wire format: jina results / voyage data shapes, top_n, ranked order") {
    // deterministic reranker: relevance = -(abs(len(doc)-len(query))),
    // served in the Jina shape at /v1/rerank and the Voyage shape at
    // /rerank (same request protocol, different response nesting)
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def handleRerank(field: String)(ex: HttpExchange): Unit = {
      if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer rr-key") {
        val b = """{"error":"unauthorized"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(401, b.length); ex.getResponseBody.write(b); ex.close()
        return
      }
      val req = mapper.readTree(ex.getRequestBody)
      assert(req.get("model").asText() == "test-rr")
      val q = req.get("query").asText()
      val docs = req.get("documents")
      val scored = (0 until docs.size())
        .map(i => i -> -math.abs(docs.get(i).asText().length - q.length).toDouble)
        .sortBy { case (i, s) => (-s, i) }
      val topN = if (req.has("top_n")) req.get("top_n").asInt() else scored.size
      val arr = mapper.createObjectNode()
      val items = arr.putArray(field)
      scored.take(topN).foreach { case (i, s) =>
        items.addObject().put("index", i).put("relevance_score", s)
      }
      val b = arr.toString.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    }
    srv.createContext("/v1/rerank", handleRerank("results") _)
    srv.createContext("/rerank", handleRerank("data") _)
    srv.start()
    val endpoint = s"http://127.0.0.1:${srv.getAddress.getPort}"
    try {
      val cfg = Providers.ProviderConfig(endpoint, "test-rr", apiKey = "rr-key")
      val df = Seq(
        ("abcd", Seq("x", "four", "toolong")),     // lens 1,4,7 vs 4
        ("ab", Seq("ab", "abcdef")),               // lens 2,6 vs 2
      ).toDF("query", "docs")
      // Jina nesting, all results
      val jina = Providers.withRerank(df, "query", "docs", "ranked", cfg,
          path = "/v1/rerank")
        .select("query", "ranked", "ranked_errormsg").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
      assert(jina("abcd")._2 == null)
      val parsed = mapper.readTree(jina("abcd")._1)
      assert(parsed.size() == 3 && parsed.get(0).get("index").asInt() == 1)
      assert(parsed.get(0).get("relevance_score").asDouble() == 0.0)
      assert(mapper.readTree(jina("ab")._1).get(0).get("index").asInt() == 0)
      // Voyage nesting + top_n truncation, identical client code
      val voyage = Providers.withRerank(df, "query", "docs", "ranked", cfg,
          topN = 1, path = "/rerank")
        .select("query", "ranked").collect()
        .map(r => r.getString(0) -> mapper.readTree(r.getString(1))).toMap
      assert(voyage("abcd").size() == 1 && voyage("abcd").get(0).get("index").asInt() == 1)
      // auth failure lands per-cell, not as a task failure
      val bad = Providers.withRerank(df.limit(1), "query", "docs", "ranked",
          cfg.copy(apiKey = "wrong",
            batch = graft.operators.AsyncBatcher.Config(maxRetries = 0)),
          path = "/v1/rerank")
        .select("ranked", "ranked_errormsg").collect()
      assert(bad(0).getString(0) == null && bad(0).getString(1).contains("401"))
    } finally srv.stop(0)
  }

  test("bedrock with SigV4: server-verified signature binds host/date/payload") {
    flaky = new java.util.concurrent.atomic.AtomicInteger(1)
    val (srv, endpoint) = startServer()
    try {
      val cfg = Providers.ProviderConfig(endpoint, "test-sig",
        awsRegion = "us-west-2", awsAccessKey = "AKIDEXAMPLE",
        awsSecretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
      val out = Providers.withBedrockCompletion(
          Seq("stressed").toDF("prompt"), "prompt", "answer", cfg)
        .select("answer").collect()
      assert(out(0).getString(0) == "desserts")
      // wrong secret → server-side signature mismatch → per-cell 403
      val bad = Providers.withBedrockCompletion(
          Seq("x").toDF("prompt"), "prompt", "answer",
          cfg.copy(awsSecretKey = "wrong",
            batch = graft.operators.AsyncBatcher.Config(maxRetries = 0)))
        .select("answer", "answer_errormsg").collect()
      assert(bad(0).getString(0) == null && bad(0).getString(1).contains("403"))
    } finally srv.stop(0)
  }
}
