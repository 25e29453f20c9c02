package graft.functions

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame

import graft.operators.AsyncBatcher

/** ML/LLM provider surface over the OpenAI-compatible HTTP API — the wire
  * protocol that openai, azure, together, fireworks, vllm, ollama, llama.cpp
  * and most serving stacks speak (the reference ships ~17k LoC of per-vendor
  * wrappers, `/root/reference/pixeltable/functions/openai.py` et al.; this
  * implements the shared protocol once and treats the vendor as an endpoint
  * + model string). Execution rides `AsyncBatcher` — the reference's
  * scheduler semantics: bounded in-flight, token-bucket rate limit, retries
  * with exponential backoff (honoring `Retry-After` on 429/503), per-cell
  * error capture instead of task failure.
  *
  * Embeddings batch natively (one POST per 64 texts — the API's own
  * batching); chat completions post per prompt inside the batch window.
  * Results land as JSON strings (`from_json` to typed columns downstream),
  * keeping the surface schema-stable across models.
  */
object Providers {

  final case class ProviderConfig(
      endpoint: String,       // base URL, e.g. http://host:8080/v1
      model: String,
      apiKey: String = "",    // literal key; prefer apiKeyEnv in production
      apiKeyEnv: String = "", // env var holding the key (wins if set & present)
      timeoutMs: Long = 60000,
      batch: AsyncBatcher.Config = AsyncBatcher.Config(),
      // SigV4 (Bedrock): set awsRegion to sign requests instead of bearer
      // auth; credentials fall back to the standard AWS env vars.
      awsRegion: String = "",
      awsAccessKey: String = "",
      awsSecretKey: String = "") {
    def resolvedKey: String =
      if (apiKeyEnv.nonEmpty) sys.env.getOrElse(apiKeyEnv, apiKey) else apiKey
    def resolvedAwsAccessKey: String =
      if (awsAccessKey.nonEmpty) awsAccessKey
      else sys.env.getOrElse("AWS_ACCESS_KEY_ID", "")
    def resolvedAwsSecretKey: String =
      if (awsSecretKey.nonEmpty) awsSecretKey
      else sys.env.getOrElse("AWS_SECRET_ACCESS_KEY", "")
  }

  /** HTTP error carrying the status and any Retry-After hint. */
  final class ProviderHttpError(val status: Int, val retryAfterMs: Long,
      body: String) extends RuntimeException(s"HTTP $status: ${body.take(200)}")

  private val mapper = new ObjectMapper()

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private[functions] def postJson(cfg: ProviderConfig, path: String,
      body: String): JsonNode = post(cfg, path, body)

  /** Anthropic's protocol revision header — a fixed public constant of the
    * Messages API, not a secret or a vendor SDK artifact.
    */
  private val AnthropicVersion = "2023-06-01"

  private def post(cfg: ProviderConfig, path: String, body: String,
      auth: String = "bearer"): JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(cfg.endpoint + path))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
      .header("Content-Type", "application/json")
    val key = cfg.resolvedKey
    auth match {
      case "anthropic" =>
        // the Messages API authenticates with x-api-key + a pinned
        // anthropic-version instead of an Authorization bearer
        if (key.nonEmpty) b.header("x-api-key", key)
        b.header("anthropic-version", AnthropicVersion)
      case "goog" => // Gemini API key header
        if (key.nonEmpty) b.header("x-goog-api-key", key)
      case "x-key" => // BFL FLUX API key header
        if (key.nonEmpty) b.header("x-key", key)
      case "fal" => // fal queue "Key" auth scheme
        if (key.nonEmpty) b.header("Authorization", s"Key $key")
      case "sigv4" => // AWS SigV4 (Bedrock with IAM credentials)
        val u = URI.create(cfg.endpoint + path)
        val hostHeader =
          if (u.getPort == -1) u.getHost else s"${u.getHost}:${u.getPort}"
        val amzDate = SigV4.amzNow()
        val token = sys.env.get("AWS_SESSION_TOKEN")
        val headers = Seq(
          "content-type" -> "application/json",
          "host" -> hostHeader,
          "x-amz-date" -> amzDate) ++
          token.map("x-amz-security-token" -> _)
        val authz = SigV4.sign("POST", u.getRawPath, "", headers,
          body.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          cfg.resolvedAwsAccessKey, cfg.resolvedAwsSecretKey,
          cfg.awsRegion, "bedrock", amzDate)
        b.header("x-amz-date", amzDate)
        token.foreach(b.header("x-amz-security-token", _))
        b.header("Authorization", authz)
      case _ =>
        if (key.nonEmpty) b.header("Authorization", s"Bearer $key")
    }
    val resp = http.send(
      b.POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2) {
      val retryMs = resp.headers().firstValue("Retry-After")
        .map[Long](s => s.toDouble.toLong * 1000L).orElse(0L)
      if (retryMs > 0 && (resp.statusCode() == 429 || resp.statusCode() == 503))
        Thread.sleep(retryMs) // server-directed pacing, then let retry rerun
      throw new ProviderHttpError(resp.statusCode(), retryMs, resp.body())
    }
    mapper.readTree(resp.body())
  }

  /** One embeddings POST for a batch of texts (the API's native batching);
    * returns one compact JSON float array per input, `data` re-ordered by
    * its `index` field as the protocol allows out-of-order entries.
    */
  def embedBatch(cfg: ProviderConfig)(texts: Seq[String]): Seq[String] = {
    val req = mapper.createObjectNode()
    req.put("model", cfg.model)
    val arr = req.putArray("input")
    texts.foreach(arr.add)
    val data = post(cfg, "/embeddings", mapper.writeValueAsString(req)).get("data")
    val byIndex = (0 until data.size()).map { i =>
      val d = data.get(i)
      d.get("index").asInt() -> d.get("embedding").toString
    }.toMap
    texts.indices.map(byIndex)
  }

  /** One chat completion per prompt (posted sequentially inside the batch
    * window; concurrency comes from AsyncBatcher's in-flight batches).
    */
  def chatBatch(cfg: ProviderConfig, system: Option[String] = None)
      (prompts: Seq[String]): Seq[String] =
    prompts.map { p =>
      val req = mapper.createObjectNode()
      req.put("model", cfg.model)
      val msgs = req.putArray("messages")
      system.foreach(s => msgs.addObject().put("role", "system").put("content", s))
      msgs.addObject().put("role", "user").put("content", p)
      post(cfg, "/chat/completions", mapper.writeValueAsString(req))
        .get("choices").get(0).get("message").get("content").asText()
    }

  /** One Anthropic Messages completion per prompt — the second wire format
    * next to the OpenAI-compatible one (reference `functions/anthropic.py`;
    * the protocol shape is Anthropic's public Messages API: POST
    * `{endpoint}/messages`, `system` as a top-level field, response
    * `content` as typed blocks). Execution, batching, retry, and per-cell
    * error capture are the same AsyncBatcher plumbing — only the
    * request/response mapping differs.
    */
  def anthropicChatBatch(cfg: ProviderConfig, system: Option[String] = None,
      maxTokens: Int = 1024)(prompts: Seq[String]): Seq[String] =
    prompts.map { p =>
      val req = mapper.createObjectNode()
      req.put("model", cfg.model)
      req.put("max_tokens", maxTokens)
      system.foreach(s => req.put("system", s))
      req.putArray("messages").addObject()
        .put("role", "user").put("content", p)
      val content = post(cfg, "/messages", mapper.writeValueAsString(req),
        auth = "anthropic").get("content")
      // concatenate the text blocks (tool_use and other block types pass
      // through silently; tool orchestration lives in functions.Tools)
      (0 until content.size()).map(content.get)
        .filter(b => b.get("type").asText() == "text")
        .map(_.get("text").asText()).mkString
    }

  /** One Gemini generateContent completion per prompt — the third wire
    * format (reference `functions/gemini.py`; the protocol shape is the
    * public Generative Language API: POST
    * `{endpoint}/models/{model}:generateContent`, `contents` with typed
    * `parts`, `systemInstruction` as a top-level field, response
    * `candidates[0].content.parts[].text`).
    */
  def geminiChatBatch(cfg: ProviderConfig, system: Option[String] = None,
      maxTokens: Int = 1024)(prompts: Seq[String]): Seq[String] =
    prompts.map { p =>
      val req = mapper.createObjectNode()
      system.foreach(s => req.putObject("systemInstruction")
        .putArray("parts").addObject().put("text", s))
      req.putArray("contents").addObject()
        .put("role", "user")
        .putArray("parts").addObject().put("text", p)
      req.putObject("generationConfig").put("maxOutputTokens", maxTokens)
      val parts = post(cfg, s"/models/${cfg.model}:generateContent",
        mapper.writeValueAsString(req), auth = "goog")
        .get("candidates").get(0).get("content").get("parts")
      (0 until parts.size()).map(parts.get)
        .filter(_.has("text")).map(_.get("text").asText()).mkString
    }

  /** One Bedrock Converse completion per prompt — the fourth wire format
    * (reference `functions/bedrock.py`; the protocol shape is the public
    * Bedrock Runtime Converse API with API-key bearer auth: POST
    * `{endpoint}/model/{modelId}/converse`, typed `content` blocks,
    * top-level `system` array, response
    * `output.message.content[].text`). Auth: set `awsRegion` for full
    * SigV4 signing with IAM credentials (graft.functions.SigV4), or
    * leave it empty and point `apiKey` at a Bedrock API key (bearer).
    */
  def bedrockConverseBatch(cfg: ProviderConfig, system: Option[String] = None,
      maxTokens: Int = 1024)(prompts: Seq[String]): Seq[String] =
    prompts.map { p =>
      val req = mapper.createObjectNode()
      req.putArray("messages").addObject()
        .put("role", "user")
        .putArray("content").addObject().put("text", p)
      system.foreach(s =>
        req.putArray("system").addObject().put("text", s))
      req.putObject("inferenceConfig").put("maxTokens", maxTokens)
      val content = post(cfg, s"/model/${cfg.model}/converse",
        mapper.writeValueAsString(req),
        auth = if (cfg.awsRegion.nonEmpty) "sigv4" else "bearer")
        .get("output").get("message").get("content")
      (0 until content.size()).map(content.get)
        .filter(_.has("text")).map(_.get("text").asText()).mkString
    }

  /** One rerank POST per (query, documents) row — the reranker wire shape
    * (reference `functions/jina.py:203` and `functions/voyageai.py:155`;
    * the public protocol both vendors speak: POST `{endpoint}{path}` with
    * `{model, query, documents[, top_n]}`, response items each carrying
    * `{index, relevance_score}` sorted by descending relevance — Jina
    * nests them under `results`, Voyage under `data`; both are accepted).
    * Input rows are JSON objects `{"query": …, "documents": [...]}` (see
    * `withRerank`, which packs them from two columns); output is the
    * normalized ranked array `[{index, relevance_score}, …]` as JSON —
    * `from_json(col, "array<struct<index:int,relevance_score:double>>")`
    * downstream.
    */
  def rerankBatch(cfg: ProviderConfig, topN: Int = 0,
      path: String = "/rerank")(rows: Seq[String]): Seq[String] =
    rows.map { row =>
      val in = mapper.readTree(row)
      val req = mapper.createObjectNode()
      req.put("model", cfg.model)
      req.set[JsonNode]("query", in.get("query"))
      req.set[JsonNode]("documents", in.get("documents"))
      if (topN > 0) req.put("top_n", topN)
      val resp = post(cfg, path, mapper.writeValueAsString(req))
      val items = if (resp.has("results")) resp.get("results") else resp.get("data")
      if (items == null || !items.isArray)
        throw new IllegalArgumentException(
          "unrecognized rerank response shape: expected 'results' or 'data' array")
      val arr = mapper.createArrayNode()
      (0 until items.size()).foreach { i =>
        val it = items.get(i)
        if (it.get("index") == null || it.get("relevance_score") == null)
          throw new IllegalArgumentException(
            "unrecognized rerank response shape: item missing index/relevance_score")
        arr.addObject()
          .put("index", it.get("index").asInt())
          .put("relevance_score", it.get("relevance_score").asDouble())
      }
      arr.toString
    }

  // ---- async media-generation wire formats ----------------------------
  //
  // Generation vendors don't answer inline: they return a task handle and
  // the client polls for completion (the reference wraps each vendor SDK:
  // functions/replicate.py, bfl.py, fal.py, runwayml.py, reve.py). Three
  // public protocol shapes cover that family:
  //   1. submit → {id, polling_url} → poll {status: Ready|Pending|…} →
  //      result.sample URL → download     (BFL FLUX; reve is the same shape)
  //   2. submit → {id, urls.get} → poll {status: succeeded|processing|…}
  //      with output inline               (Replicate predictions; runwayml
  //                                        task API is the same shape)
  //   3. submit → {request_id, status_url, response_url} → poll status →
  //      GET response separately          (fal queue)
  // Execution rides the same AsyncBatcher plumbing (bounded in-flight,
  // retry, per-cell error capture); polling happens inside the batch fn.

  private def getJson(cfg: ProviderConfig, url: String,
      headers: Seq[(String, String)]): JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = http.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new ProviderHttpError(resp.statusCode(), 0L, resp.body())
    mapper.readTree(resp.body())
  }

  private def getBytes(cfg: ProviderConfig, url: String,
      headers: Seq[(String, String)]): Array[Byte] = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = http.send(b.GET().build(), HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new ProviderHttpError(resp.statusCode(), 0L,
        new String(resp.body(), java.nio.charset.StandardCharsets.UTF_8))
    resp.body()
  }

  /** BFL-style generate: POST `{endpoint}{path}` (x-key auth) with the
    * per-row payload (a JSON object string, e.g. {"prompt": …}), poll
    * `polling_url` until `status` leaves Pending, download
    * `result.sample`, return the image bytes base64-encoded (decode with
    * `unbase64`). Ready/Pending/moderation/Error statuses follow the
    * public FLUX API; a poll loop that exceeds `maxWaitMs` throws (lands
    * in `_errormsg` via AsyncBatcher, never fails the task).
    */
  def bflGenerateBatch(cfg: ProviderConfig, path: String,
      pollMs: Long = 500, maxWaitMs: Long = 300000)
      (payloads: Seq[String]): Seq[String] =
    payloads.map { payload =>
      val hdrs = Seq("x-key" -> cfg.resolvedKey, "Accept" -> "application/json")
      val sub = post(cfg, path, payload, auth = "x-key")
      val pollUrl = sub.get("polling_url").asText()
      val taskId = sub.get("id").asText()
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var sample: String = null
      while (sample == null) {
        val st = getJson(cfg, pollUrl, hdrs)
        st.get("status").asText() match {
          case "Ready" => sample = st.get("result").get("sample").asText()
          case "Request Moderated" | "Content Moderated" =>
            throw new RuntimeException(s"bfl task $taskId moderated")
          case "Error" | "Failed" | "Task not found" =>
            throw new RuntimeException(s"bfl task $taskId failed: " +
              Option(st.get("error")).map(_.asText()).getOrElse("unknown"))
          case _ => // Pending or unknown: wait
            if (System.nanoTime() > deadline)
              throw new RuntimeException(s"bfl task $taskId timed out")
            Thread.sleep(pollMs)
        }
      }
      java.util.Base64.getEncoder.encodeToString(
        getBytes(cfg, sample, Seq.empty))
    }

  /** Replicate-style prediction: POST `{endpoint}/predictions` with
    * {"version": model, "input": payload} (bearer auth), poll `urls.get`
    * until a terminal status, return the `output` JSON verbatim (the
    * reference's `replicate.run(input, ref=…)` returns the same value).
    */
  def replicateRunBatch(cfg: ProviderConfig, pollMs: Long = 500,
      maxWaitMs: Long = 300000)(payloads: Seq[String]): Seq[String] =
    payloads.map { payload =>
      val req = mapper.createObjectNode()
      req.put("version", cfg.model)
      req.set[JsonNode]("input", mapper.readTree(payload))
      val sub = post(cfg, "/predictions", mapper.writeValueAsString(req))
      val pollUrl = sub.get("urls").get("get").asText()
      val hdrs = Seq("Authorization" -> s"Bearer ${cfg.resolvedKey}")
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var out: String = null
      while (out == null) {
        val st = getJson(cfg, pollUrl, hdrs)
        st.get("status").asText() match {
          case "succeeded" => out = st.get("output").toString
          case "failed" | "canceled" =>
            throw new RuntimeException("replicate prediction " +
              st.get("id").asText() + " " + st.get("status").asText() + ": " +
              Option(st.get("error")).map(_.asText()).getOrElse(""))
          case _ => // starting | processing
            if (System.nanoTime() > deadline)
              throw new RuntimeException("replicate prediction timed out")
            Thread.sleep(pollMs)
        }
      }
      out
    }

  /** fal-queue-style run: POST `{endpoint}/{app}` ("Key …" auth scheme)
    * → {request_id, status_url, response_url}; poll `status_url` until
    * COMPLETED; GET `response_url` for the output JSON.
    */
  def falRunBatch(cfg: ProviderConfig, app: String, pollMs: Long = 500,
      maxWaitMs: Long = 300000)(payloads: Seq[String]): Seq[String] =
    payloads.map { payload =>
      val sub = post(cfg, s"/$app", payload, auth = "fal")
      val hdrs = Seq("Authorization" -> s"Key ${cfg.resolvedKey}")
      val statusUrl = sub.get("status_url").asText()
      val responseUrl = sub.get("response_url").asText()
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var done = false
      while (!done) {
        val st = getJson(cfg, statusUrl, hdrs)
        st.get("status").asText() match {
          case "COMPLETED" => done = true
          case "FAILED" | "CANCELLED" =>
            throw new RuntimeException(s"fal request failed: $st")
          case _ => // IN_QUEUE | IN_PROGRESS
            if (System.nanoTime() > deadline)
              throw new RuntimeException("fal request timed out")
            Thread.sleep(pollMs)
        }
      }
      getJson(cfg, responseUrl, hdrs).toString
    }

  /** df + base64 generated-image column and `<outputCol>_errormsg`. */
  def withBflImage(df: DataFrame, payloadCol: String, outputCol: String,
      cfg: ProviderConfig, path: String): DataFrame =
    AsyncBatcher.mapColumn(df, payloadCol, outputCol,
      bflGenerateBatch(cfg, path), cfg.batch)

  /** df + prediction-output JSON column and `<outputCol>_errormsg`. */
  def withReplicateOutput(df: DataFrame, inputCol: String, outputCol: String,
      cfg: ProviderConfig): DataFrame =
    AsyncBatcher.mapColumn(df, inputCol, outputCol,
      replicateRunBatch(cfg), cfg.batch)

  /** df + fal response JSON column and `<outputCol>_errormsg`. */
  def withFalOutput(df: DataFrame, inputCol: String, outputCol: String,
      cfg: ProviderConfig, app: String): DataFrame =
    AsyncBatcher.mapColumn(df, inputCol, outputCol,
      falRunBatch(cfg, app), cfg.batch)

  /** df + JSON-array embedding column (`outputCol`) and
    * `<outputCol>_errormsg` — cast downstream with
    * `from_json(col, "array<float>")`.
    */
  def withEmbeddings(df: DataFrame, inputCol: String, outputCol: String,
      cfg: ProviderConfig): DataFrame =
    AsyncBatcher.mapColumn(df, inputCol, outputCol, embedBatch(cfg), cfg.batch)

  /** df + completion text column and `<outputCol>_errormsg`. */
  def withChatCompletion(df: DataFrame, promptCol: String, outputCol: String,
      cfg: ProviderConfig, system: Option[String] = None): DataFrame =
    AsyncBatcher.mapColumn(df, promptCol, outputCol, chatBatch(cfg, system),
      cfg.batch)

  /** df + ranked `[{index, relevance_score}]` JSON column (`outputCol`)
    * and `<outputCol>_errormsg`. `queryCol` is a string column, `docsCol`
    * an `array<string>` column; each row posts one rerank request.
    */
  def withRerank(df: DataFrame, queryCol: String, docsCol: String,
      outputCol: String, cfg: ProviderConfig, topN: Int = 0,
      path: String = "/rerank"): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val tmp = outputCol + "__rerank_in"
    val packed = df.withColumn(tmp, to_json(struct(
      col(queryCol).as("query"), col(docsCol).as("documents"))))
    AsyncBatcher.mapColumn(packed, tmp, outputCol,
      rerankBatch(cfg, topN, path), cfg.batch).drop(tmp)
  }

  /** df + Messages-API completion column and `<outputCol>_errormsg`. */
  def withAnthropicCompletion(df: DataFrame, promptCol: String,
      outputCol: String, cfg: ProviderConfig, system: Option[String] = None,
      maxTokens: Int = 1024): DataFrame =
    AsyncBatcher.mapColumn(df, promptCol, outputCol,
      anthropicChatBatch(cfg, system, maxTokens), cfg.batch)

  /** df + generateContent completion column and `<outputCol>_errormsg`. */
  def withGeminiCompletion(df: DataFrame, promptCol: String,
      outputCol: String, cfg: ProviderConfig, system: Option[String] = None,
      maxTokens: Int = 1024): DataFrame =
    AsyncBatcher.mapColumn(df, promptCol, outputCol,
      geminiChatBatch(cfg, system, maxTokens), cfg.batch)

  /** df + Converse completion column and `<outputCol>_errormsg`. */
  def withBedrockCompletion(df: DataFrame, promptCol: String,
      outputCol: String, cfg: ProviderConfig, system: Option[String] = None,
      maxTokens: Int = 1024): DataFrame =
    AsyncBatcher.mapColumn(df, promptCol, outputCol,
      bedrockConverseBatch(cfg, system, maxTokens), cfg.batch)
}
