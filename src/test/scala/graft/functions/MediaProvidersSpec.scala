package graft.functions

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic localhost servers for the three async media-generation
  * wire formats (reference functions/bfl.py, replicate.py, fal.py):
  * every task answers Pending/processing/IN_QUEUE on the first poll so
  * the client's poll loop is actually exercised, auth schemes are
  * enforced per protocol (x-key, Bearer, Key), and the BFL image
  * download returns deterministic PNG bytes.
  */
class MediaProvidersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def send(ex: HttpExchange, status: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(status, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }
  private def sendJson(ex: HttpExchange, status: Int, body: String): Unit =
    send(ex, status, body.getBytes("UTF-8"))

  test("bfl wire format: x-key auth, submit, Pending poll, sample download") {
    val polls = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val base = () => s"http://127.0.0.1:${srv.getAddress.getPort}"
    srv.createContext("/flux-dev", (ex: HttpExchange) => {
      if (ex.getRequestHeaders.getFirst("x-key") != "bfl-key")
        sendJson(ex, 401, """{"error":"unauthorized"}""")
      else {
        val req = mapper.readTree(ex.getRequestBody)
        val id = "task-" + req.get("prompt").asText().hashCode.abs
        polls.putIfAbsent(id, new AtomicInteger(0))
        sendJson(ex, 200, s"""{"id":"$id","polling_url":"${base()}/poll/$id"}""")
      }
    })
    srv.createContext("/poll/", (ex: HttpExchange) => {
      if (ex.getRequestHeaders.getFirst("x-key") != "bfl-key")
        sendJson(ex, 401, """{"error":"unauthorized"}""")
      else {
        val id = ex.getRequestURI.getPath.stripPrefix("/poll/")
        if (polls.get(id).getAndIncrement() == 0)
          sendJson(ex, 200, """{"status":"Pending"}""")
        else sendJson(ex, 200,
          s"""{"status":"Ready","result":{"sample":"${base()}/img/$id"}}""")
      }
    })
    srv.createContext("/img/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.stripPrefix("/img/")
      send(ex, 200, Images.solidPng(6, 4, id.length * 1000))
    })
    srv.start()
    try {
      val cfg = Providers.ProviderConfig(
        endpoint = base(), model = "flux-dev", apiKey = "bfl-key",
        batch = graft.operators.AsyncBatcher.Config(batchSize = 2))
      val df = Seq("a red square", "a blue circle").toDF("prompt")
        .withColumn("payload", concat(lit("""{"prompt":""""), col("prompt"), lit(""""}""")))
      val out = Providers.withBflImage(df, "payload", "img", cfg, "/flux-dev")
        .withColumn("png", unbase64(col("img")))
        .select("prompt", "png", "img_errormsg").collect()
      assert(out.length == 2)
      out.foreach { r =>
        assert(r.getString(2) == null, s"errormsg: ${r.getString(2)}")
        val meta = Images.decode(r.getAs[Array[Byte]](1))
        assert(meta.getWidth == 6 && meta.getHeight == 4)
      }
      // every task was polled at least twice (Pending then Ready)
      polls.values().forEach(c => assert(c.get() >= 2))
    } finally srv.stop(0)
  }

  test("replicate wire format: bearer auth, version+input body, processing poll, output json") {
    val polls = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val base = () => s"http://127.0.0.1:${srv.getAddress.getPort}"
    srv.createContext("/predictions", (ex: HttpExchange) => {
      if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer rep-key")
        sendJson(ex, 401, """{"error":"unauthorized"}""")
      else {
        val req = mapper.readTree(ex.getRequestBody)
        assert(req.get("version").asText() == "meta/llama")
        val id = "p" + req.get("input").get("prompt").asText().hashCode.abs
        polls.putIfAbsent(id, new AtomicInteger(0))
        sendJson(ex, 201,
          s"""{"id":"$id","status":"starting","urls":{"get":"${base()}/predictions/$id"}}""")
      }
    })
    srv.createContext("/predictions/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.stripPrefix("/predictions/")
      if (polls.get(id).getAndIncrement() == 0)
        sendJson(ex, 200, s"""{"id":"$id","status":"processing"}""")
      else sendJson(ex, 200,
        s"""{"id":"$id","status":"succeeded","output":["gen:$id"]}""")
    })
    srv.start()
    try {
      val cfg = Providers.ProviderConfig(
        endpoint = base(), model = "meta/llama", apiKey = "rep-key",
        batch = graft.operators.AsyncBatcher.Config(batchSize = 2))
      val df = Seq("""{"prompt":"hello"}""", """{"prompt":"world"}""").toDF("input")
      val out = Providers.withReplicateOutput(df, "input", "result", cfg)
        .select("result", "result_errormsg").collect()
      assert(out.length == 2)
      out.foreach { r =>
        assert(r.getString(1) == null)
        val arr = mapper.readTree(r.getString(0))
        assert(arr.isArray && arr.get(0).asText().startsWith("gen:p"))
      }
      polls.values().forEach(c => assert(c.get() >= 2))
    } finally srv.stop(0)
  }

  test("fal queue wire format: Key auth, status then separate response fetch") {
    val polls = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val base = () => s"http://127.0.0.1:${srv.getAddress.getPort}"
    srv.createContext("/fal-ai/fast-sdxl", (ex: HttpExchange) => {
      if (ex.getRequestHeaders.getFirst("Authorization") != "Key fal-key")
        sendJson(ex, 401, """{"error":"unauthorized"}""")
      else {
        val req = mapper.readTree(ex.getRequestBody)
        val id = "r" + req.get("prompt").asText().hashCode.abs
        polls.putIfAbsent(id, new AtomicInteger(0))
        sendJson(ex, 200, s"""{"request_id":"$id","status_url":"${base()}/status/$id","response_url":"${base()}/resp/$id"}""")
      }
    })
    srv.createContext("/status/", (ex: HttpExchange) => {
      if (ex.getRequestHeaders.getFirst("Authorization") != "Key fal-key")
        sendJson(ex, 401, """{"error":"unauthorized"}""")
      else {
        val id = ex.getRequestURI.getPath.stripPrefix("/status/")
        if (polls.get(id).getAndIncrement() == 0)
          sendJson(ex, 200, """{"status":"IN_QUEUE"}""")
        else sendJson(ex, 200, """{"status":"COMPLETED"}""")
      }
    })
    srv.createContext("/resp/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.stripPrefix("/resp/")
      sendJson(ex, 200, s"""{"images":[{"url":"https://example/$id.png"}],"seed":7}""")
    })
    srv.start()
    try {
      val cfg = Providers.ProviderConfig(
        endpoint = base(), model = "", apiKey = "fal-key",
        batch = graft.operators.AsyncBatcher.Config(batchSize = 2))
      val df = Seq("""{"prompt":"castle"}""").toDF("input")
      val out = Providers.withFalOutput(df, "input", "result", cfg, "fal-ai/fast-sdxl")
        .select("result", "result_errormsg").collect()
      assert(out.length == 1 && out(0).getString(1) == null)
      val res = mapper.readTree(out(0).getString(0))
      assert(res.get("seed").asInt() == 7)
      assert(res.get("images").get(0).get("url").asText().endsWith(".png"))
      polls.values().forEach(c => assert(c.get() >= 2))
    } finally srv.stop(0)
  }

  test("failed generation lands in _errormsg, not a task failure") {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val base = () => s"http://127.0.0.1:${srv.getAddress.getPort}"
    srv.createContext("/predictions", (ex: HttpExchange) => {
      val req = mapper.readTree(ex.getRequestBody)
      val id = "p" + req.get("input").get("prompt").asText().hashCode.abs
      sendJson(ex, 201,
        s"""{"id":"$id","status":"starting","urls":{"get":"${base()}/predictions/$id"}}""")
    })
    srv.createContext("/predictions/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.stripPrefix("/predictions/")
      if (id.contains("bad"))
        sendJson(ex, 200, s"""{"id":"$id","status":"failed","error":"NSFW"}""")
      else sendJson(ex, 200, s"""{"id":"$id","status":"succeeded","output":"ok"}""")
    })
    srv.start()
    try {
      // "badprompt" hashes into an id containing... make it deterministic:
      // route failure on the PROMPT instead via the id the server derives
      val srvPort = srv.getAddress.getPort
      val cfg = Providers.ProviderConfig(
        endpoint = base(), model = "m", apiKey = "",
        // batchSize 1: error capture is per-batch, so per-row isolation
        // of a failed generation needs one-row batches
        batch = graft.operators.AsyncBatcher.Config(batchSize = 1, maxRetries = 0))
      // find a prompt whose task id contains "bad"? simpler: the server
      // fails every id; use two servers? Instead: fail when prompt hash is
      // even — recompute here to know which row should fail
      srv.removeContext("/predictions/")
      srv.createContext("/predictions/", (ex: HttpExchange) => {
        val id = ex.getRequestURI.getPath.stripPrefix("/predictions/")
        if (id.stripPrefix("p").toLong % 2 == 0)
          sendJson(ex, 200, s"""{"id":"$id","status":"failed","error":"NSFW"}""")
        else sendJson(ex, 200, s"""{"id":"$id","status":"succeeded","output":"ok"}""")
      })
      val prompts = Seq("alpha", "beta", "gamma", "delta")
      val df = prompts.map(p => s"""{"prompt":"$p"}""").toDF("input")
      val out = Providers.withReplicateOutput(df, "input", "result", cfg)
        .select("input", "result", "result_errormsg").collect()
      assert(out.length == 4)
      prompts.foreach { p =>
        val row = out.find(_.getString(0).contains(p)).get
        val shouldFail = p.hashCode.abs % 2 == 0
        if (shouldFail) {
          assert(row.getString(1) == null && row.getString(2) != null)
          assert(row.getString(2).contains("NSFW"))
        } else assert(row.getString(1) == "\"ok\"" && row.getString(2) == null)
      }
    } finally srv.stop(0)
  }
}
