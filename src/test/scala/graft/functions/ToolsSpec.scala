package graft.functions

import java.net.InetSocketAddress

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tool-calling surface: wire format of the advertised tools, the chat leg
  * carrying tools/tool_choice, and `invokeTools` executing local functions
  * from the response's tool_calls (reference `func/tools.py` +
  * `functions/openai.py` invoke_tools).
  */
class ToolsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private val weather = Tools.Tool("get_weather", "weather for a city",
    Seq(Tools.ToolParam("city", "string")),
    args => s"${args("city")}: sunny")
  private val add = Tools.Tool("add", "add two ints",
    Seq(Tools.ToolParam("a", "integer"), Tools.ToolParam("b", "integer")),
    args => args("a").asInstanceOf[Long] + args("b").asInstanceOf[Long])
  private val boom = Tools.Tool("boom", "always fails",
    Seq.empty, _ => throw new IllegalStateException("kaboom"))

  test("toolsJson wire format and choice validation") {
    val j = Tools.toolsJson(Seq(weather, add))
    assert(j.size() == 2)
    val f0 = j.get(0).get("function")
    assert(j.get(0).get("type").asText() == "function")
    assert(f0.get("name").asText() == "get_weather")
    assert(f0.get("parameters").get("properties").get("city")
      .get("type").asText() == "string")
    assert(f0.get("parameters").get("required").get(0).asText() == "city")
    // exactly one of auto/required/tool; forced tool must be declared
    intercept[IllegalArgumentException](Tools.choice(Seq(weather)))
    intercept[IllegalArgumentException](
      Tools.choice(Seq(weather), auto = true, required = true))
    intercept[IllegalArgumentException](
      Tools.choice(Seq(weather), tool = Some("nope")))
    val c = Tools.choice(Seq(weather, add), tool = Some("add"),
      parallelToolCalls = false)
    assert(c.tool.contains("add") && !c.parallelToolCalls)
  }

  test("chat leg carries tools and invokeTools executes them") {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val req = mapper.readTree(ex.getRequestBody)
      // the request must advertise both tools and the forced choice
      val names = (0 until req.get("tools").size())
        .map(i => req.get("tools").get(i).get("function").get("name").asText())
      assert(names == Seq("get_weather", "add"))
      assert(req.get("tool_choice").get("function").get("name").asText() == "add")
      val root = mapper.createObjectNode()
      val msg = root.putArray("choices").addObject().putObject("message")
      msg.put("role", "assistant").putNull("content")
      val tc = msg.putArray("tool_calls")
      tc.addObject().put("id", "1").put("type", "function")
        .putObject("function").put("name", "add")
        .put("arguments", """{"a": 2, "b": 40}""")
      tc.addObject().put("id", "2").put("type", "function")
        .putObject("function").put("name", "add")
        .put("arguments", """{"a": -1, "b": 1}""")
      val out = mapper.writeValueAsString(root).getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    srv.start()
    try {
      val cfg = Providers.ProviderConfig(
        s"http://127.0.0.1:${srv.getAddress.getPort}/v1", "test-tools")
      val tools = Seq(weather, add)
      val df = Tools.invokeTools(
        Tools.withChatTools(Seq("what is 2+40 and -1+1?").toDF("prompt"),
          "prompt", "msg", cfg, tools,
          toolChoice = Some(Tools.choice(tools, tool = Some("add")))),
        "msg", "results", tools)
      val row = df.select("msg", "results", "results_errormsg").collect().head
      assert(row.getString(2) == null)
      val msg = mapper.readTree(row.getString(0))
      assert(msg.get("tool_calls").size() == 2)
      val res = mapper.readTree(row.getString(1))
      assert(res.get("get_weather").isNull) // declared but not invoked
      assert((0 until res.get("add").size()).map(res.get("add").get(_).asLong())
        == Seq(42L, 0L))
    } finally srv.stop(0)
  }

  test("invokeTools accepts all three response shapes; errors are per-cell") {
    val tools = Seq(weather, add, boom)
    val fullResponse =
      """{"choices":[{"message":{"tool_calls":[
        |{"function":{"name":"get_weather","arguments":"{\"city\":\"Paris\"}"}}]}}]}""".stripMargin
    val bareMessage =
      """{"tool_calls":[{"function":{"name":"get_weather","arguments":"{\"city\":\"Oslo\"}"}}]}"""
    val responsesApi =
      """{"output":[{"type":"function_call","name":"add","arguments":"{\"a\":1,\"b\":2}"},
        |{"type":"message","content":"ignore me"}]}""".stripMargin
    val noCalls = """{"choices":[{"message":{"content":"plain text"}}]}"""
    val failing =
      """{"tool_calls":[{"function":{"name":"boom","arguments":"{}"}}]}"""
    val rows = Tools.invokeTools(
        Seq(fullResponse, bareMessage, responsesApi, noCalls, failing, "not json")
          .toDF("resp"),
        "resp", "out", tools)
      .select("out", "out_errormsg").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(mapper.readTree(rows(0)._1.get).get("get_weather").get(0).asText()
      == "Paris: sunny")
    assert(mapper.readTree(rows(1)._1.get).get("get_weather").get(0).asText()
      == "Oslo: sunny")
    assert(mapper.readTree(rows(2)._1.get).get("add").get(0).asLong() == 3L)
    val none = mapper.readTree(rows(3)._1.get)
    assert(none.get("get_weather").isNull && none.get("add").isNull)
    assert(rows(4)._1.isEmpty && rows(4)._2.get.contains("kaboom"))
    assert(rows(5)._1.isEmpty && rows(5)._2.nonEmpty)
  }
}
