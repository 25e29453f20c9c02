package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A small but protocol-faithful MCP server over stdio (newline-delimited
  * JSON-RPC 2.0): initialize handshake, tools/list, tools/call, plus an
  * unsolicited notification to exercise client skipping. Runs as a child
  * JVM so the client's subprocess transport is tested for real.
  */
object MiniMcpServer {
  def main(args: Array[String]): Unit = {
    val mapper = new ObjectMapper()
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(System.in, "UTF-8"))
    val out = new java.io.PrintStream(System.out, true, "UTF-8")
    def reply(id: JsonNode, result: JsonNode): Unit = {
      val r = mapper.createObjectNode()
      r.put("jsonrpc", "2.0").set[JsonNode]("id", id)
      r.set[JsonNode]("result", result)
      out.println(mapper.writeValueAsString(r))
    }
    var line = in.readLine()
    while (line != null) {
      if (line.trim.nonEmpty) {
        val req = mapper.readTree(line)
        req.get("method").asText() match {
          case "initialize" =>
            val res = mapper.createObjectNode()
            res.put("protocolVersion", "2024-11-05")
            res.set[JsonNode]("capabilities", mapper.createObjectNode())
            res.set[JsonNode]("serverInfo", mapper.createObjectNode()
              .put("name", "mini-mcp").put("version", "1.0"))
            reply(req.get("id"), res)
            // unsolicited notification the client must skip over
            out.println("""{"jsonrpc":"2.0","method":"notifications/log","params":{"msg":"hello"}}""")
          case "notifications/initialized" => // notification: no reply
          case "tools/list" =>
            val res = mapper.readTree(
              """{"tools":[
                |{"name":"upper","description":"uppercase text",
                | "inputSchema":{"type":"object","properties":{"text":{"type":"string"}}}},
                |{"name":"add","description":"sum two numbers",
                | "inputSchema":{"type":"object","properties":{"a":{"type":"number"},"b":{"type":"number"}}}}
                |]}""".stripMargin)
            reply(req.get("id"), res)
          case "tools/call" =>
            val p = req.get("params")
            val tool = p.get("name").asText()
            val a = p.get("arguments")
            val text = tool match {
              case "upper" => a.get("text").asText().toUpperCase
              case "add"   => (a.get("a").asDouble() + a.get("b").asDouble()).toString
              case other   => s"unknown tool $other"
            }
            val res = mapper.createObjectNode()
            val content = mapper.createArrayNode()
            content.add(mapper.createObjectNode().put("type", "text").put("text", text))
            res.set[JsonNode]("content", content)
            res.put("isError", false)
            reply(req.get("id"), res)
          case _ => // ignore unknown notifications
        }
      }
      line = in.readLine()
    }
  }
}

class McpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def serverCmd: Seq[String] = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    Seq(javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.functions.MiniMcpServer")
  }

  test("initialize + tools/list against a real subprocess server") {
    val c = Mcp.client(serverCmd)
    val tools = c.listTools()
    assert(tools.map(_._1).sorted == Seq("add", "upper"))
    assert(tools.find(_._1 == "upper").get._3.contains("\"text\""))
  }

  test("tools/call round-trips text and skips unsolicited notifications") {
    val c = Mcp.client(serverCmd)
    assert(c.callTool("upper", """{"text":"graft"}""") == "GRAFT")
    assert(c.callTool("add", """{"a":2,"b":40.5}""").toDouble == 42.5)
  }

  test("an MCP tool runs as a Spark UDF over a DataFrame") {
    val upper = Mcp.toolUdf(serverCmd, "upper")
    val out = Seq("alpha", "beta", "gamma").toDF("w")
      .withColumn("u", upper(to_json(struct(col("w").as("text")))))
      .orderBy("w")
      .select("u").as[String].collect().toSeq
    assert(out == Seq("ALPHA", "BETA", "GAMMA"))
    Mcp.closeAll() // leave no sidecar behind for later suites
  }
}
