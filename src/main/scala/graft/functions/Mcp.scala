package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** MCP (Model Context Protocol) tool integration — the reference registers
  * an MCP server's tools as callable UDFs (`/root/reference/pixeltable/
  * func/mcp.py`, 211 LoC: `mcp_udfs(url)` → one udf per declared tool).
  * This is the stdio-transport analog: newline-delimited JSON-RPC 2.0 to a
  * subprocess server — `initialize` handshake, `tools/list` discovery,
  * `tools/call` invocation — with each tool exposed as a Spark UDF whose
  * argument is the tool's JSON arguments object and whose result is the
  * tool's text content.
  *
  * Scale/deployment shape: one client (and server subprocess) per executor
  * JVM, created lazily on first use and cached by command line — rows
  * never serialize a connection, and a 1000-executor job runs 1000 local
  * sidecars, the standard sidecar-tool pattern. Calls are synchronous
  * per row (matching the reference's per-row invocation); wrap hot paths
  * in `AsyncBatcher` when the server supports concurrency.
  */
object Mcp {

  /** Minimal newline-delimited JSON-RPC 2.0 client over a subprocess'
    * stdin/stdout (the MCP stdio transport). Thread-safe: requests are
    * serialized — MCP stdio has no interleaving guarantee and tool calls
    * are request/response.
    */
  final class McpClient(cmd: Seq[String]) extends AutoCloseable {
    private val mapper = new ObjectMapper()
    private val proc = {
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      pb.start()
    }
    private val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, UTF_8))
    private val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, UTF_8))
    private val ids = new AtomicLong(0L)

    private def send(node: JsonNode): Unit = {
      out.write(mapper.writeValueAsString(node)); out.write("\n"); out.flush()
    }

    private def request(method: String, params: JsonNode): JsonNode =
      this.synchronized {
        val id = ids.incrementAndGet()
        val req = mapper.createObjectNode()
        req.put("jsonrpc", "2.0").put("id", id).put("method", method)
        req.set[JsonNode]("params", params)
        send(req)
        var resp: JsonNode = null
        while (resp == null) {
          val line = in.readLine()
          require(line != null, s"MCP server closed stream during $method")
          if (line.trim.nonEmpty) {
            val n = mapper.readTree(line)
            // skip server-initiated notifications; match our request id
            if (n.has("id") && n.get("id").asLong() == id) resp = n
          }
        }
        require(!resp.has("error") || resp.get("error").isNull,
          s"MCP $method failed: ${resp.get("error")}")
        resp.get("result")
      }

    private def notifyPeer(method: String): Unit = this.synchronized {
      val n = mapper.createObjectNode()
      n.put("jsonrpc", "2.0").put("method", method)
      send(n)
    }

    /** MCP initialize handshake; returns the server's declared info. */
    def initialize(): JsonNode = {
      val params = mapper.createObjectNode()
      params.put("protocolVersion", "2024-11-05")
      params.set[JsonNode]("capabilities", mapper.createObjectNode())
      params.set[JsonNode]("clientInfo", mapper.createObjectNode()
        .put("name", "graft").put("version", "0.1"))
      val r = request("initialize", params)
      notifyPeer("notifications/initialized")
      r
    }

    /** Declared tools: (name, description, input schema JSON). */
    def listTools(): Seq[(String, String, String)] = {
      val r = request("tools/list", new ObjectMapper().createObjectNode())
      val tools = r.get("tools")
      (0 until tools.size()).map { i =>
        val t = tools.get(i)
        (t.get("name").asText(),
          Option(t.get("description")).map(_.asText()).getOrElse(""),
          Option(t.get("inputSchema")).map(_.toString).getOrElse("{}"))
      }
    }

    /** Invoke a tool with a JSON arguments object; returns the
      * concatenated text content (the reference returns content[0]
      * likewise for text results).
      */
    def callTool(tool: String, argumentsJson: String): String = {
      val params = mapper.createObjectNode()
      params.put("name", tool)
      params.set[JsonNode]("arguments", mapper.readTree(
        if (argumentsJson == null || argumentsJson.isEmpty) "{}" else argumentsJson))
      val r = request("tools/call", params)
      require(!Option(r.get("isError")).exists(_.asBoolean(false)),
        s"tool $tool returned error: $r")
      val content = r.get("content")
      (0 until content.size()).flatMap { i =>
        val c = content.get(i)
        if (c.get("type").asText() == "text") Some(c.get("text").asText()) else None
      }.mkString
    }

    override def close(): Unit = {
      try { out.close(); in.close() } catch { case _: java.io.IOException => () }
      proc.destroy()
      if (!proc.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
    }
  }

  // one client per (JVM, server command): executors reuse a live sidecar
  private val clients = mutable.Map.empty[Seq[String], McpClient]

  /** Get-or-start the JVM's client for `cmd` (initialized). */
  def client(cmd: Seq[String]): McpClient = clients.synchronized {
    clients.getOrElseUpdate(cmd, {
      val c = new McpClient(cmd)
      c.initialize()
      c
    })
  }

  /** Shut down every cached client (tests / JVM teardown). */
  def closeAll(): Unit = clients.synchronized {
    clients.values.foreach(_.close()); clients.clear()
  }

  /** A declared MCP tool as a Spark UDF: argument = the tool's JSON
    * arguments object (build with `to_json(struct(...))`), result = the
    * tool's text content. The command line travels in the closure; the
    * client/subprocess starts lazily per executor JVM.
    */
  def toolUdf(serverCmd: Seq[String], tool: String): Column => Column = {
    val f = udf { (argsJson: String) =>
      if (argsJson == null) null else client(serverCmd).callTool(tool, argsJson)
    }
    (args: Column) => f(args)
  }
}
