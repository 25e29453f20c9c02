package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, udf}

import graft.operators.AsyncBatcher

/** LLM tool-calling surface — the reference's `Tool` / `Tools` /
  * `ToolChoice` containers plus `invoke_tools`
  * (`/root/reference/pixeltable/func/tools.py:27-127`,
  * `functions/openai.py:1369-1410`): local functions are advertised to the
  * model in the OpenAI tools wire format, the chat response's `tool_calls`
  * are normalized to the standardized `{tool: [{args: {...}}]}` shape, and
  * invocation executes the matching Scala functions per row, executor-side.
  *
  * Spark shape: the chat leg rides `AsyncBatcher` (bounded in-flight,
  * retries, per-cell errors) like every provider call; the invoke leg is a
  * plain UDF — pure JSON-in/JSON-out, no I/O — so it stays inside the
  * task with no extra shuffle or driver involvement.
  */
object Tools {

  /** One declared parameter of a tool (JSON-schema type: "string",
    * "integer", "number", "boolean", "object", "array").
    */
  final case class ToolParam(name: String, jsonType: String,
      required: Boolean = true, description: String = "")

  /** A callable tool: wire metadata + the Scala implementation. Args arrive
    * decoded per the declared ToolParam types (String / Long / Double /
    * Boolean; "object"/"array" as their JSON string); the return value is
    * JSON-encoded into the result (String, numbers, Boolean, Seq, Map,
    * null).
    */
  final case class Tool(name: String, description: String,
      params: Seq[ToolParam], fn: Map[String, Any] => Any)

  /** Mirror of the reference's ToolChoice: exactly one of auto / required /
    * a forced tool.
    */
  final case class ToolChoice(auto: Boolean = false, required: Boolean = false,
      tool: Option[String] = None, parallelToolCalls: Boolean = true)

  /** Validated choice builder (reference `Tools.choice`): the forced tool
    * must be one of the declared tools.
    */
  def choice(tools: Seq[Tool], auto: Boolean = false, required: Boolean = false,
      tool: Option[String] = None, parallelToolCalls: Boolean = true): ToolChoice = {
    require(Seq(auto, required, tool.isDefined).count(identity) == 1,
      "exactly one of auto, required, or tool must be specified")
    tool.foreach(t => require(tools.exists(_.name == t),
      s"tool '$t' is not in the declared tool list"))
    ToolChoice(auto, required, tool, parallelToolCalls)
  }

  private val mapper = new ObjectMapper()

  /** OpenAI wire format for the request's `tools` field. */
  private[functions] def toolsJson(tools: Seq[Tool]): ArrayNode = {
    val arr = mapper.createArrayNode()
    tools.foreach { t =>
      val f = arr.addObject().put("type", "function").putObject("function")
      f.put("name", t.name).put("description", t.description)
      val ps = f.putObject("parameters")
      ps.put("type", "object")
      val props = ps.putObject("properties")
      t.params.foreach { p =>
        val pn = props.putObject(p.name).put("type", p.jsonType)
        if (p.description.nonEmpty) pn.put("description", p.description)
      }
      val req = ps.putArray("required")
      t.params.filter(_.required).foreach(p => req.add(p.name))
      ps.put("additionalProperties", false)
    }
    arr
  }

  /** Chat completions carrying tools: returns the assistant MESSAGE object
    * as raw JSON per prompt (content + any tool_calls) — not just the text,
    * so the invoke leg has the calls.
    */
  def chatWithToolsBatch(cfg: Providers.ProviderConfig, tools: Seq[Tool],
      toolChoice: Option[ToolChoice] = None, system: Option[String] = None)
      (prompts: Seq[String]): Seq[String] =
    prompts.map { p =>
      val req = mapper.createObjectNode()
      req.put("model", cfg.model)
      val msgs = req.putArray("messages")
      system.foreach(s => msgs.addObject().put("role", "system").put("content", s))
      msgs.addObject().put("role", "user").put("content", p)
      req.set[ObjectNode]("tools", toolsJson(tools))
      toolChoice.foreach { c =>
        if (c.tool.isDefined)
          req.putObject("tool_choice").put("type", "function")
            .putObject("function").put("name", c.tool.get)
        else req.put("tool_choice", if (c.required) "required" else "auto")
        if (!c.parallelToolCalls) req.put("parallel_tool_calls", false)
      }
      Providers.postJson(cfg, "/chat/completions", mapper.writeValueAsString(req))
        .get("choices").get(0).get("message").toString
    }

  /** df + assistant-message JSON column (`outputCol`) and
    * `<outputCol>_errormsg` — the tool-calling chat leg.
    */
  def withChatTools(df: DataFrame, promptCol: String, outputCol: String,
      cfg: Providers.ProviderConfig, tools: Seq[Tool],
      toolChoice: Option[ToolChoice] = None,
      system: Option[String] = None): DataFrame =
    AsyncBatcher.mapColumn(df, promptCol, outputCol,
      chatWithToolsBatch(cfg, tools, toolChoice, system), cfg.batch)

  /** Normalize a response/message to the standardized
    * `{tool: [{args:{...}}]}` map (accepts a bare chat message, a full
    * chat-completions response, or a Responses-API output list — reference
    * `_openai_response_to_pxt_tool_calls`), then EXECUTE the matching
    * tools. Output JSON per row: `{tool_name: [result, ...] | null, ...}`
    * with one entry per declared tool (null = not invoked), matching the
    * reference's `invoke_tools` InlineDict shape. Tool errors and malformed
    * JSON surface in `<outputCol>_errormsg`, not as task failures.
    */
  def invokeTools(df: DataFrame, responseCol: String, outputCol: String,
      tools: Seq[Tool]): DataFrame = {
    val run = udf { (response: String) =>
      if (response == null) (null: String, null: String)
      else try {
        val calls = normalizedCalls(mapper.readTree(response))
        val out = mapper.createObjectNode()
        tools.foreach { t =>
          calls.get(t.name) match {
            case None => out.putNull(t.name)
            case Some(argLists) =>
              val arr = out.putArray(t.name)
              argLists.foreach { args =>
                arr.add(toJson(t.fn(decodeArgs(t, args))))
              }
          }
        }
        (mapper.writeValueAsString(out), null: String)
      } catch {
        case e: Exception => (null: String, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    df.withColumn("_tool_out", run(col(responseCol)))
      .withColumn(outputCol, col("_tool_out._1"))
      .withColumn(s"${outputCol}_errormsg", col("_tool_out._2"))
      .drop("_tool_out")
  }

  /** standardized calls: tool name → list of `args` objects */
  private def normalizedCalls(node: JsonNode): Map[String, Seq[JsonNode]] = {
    // full chat response → its first message; Responses API → output list
    val callNodes: Seq[JsonNode] =
      if (node.has("choices"))
        toolCallArray(node.get("choices").get(0).get("message"))
      else if (node.has("output")) {
        val out = node.get("output")
        (0 until out.size()).map(out.get)
          .filter(o => o.has("type") && o.get("type").asText() == "function_call")
      } else toolCallArray(node)
    callNodes.foldLeft(Map.empty[String, Seq[JsonNode]]) { (acc, c) =>
      // chat shape: {"function":{"name":..,"arguments":"json-string"}};
      // responses shape: {"name":..,"arguments":"json-string"}
      val f = if (c.has("function")) c.get("function") else c
      val name = f.get("name").asText()
      val args = mapper.readTree(f.get("arguments").asText())
      acc.updated(name, acc.getOrElse(name, Seq.empty) :+ args)
    }
  }

  private def toolCallArray(msg: JsonNode): Seq[JsonNode] = {
    if (msg == null || !msg.has("tool_calls") || msg.get("tool_calls").isNull)
      Seq.empty
    else {
      val tc = msg.get("tool_calls")
      (0 until tc.size()).map(tc.get)
    }
  }

  /** decode per declared type (reference `_extract_*_tool_arg`): missing or
    * null args are simply absent from the map.
    */
  private def decodeArgs(t: Tool, args: JsonNode): Map[String, Any] =
    t.params.flatMap { p =>
      val v = args.get(p.name)
      if (v == null || v.isNull) None
      else Some(p.name -> (p.jsonType match {
        case "string" => v.asText()
        case "integer" => v.asLong()
        case "number" => v.asDouble()
        case "boolean" => v.asBoolean()
        case _ => v.toString // object/array: JSON string
      }))
    }.toMap

  private def toJson(v: Any): JsonNode = v match {
    case null => mapper.nullNode()
    case n: JsonNode => n
    case s: String => mapper.getNodeFactory.textNode(s)
    case i: Int => mapper.getNodeFactory.numberNode(i)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case f: Float => mapper.getNodeFactory.numberNode(f)
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case m: Map[_, _] =>
      val o = mapper.createObjectNode()
      m.foreach { case (k, x) => o.set[JsonNode](k.toString, toJson(x)) }
      o
    case xs: Seq[_] =>
      val a = mapper.createArrayNode()
      xs.foreach(x => a.add(toJson(x)))
      a
    case other => mapper.getNodeFactory.textNode(other.toString)
  }
}
