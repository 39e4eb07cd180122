package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode

import graft.sources.LimeSurveyClient.{HttpTransport, Transport}

/** Transport construction from a string spec — the form a DataSource V2
  * connector needs, since executor-side readers only receive string
  * options. Specs:
  *
  *  - `http` — real JSON-RPC POSTs ([[LimeSurveyClient.HttpTransport]])
  *  - `file:<dir>` — a local fake *server*: replies with
  *    `<dir>/<method>.json` and honors `iStart`/`iLimit` paging params
  *    from the request envelope by slicing the canned result array, so
  *    pushdown behavior is observable end-to-end without a network.
  */
object Transports {

  def fromSpec(spec: String): Transport = spec match {
    case "http" => new HttpTransport
    case s if s.startsWith("file:") => new FileServerTransport(s.stripPrefix("file:"))
    case other => throw new IllegalArgumentException(
      s"unknown transport spec '$other' (expected 'http' or 'file:<dir>')")
  }

  /** Replays canned per-method replies, emulating the server-side
    * handling of paging parameters. Serializable: executors construct it
    * from the spec string. */
  final class FileServerTransport(dir: String) extends Transport with Serializable {
    def post(url: String, body: String): String = {
      val mapper = new ObjectMapper
      val req = mapper.readTree(body)
      val method = req.get("method").asText()
      val path = Paths.get(dir, s"$method.json")
      if (!Files.exists(path))
        throw new RuntimeException(s"fake server has no handler file for '$method'")
      val raw = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      val params = req.get("params")
      if (params != null && params.has("iStart") && params.has("iLimit")) {
        val start = params.get("iStart").asInt()
        val limit = params.get("iLimit").asInt()
        val reply = mapper.readTree(raw)
        reply.get("result") match {
          case arr: ArrayNode =>
            val page = mapper.createArrayNode()
            var i = start
            while (i < math.min(arr.size(), start + limit)) {
              page.add(arr.get(i)); i += 1
            }
            val out = reply.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            out.set("result", page)
            mapper.writeValueAsString(out)
          case _ => raw
        }
      } else raw
    }
  }
}
