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
/** Wire codec for `aConditions` values — the server-side predicate seam
  * extended beyond the reference's equality-only conditions
  * (/root/reference/limesurvey.py:214 passes a flat attr→value map).
  * Equality ships as the RAW value, so the reference-shaped clients
  * (the paged catalog scan's user-supplied condition maps) keep working
  * unchanged. Extended operators ship with an `op:` prefix on the
  * value: `gt:`/`ge:`/`lt:`/`le:` compare lexicographically (every
  * participant column is a string). Java String order only matches
  * Spark's UTF8String order when the first differing position involves
  * an ASCII unit, so the connector ENFORCES pure-ASCII bounds: a
  * non-ASCII range value never pushes and stays a residual Spark
  * filter (see LimeSurveyScanBuilder.pushFilters). `in:` carries
  * unit-separator-joined () operands. A literal equality value
  * that happens to LOOK like an operator prefix is never pushed by the
  * connector (it stays a residual Spark filter), so the server may
  * parse prefixes unconditionally. One condition per attribute — the
  * map key is the attribute, as in the reference API. */
object ConditionCodec {
  val InSep = ""
  private val Ops = Seq("gt:", "ge:", "lt:", "le:", "in:")
  def looksEncoded(v: String): Boolean = Ops.exists(v.startsWith)
  def matches(cond: String, actual: String): Boolean =
    if (cond.startsWith("gt:")) actual > cond.substring(3)
    else if (cond.startsWith("ge:")) actual >= cond.substring(3)
    else if (cond.startsWith("lt:")) actual < cond.substring(3)
    else if (cond.startsWith("le:")) actual <= cond.substring(3)
    else if (cond.startsWith("in:"))
      cond.substring(3).split(InSep, -1).contains(actual)
    else actual == cond
}

object Transports {

  def fromSpec(spec: String): Transport = spec match {
    case "http" => new HttpTransport
    case s if s.startsWith("file:") => new FileServerTransport(s.stripPrefix("file:"))
    case other => throw new IllegalArgumentException(
      s"unknown transport spec '$other' (expected 'http' or 'file:<dir>')")
  }

  /** Replays canned per-method replies, emulating the server-side
    * handling of paging AND condition parameters (`aConditions`
    * equality filters apply BEFORE paging, as the real endpoint's SQL
    * WHERE would). Serializable: executors construct it from the spec
    * string. The last request envelope per JVM is recorded in
    * [[FileServerTransport.lastBody]] so specs can assert pushdown
    * reached the wire. */
  final class FileServerTransport(dir: String) extends Transport with Serializable {
    def post(url: String, body: String): String = {
      FileServerTransport.lastBody.set(body)
      FileServerTransport.record(body)
      val mapper = new ObjectMapper
      val req = mapper.readTree(body)
      val method = req.get("method").asText()
      val path = Paths.get(dir, s"$method.json")
      if (!Files.exists(path))
        throw new RuntimeException(s"fake server has no handler file for '$method'")
      val raw = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      val params = req.get("params")
      val needsPaging = params != null && params.has("iStart") && params.has("iLimit")
      val conds = if (params != null && params.has("aConditions") &&
          params.get("aConditions").isObject) {
        val it = params.get("aConditions").fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
      } else Map.empty[String, String]
      if (!needsPaging && conds.isEmpty) return raw
      val reply = mapper.readTree(raw)
      reply.get("result") match {
        case arr: ArrayNode =>
          // conditions ([[ConditionCodec]]: raw equality or op-prefixed
          // range/in) match top-level fields or participant_info
          def matches(n: com.fasterxml.jackson.databind.JsonNode): Boolean =
            conds.forall { case (k, v) =>
              val direct = Option(n.get(k))
              val nested = Option(n.get("participant_info")).flatMap(i => Option(i.get(k)))
              direct.orElse(nested)
                .exists(node => ConditionCodec.matches(v, node.asText()))
            }
          val filtered = mapper.createArrayNode()
          arr.elements().forEachRemaining(e => if (matches(e)) { filtered.add(e); () })
          val page = if (needsPaging) {
            val start = params.get("iStart").asInt()
            val limit = params.get("iLimit").asInt()
            val p = mapper.createArrayNode()
            var i = start
            while (i < math.min(filtered.size(), start + limit)) {
              p.add(filtered.get(i)); i += 1
            }
            p
          } else filtered
          val out = reply.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          out.set("result", page)
          mapper.writeValueAsString(out)
        case _ => raw
      }
    }
  }

  object FileServerTransport {
    /** Last request body seen by any FileServerTransport in this JVM —
      * spec-only observability (local mode shares the JVM). */
    val lastBody = new java.util.concurrent.atomic.AtomicReference[String]("")

    /** Recent (nanoTime, body) posts in this JVM — lets write-path specs
      * assert RPC counts AND inter-arrival pacing. Test-only state:
      * clear before the scenario under test. BOUNDED (drops oldest past
      * the cap) so a long-lived file-transport process — a Verify run, a
      * paged pipeline — can't leak heap into an observability buffer it
      * never reads. */
    val posts = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    private val MaxPosts = 4096

    private[Transports] def record(body: String): Unit = {
      posts.add((System.nanoTime(), body))
      while (posts.size() > MaxPosts) posts.poll()
    }
  }
}
