package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import graft.lang.Planner
import graft.lang.Planner.{Catalog, QueryError}
import graft.lang.{Lexer, Parser}

/** Minimal HTTP query surface (reference: app/src/query_handler.cpp,
  * request_handler_factory.cpp:45-59):
  *   GET  /health        → 200 {"status":"ok"}
  *   GET  /info          → DB metadata (tables, data version)
  *   POST /query         → SaneQL body → NDJSON response rows
  * Response carries the `data-version` header (≙ DataVersion hot-swap
  * contract) and echoes `X-Request-Id`. Invalid queries → 400 with the
  * typed planner/parser message (≙ the reference's invalid-query corpus).
  *
  * Results stream via `toLocalIterator` — bounded memory on the server,
  * backpressure to Spark (≙ the reference's ThrottledBatchReslicer /
  * materialization cutoff).
  */
final class QueryServer(catalog: Catalog, dataVersion: String, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.getResponseHeaders.set("data-version", dataVersion)
    Option(ex.getRequestHeaders.getFirst("X-Request-Id"))
      .foreach(id => ex.getResponseHeaders.set("X-Request-Id", id))
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** NDJSON sink (reference: exec_node/ndjson_sink.cpp): one JSON object
    * per row, dates rendered `YYYY-MM-DD`, nulls explicit.
    */
  private def toNdjson(df: DataFrame): Iterator[String] = {
    val schema = df.schema
    df.toLocalIterator().asScala.map { row =>
      schema.fields.zipWithIndex.map { case (f, i) =>
        val v =
          if (row.isNullAt(i)) "null"
          else f.dataType.typeName match {
            case "string" => "\"" + jsonEscape(row.getString(i)) + "\""
            case "date" | "timestamp" | "timestamp_ntz" =>
              "\"" + row.get(i).toString.take(10) + "\""
            case "array" | "struct" | "map" => "\"" + jsonEscape(row.get(i).toString) + "\""
            case _ => row.get(i).toString
          }
        "\"" + jsonEscape(f.name) + "\":" + v
      }.mkString("{", ",", "}")
    }
  }

  private implicit class IterShim[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  def start(): Unit = {
    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))

    server.createContext("/info", (ex: HttpExchange) => {
      val tables = catalog.tables.keys.toSeq.sorted
        .map(t => "\"" + t + "\"").mkString("[", ",", "]")
      respond(ex, 200,
        s"""{"dataVersion":"$dataVersion","tables":$tables}""")
    })

    server.createContext("/query", (ex: HttpExchange) => {
      if (ex.getRequestMethod != "POST") respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val wantsArrow = Option(ex.getRequestHeaders.getFirst("Accept"))
          .exists(_.contains("application/vnd.apache.arrow.stream"))
        try {
          val df = Planner.plan(body, catalog)
          if (wantsArrow && ArrowSink.supports(df.schema)) {
            val bos = new java.io.ByteArrayOutputStream()
            ArrowSink.write(df, bos)
            val bytes = bos.toByteArray
            ex.getResponseHeaders.set("Content-Type", "application/vnd.apache.arrow.stream")
            ex.getResponseHeaders.set("data-version", dataVersion)
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
          } else {
            val out = toNdjson(df).mkString("", "\n", "\n")
            respond(ex, 200, out, "application/x-ndjson")
          }
        } catch {
          case e @ (_: QueryError | _: Parser.ParseError | _: Lexer.LexError) =>
            respond(ex, 400,
              s"""{"error":"Bad request","message":"${jsonEscape(e.getMessage)}"}""")
        }
      }
    })

    server.setExecutor(null)
    server.start()
  }

  def stop(): Unit = server.stop(0)
}
