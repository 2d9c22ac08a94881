package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.lang.Planner.Catalog
import graft.server.QueryServer

class QueryServerSpec extends SparkSpec {
  import spark.implicits._

  lazy val table = Seq(
    ("k1", "Switzerland", 25), ("k2", "Switzerland", 40), ("k3", "Germany", 30))
    .toDF("primary_key", "country", "age")

  lazy val srv: QueryServer = {
    val s = new QueryServer(Catalog(Map("default" -> table)), "v42")
    s.start(); s
  }
  lazy val http = HttpClient.newHttpClient()
  def url(p: String) = URI.create(s"http://127.0.0.1:${srv.boundPort}$p")

  def post(path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(url(path))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("X-Request-Id", "req-7").build(),
      HttpResponse.BodyHandlers.ofString())

  def get(path: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(url(path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("health and info endpoints") {
    assert(get("/health").body() === """{"status":"ok"}""")
    val info = get("/info")
    assert(info.body().contains("\"dataVersion\":\"v42\""))
    assert(info.body().contains("\"default\""))
  }

  test("POST /query runs SaneQL and streams NDJSON with headers") {
    val r = post("/query",
      "default.filter(country = 'Switzerland').groupBy({count := count()})")
    assert(r.statusCode() === 200)
    assert(r.body().trim === """{"count":2}""")
    assert(r.headers().firstValue("data-version").get() === "v42")
    assert(r.headers().firstValue("X-Request-Id").get() === "req-7")
    assert(r.headers().firstValue("Content-Type").get() === "application/x-ndjson")
  }

  test("row-per-line NDJSON with nulls and ordering") {
    val r = post("/query", "default.project({primary_key, age}).orderBy({desc(age)}).limit(2)")
    assert(r.body().trim.split("\n").toSeq ===
      Seq("""{"primary_key":"k2","age":40}""", """{"primary_key":"k3","age":30}"""))
  }

  test("Arrow IPC response when Accept requests it") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val r = http.send(HttpRequest.newBuilder(url("/query"))
      .POST(HttpRequest.BodyPublishers.ofString(
        "default.project({primary_key, age}).orderBy({primary_key})"))
      .header("Accept", "application/vnd.apache.arrow.stream").build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(r.statusCode() === 200)
    assert(r.headers().firstValue("Content-Type").get()
      === "application/vnd.apache.arrow.stream")
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(r.body()), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() === 2)
      var rows = 0
      val keys = scala.collection.mutable.ArrayBuffer[String]()
      while (reader.loadNextBatch()) {
        rows += root.getRowCount
        val kv = root.getVector(0).asInstanceOf[org.apache.arrow.vector.VarCharVector]
        (0 until root.getRowCount).foreach(i => keys += new String(kv.get(i), "UTF-8"))
      }
      assert(rows === 3)
      assert(keys.toSeq === Seq("k1", "k2", "k3"))
    } finally { reader.close(); alloc.close() }
  }

  test("invalid query → 400 with typed message") {
    val r = post("/query", "default.filter(nope = 1)")
    assert(r.statusCode() === 400)
    assert(r.body().contains("unknown column 'nope'"))
    val r2 = post("/query", "default.filter(")
    assert(r2.statusCode() === 400)
  }

  override def afterAll(): Unit = { srv.stop(); super.afterAll() }
}
