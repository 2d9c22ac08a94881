package graft

import java.io.File
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.lang.Planner
import graft.server.{ArrowSink, QueryServer}

/** The FULL golden corpus through the LIVE HTTP server, on BOTH response
  * content types — the reference's e2e bar (endToEndTests/test/
  * query.test.js:1-60 runs every query over NDJSON and Arrow IPC against
  * the running server). For each corpus query this asserts three-way
  * value parity: the in-process plan, the `application/x-ndjson` body
  * (parsed back under the plan's schema), and the
  * `application/vnd.apache.arrow.stream` body (decoded with the Arrow
  * reader) must agree row-for-row as multisets, with matching row counts
  * and 200 status on every request.
  */
class HttpCorpusSpec extends SparkSpec with GoldenCorpusData {
  import spark.implicits._

  lazy val srv: QueryServer = {
    val s = new QueryServer(catalog, "corpus-v1")
    s.start(); s
  }
  lazy val http = HttpClient.newHttpClient()

  private def post(q: String, accept: String): HttpResponse[Array[Byte]] =
    http.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
      .POST(HttpRequest.BodyPublishers.ofString(q))
      .header("Accept", accept).build(),
      HttpResponse.BodyHandlers.ofByteArray())

  // ---- canonicalization: one string per row, identical across sources ----

  private def canonSpark(dt: DataType, v: Any): String =
    if (v == null) "null"
    else dt match {
      case DateType => v.toString // java.sql.Date → ISO
      case TimestampType | TimestampNTZType => v.toString
      case FloatType => v.asInstanceOf[Float].toString
      case DoubleType => v.asInstanceOf[Double].toString
      case _ => v.toString
    }

  private def canonRow(schema: StructType, r: Row): String =
    schema.fields.zipWithIndex
      .map { case (f, i) => f.name + "=" + canonSpark(f.dataType, r.get(i)) }
      .sorted.mkString("|")

  /** Arrow object → the same canonical string as the Spark value. */
  private def canonArrow(dt: DataType, v: AnyRef): String =
    if (v == null) "null"
    else dt match {
      case DateType => v match {
        case i: java.lang.Integer => java.time.LocalDate.ofEpochDay(i.longValue).toString
        case ld: java.time.LocalDate => ld.toString
        case other => other.toString
      }
      case TimestampType | TimestampNTZType => v match {
        // TimeStampMicro(TZ)Vector yields epoch micros (or LocalDateTime)
        case l: java.lang.Long =>
          java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
            l.longValue, java.time.temporal.ChronoUnit.MICROS)).toString
        case other => other.toString
      }
      case _ => v.toString // Text/Integer/Long/Double/Boolean all match
    }

  private def arrowRows(schema: StructType, body: Array[Byte]): Seq[String] = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(body), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() === schema.fields.length)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (reader.loadNextBatch()) {
        (0 until root.getRowCount).foreach { i =>
          out += schema.fields.zipWithIndex.map { case (f, j) =>
            f.name + "=" + canonArrow(f.dataType, root.getVector(j).getObject(i))
          }.sorted.mkString("|")
        }
      }
      out.toSeq
    } finally { reader.close(); alloc.close() }
  }

  test("every golden corpus query: NDJSON and Arrow HTTP paths match the in-process result") {
    val files = allJsonFiles(new File(s"$base/queries"))
    assert(files.nonEmpty)
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    files.foreach { f =>
      val q = jsonString(Files.readString(f.toPath), "query")
        .getOrElse(fail(s"no query in ${f.getName}"))
      try {
        val df = Planner.plan(q, catalog)
        val schema = df.schema
        val expect = df.collect().map(canonRow(schema, _)).toSeq.sorted

        // --- NDJSON path ---
        val nd = post(q, "application/x-ndjson")
        assert(nd.statusCode() === 200, s"${f.getName}: ndjson status")
        assert(nd.headers().firstValue("Content-Type").get() === "application/x-ndjson")
        val lines = new String(nd.body(), "UTF-8").split("\n").toSeq
          .filter(_.nonEmpty)
        // parse back under the plan's own schema → typed Rows, so the
        // comparison is value-level, not string-formatting-level
        val ndRows = spark.read.schema(schema)
          .option("mode", "FAILFAST")
          .json(spark.createDataset(lines))
          .collect().map(canonRow(schema, _)).toSeq.sorted
        if (ndRows != expect)
          failures += s"${f.getName}: ndjson mismatch (${ndRows.length} vs ${expect.length} rows)"

        // --- Arrow IPC path ---
        val ar = post(q, "application/vnd.apache.arrow.stream")
        assert(ar.statusCode() === 200, s"${f.getName}: arrow status")
        val ct = ar.headers().firstValue("Content-Type").get()
        if (ArrowSink.supports(schema)) {
          assert(ct === "application/vnd.apache.arrow.stream",
            s"${f.getName}: expected arrow, got $ct")
          val got = arrowRows(schema, ar.body()).sorted
          if (got != expect)
            failures += s"${f.getName}: arrow mismatch (${got.length} vs ${expect.length} rows)"
        } else {
          // schema outside the Arrow sink's coverage → documented NDJSON
          // fallback; it must still be value-correct
          assert(ct === "application/x-ndjson", s"${f.getName}: fallback type")
          failures += s"${f.getName}: schema not Arrow-supported (${schema.simpleString})"
        }
      } catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable =>
          failures += s"${f.getName}: ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, s"${failures.length} corpus queries failed over HTTP:\n" +
      failures.mkString("\n"))
  }

  test("concurrent corpus clients: no header or body cross-talk") {
    // the server dispatches exchanges on its worker pool (the reference
    // serves multi-threaded through Poco); N parallel clients over a
    // corpus slice must each get THEIR OWN X-Request-Id echoed, the same
    // result-ordering header as a sequential run, and value parity
    val files = allJsonFiles(new File(s"$base/queries")).take(24)
    case class Fixture(name: String, q: String, schema: StructType,
        expect: Seq[String], ordering: String)
    val fixtures = files.map { f =>
      val q = jsonString(Files.readString(f.toPath), "query")
        .getOrElse(fail(s"no query in ${f.getName}"))
      val df = Planner.plan(q, catalog)
      val seq = post(q, "application/x-ndjson")
      Fixture(f.getName, q, df.schema,
        df.collect().map(canonRow(df.schema, _)).toSeq.sorted,
        seq.headers().firstValue("result-ordering").orElse("?"))
    }
    val exec = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    fixtures.zipWithIndex.foreach { case (fx, i) =>
      exec.submit(new Runnable {
        def run(): Unit = try {
          val rid = s"rid-$i-${fx.name}"
          val r = http.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
            .POST(HttpRequest.BodyPublishers.ofString(fx.q))
            .header("Accept", "application/x-ndjson")
            .header("X-Request-Id", rid).build(),
            HttpResponse.BodyHandlers.ofString())
          if (r.statusCode() != 200)
            failures.add(s"${fx.name}: status ${r.statusCode()}")
          if (r.headers().firstValue("X-Request-Id").orElse("") != rid)
            failures.add(s"${fx.name}: X-Request-Id cross-talk: " +
              r.headers().firstValue("X-Request-Id").orElse("<none>"))
          if (r.headers().firstValue("result-ordering").orElse("?") != fx.ordering)
            failures.add(s"${fx.name}: result-ordering cross-talk")
          if (r.headers().firstValue("data-version").orElse("") != "corpus-v1")
            failures.add(s"${fx.name}: data-version header")
          val lines = r.body().split("\n").toSeq.filter(_.nonEmpty)
          val rows = spark.read.schema(fx.schema).option("mode", "FAILFAST")
            .json(spark.createDataset(lines))
            .collect().map(canonRow(fx.schema, _)).toSeq.sorted
          if (rows != fx.expect)
            failures.add(s"${fx.name}: body mismatch under concurrency " +
              s"(${rows.length} vs ${fx.expect.length} rows)")
        } catch {
          case t: Throwable =>
            failures.add(s"${fx.name}: ${t.getClass.getSimpleName}: ${t.getMessage}")
        }
      })
    }
    exec.shutdown()
    assert(exec.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty,
      s"${failures.size} concurrent requests failed:\n" +
        failures.toArray.mkString("\n"))
  }

  test("every invalid corpus query: typed 400 over HTTP on both Accept types") {
    val files = allJsonFiles(new File(s"$base/invalidQueries"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val q = jsonString(Files.readString(f.toPath), "query")
        .getOrElse(fail(s"no query in ${f.getName}"))
      Seq("application/x-ndjson", "application/vnd.apache.arrow.stream")
        .foreach { accept =>
          val r = post(q, accept)
          assert(r.statusCode() === 400, s"${f.getName} ($accept)")
          val body = new String(r.body(), "UTF-8")
          // the error payload is the typed JSON error, never a stack trace
          assert(body.startsWith("""{"error":"Bad request""""),
            s"${f.getName}: $body")
        }
    }
  }

  override def afterAll(): Unit = { srv.stop(); super.afterAll() }
}
