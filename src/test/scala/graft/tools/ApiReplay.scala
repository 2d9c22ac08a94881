package graft.tools

import java.io.File
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import graft.{GoldenCorpusData, SparkSpec}
import graft.server.QueryServer

/** Checksummed API replay (reference: benchmarking/README.md:44-56 —
  * evobench's good-api-query-log.csv pattern): every golden corpus query
  * is POSTed to the live HTTP server on BOTH response paths and
  * checksummed — the NDJSON body as md5 over SORTED lines, the Arrow IPC
  * body as md5 over a canonical decode (header row + sorted rendered
  * rows; raw IPC bytes would be order-sensitive for unordered results) —
  * so only CONTENT drift fires, not benign row-order changes. Each log
  * line is `name ndjsonMd5 arrowMd5`; queries whose schema the Arrow
  * sink doesn't carry checksum the NDJSON fallback there, so a ROUTING
  * change fires too. Checksums are committed in `tools/api_checksums
  * .txt`; a round whose responses drift from the committed log fails
  * loudly here before it ships.
  *
  *   sbt "Test/runMain graft.tools.ApiReplay"        # check (exit 1 on drift)
  *   sbt "Test/runMain graft.tools.ApiReplay write"  # regenerate the log
  */
object ApiReplay {

  val ChecksumFile = "tools/api_checksums.txt"

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Canonical text of an Arrow IPC stream: the field-name header plus
    * every row rendered `name=value`, rows sorted.
    */
  private def canonArrow(bytes: Array[Byte]): String = {
    import scala.jdk.CollectionConverters._
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val rd = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val root = rd.getVectorSchemaRoot
      val rows = scala.collection.mutable.ArrayBuffer[String]()
      while (rd.loadNextBatch()) {
        val vecs = root.getFieldVectors.asScala
        (0 until root.getRowCount).foreach { i =>
          rows += vecs.map(v => s"${v.getName}=${String.valueOf(v.getObject(i))}")
            .mkString("|")
        }
      }
      (root.getSchema.getFields.asScala.map(_.getName).mkString(",") +:
        rows.sorted).mkString("\n")
    } finally { rd.close(); alloc.close() }
  }

  def main(args: Array[String]): Unit = {
    val write = args.headOption.contains("write")
    val fixture = new SparkSpec with GoldenCorpusData {}
    val srv = new QueryServer(fixture.catalog, "replay")
    srv.start()
    val http = HttpClient.newHttpClient()
    try {
      val sums = fixture.allJsonFiles(new File(s"${fixture.base}/queries"))
        .map { f =>
          val q = fixture.jsonString(Files.readString(f.toPath), "query")
            .getOrElse(sys.error(s"no query in ${f.getName}"))
          val r = http.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
            .POST(HttpRequest.BodyPublishers.ofString(q)).build(),
            HttpResponse.BodyHandlers.ofString())
          require(r.statusCode() == 200, s"${f.getName}: HTTP ${r.statusCode()}")
          val canon = r.body().split("\n").filter(_.nonEmpty).sorted
            .mkString("\n")
          val ra = http.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
            .POST(HttpRequest.BodyPublishers.ofString(q))
            .header("Accept", "application/vnd.apache.arrow.stream").build(),
            HttpResponse.BodyHandlers.ofByteArray())
          require(ra.statusCode() == 200,
            s"${f.getName}: arrow HTTP ${ra.statusCode()}")
          val arrowCanon =
            if (ra.headers().firstValue("Content-Type").orElse("")
                == "application/vnd.apache.arrow.stream")
              canonArrow(ra.body())
            else // NDJSON fallback for Arrow-unsupported schemas
              "ndjson-fallback\n" + new String(ra.body(), "UTF-8")
                .split("\n").filter(_.nonEmpty).sorted.mkString("\n")
          s"${f.getName} ${md5(canon)} ${md5(arrowCanon)}"
        }
      val content = sums.mkString("", "\n", "\n")
      if (write) {
        Files.writeString(Paths.get(ChecksumFile), content)
        println(s"[replay] wrote ${sums.size} checksums to $ChecksumFile")
      } else {
        val committed = Files.readString(Paths.get(ChecksumFile))
          .split("\n").filter(_.nonEmpty).toSeq
        val current = sums
        val drift = committed.toSet.diff(current.toSet) ++
          current.toSet.diff(committed.toSet)
        if (drift.nonEmpty) {
          System.err.println(s"[replay] DRIFT in ${drift.size} entries:")
          drift.toSeq.sorted.foreach(d => System.err.println(s"  $d"))
          sys.exit(1)
        }
        println(s"[replay] ${current.size} responses match the committed log")
      }
    } finally {
      srv.stop()
      fixture.spark.stop()
    }
  }
}
