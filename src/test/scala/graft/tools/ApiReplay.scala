package graft.tools

import java.io.File
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import graft.{GoldenCorpusData, SparkSpec}
import graft.server.QueryServer

/** Checksummed API replay (reference: benchmarking/README.md:44-56 —
  * evobench's good-api-query-log.csv pattern): every golden corpus query
  * is POSTed to the live HTTP server and the NDJSON response body is
  * checksummed (md5 over SORTED lines, so only CONTENT drift fires, not
  * benign row-order changes of unordered results). Checksums are
  * committed in `tools/api_checksums.txt`; a round whose responses drift
  * from the committed log fails loudly here before it ships.
  *
  *   sbt "Test/runMain graft.tools.ApiReplay"        # check (exit 1 on drift)
  *   sbt "Test/runMain graft.tools.ApiReplay write"  # regenerate the log
  */
object ApiReplay {

  val ChecksumFile = "tools/api_checksums.txt"

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
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(canon.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          s"${f.getName} $md"
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
