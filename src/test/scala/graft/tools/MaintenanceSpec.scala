package graft.tools

import graft.SparkSpec
import graft.sources.{ChangeFeedConsumer, NdjsonIngest}

/** The serve maintenance loop's feed-awareness: registered corpus
  * indexes sync per tick, and gc NEVER reclaims commits a registered
  * feed's cursor has not consumed — even when plain retention would.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("corpus feed syncs on tick; gc retention respects the feed " +
    "cursor, then reclaims once the feed catches up") {
    val root = java.nio.file.Files.createTempDirectory("maintcorpus")
      .toString
    val dir = s"$root/docs"
    def docs(ids: Range) = ids.map(i =>
      (i.toLong, s"src${i % 2}", s"document text number $i with words " +
        s"shared across near neighbors ${i / 2}")).toDF(
      "doc_id", "source", "text")
    docs(0 until 4).collect() // force schema resolution outside timing
    NdjsonIngest.appendVersion(docs(0 until 4), dir, "doc_id")
    (1 to 9).foreach(b =>
      NdjsonIngest.appendDelta(docs(b * 4 until b * 4 + 4), dir, "doc_id"))
    val stateDir = s"$root/corpus-state"
    Maintenance.registerCorpus(root, "docs",
      Maintenance.CorpusFeedSpec(dir, stateDir))
    // tick 1: compacts the 10-layer chain (commit 11), bootstraps the
    // corpus indexes (cursor → 11) — and although plain retainCommits=1
    // would reclaim v1..v10 right here, the pre-sync cursor was 0, so
    // the feed-aware retention keeps every commit
    val r1 = Maintenance.tick(spark, root, maxLayers = 4,
      retainCommits = 1)
    assert(r1.failed.isEmpty, r1.failed.toString)
    assert(r1.compacted === Seq(dir))
    assert(r1.corpusSynced === Seq("docs"))
    assert(r1.gced.isEmpty,
      "gc must not reclaim commits the feed had not consumed")
    assert(new java.io.File(dir, "v1").isDirectory,
      "pre-compact layers must survive while the feed cursor is behind")
    assert(ChangeFeedConsumer.cursor(s"$stateDir/feed") ===
      NdjsonIngest.commits(dir).last)
    // one more append; tick 2's gc now sees cursor == 11 < head == 12
    // but commits ≤ 11 are consumed → v1..v10 reclaim, v11 (compact
    // snapshot, the live chain base) and v12 stay; the sync then
    // consumes commit 12
    NdjsonIngest.appendDelta(docs(40 until 44), dir, "doc_id")
    val r2 = Maintenance.tick(spark, root, maxLayers = 4,
      retainCommits = 1)
    assert(r2.failed.isEmpty, r2.failed.toString)
    assert(r2.gced.getOrElse(dir, 0) === 10, r2.gced.toString)
    assert(!new java.io.File(dir, "v1").exists())
    assert(NdjsonIngest.latestLayers(dir) === Seq("v11", "v12"))
    assert(ChangeFeedConsumer.cursor(s"$stateDir/feed") ===
      NdjsonIngest.commits(dir).last)
    // the maintained index state answers: near-dup candidates for the
    // last batch resolve against the persisted band chains
    assert(graft.operators.SimHashIndex
      .candidatesForIds(spark, Seq(40L, 41L).toDF("id"),
        s"$stateDir/simhash").columns.nonEmpty)
  }

  test("a corrupt target fails ITS guard only — healthy chains still " +
    "compact, the tick never throws, and the report records the failure") {
    val root = java.nio.file.Files.createTempDirectory("maintcorrupt")
      .toString
    // a healthy over-long chain
    val good = s"$root/tables/good"
    NdjsonIngest.appendVersion(Seq((1L, "a")).toDF("id", "t"), good, "id")
    (2 to 6).foreach(i => NdjsonIngest.appendDelta(
      Seq((i.toLong, "a")).toDF("id", "t"), good, "id"))
    // a corrupt sibling: discovery sees latest + _log, but the log
    // entry is a DIRECTORY, so the chain reads explode mid-body —
    // exactly the shape that used to escape tick and kill the thread
    val bad = s"$root/tables/bad"
    NdjsonIngest.appendVersion(Seq((1L, "a")).toDF("id", "t"), bad, "id")
    (2 to 6).foreach(i => NdjsonIngest.appendDelta(
      Seq((i.toLong, "a")).toDF("id", "t"), bad, "id"))
    val entry = NdjsonIngest.commits(bad).head
    val p = java.nio.file.Paths.get(bad, "_log", entry.toString)
    java.nio.file.Files.delete(p)
    java.nio.file.Files.createDirectory(p)
    val r = Maintenance.tick(spark, root, maxLayers = 3, retainCommits = 1)
    assert(r.compacted.contains(good),
      "the healthy chain must still compact")
    assert(NdjsonIngest.latestLayers(good).length === 1)
    assert(r.failed.exists(_._1.contains(bad)),
      s"the corrupt target must land in Report.failed: ${r.failed}")
  }

  test("tick reports persist to _maintenance.log and lastReportLine " +
    "surfaces the newest one") {
    val root = java.nio.file.Files.createTempDirectory("maintlog").toString
    val dir = s"$root/tables/t"
    NdjsonIngest.appendVersion(Seq((1L, "a")).toDF("id", "t"), dir, "id")
    (2 to 6).foreach(i => NdjsonIngest.appendDelta(
      Seq((i.toLong, "a")).toDF("id", "t"), dir, "id"))
    assert(Maintenance.lastReportLine(root).isEmpty)
    Maintenance.tick(spark, root, maxLayers = 3, retainCommits = 1)
    Maintenance.tick(spark, root, maxLayers = 3, retainCommits = 1)
    val lines = java.nio.file.Files
      .readString(java.nio.file.Paths.get(root, "_maintenance.log"))
      .linesIterator.toSeq
    assert(lines.length === 2, "one JSON line per tick")
    val last = Maintenance.lastReportLine(root)
    assert(last === Some(lines.last))
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(last.get)
    assert(node.get("at") != null && node.get("compacted") != null &&
      node.get("gced") != null && node.get("failed") != null,
      s"report line must be self-describing JSON: $last")
    // tick 1 compacted the 6-layer chain; tick 2 had nothing to do
    assert(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(lines.head).get("compacted").asInt === 1)
  }

  test("insert-only feed ticks keep the band chains LENGTH-bounded " +
    "(the happy path must not grow one layer per tick forever)") {
    val root = java.nio.file.Files.createTempDirectory("maintbound")
      .toString
    val dir = s"$root/docs"
    def docs(ids: Range) = ids.map(i =>
      (i.toLong, s"src${i % 2}", s"short document $i")).toDF(
      "doc_id", "source", "text")
    NdjsonIngest.appendVersion(docs(0 until 3), dir, "doc_id")
    Maintenance.registerCorpus(root, "docs",
      Maintenance.CorpusFeedSpec(dir, s"$root/state"))
    (1 to 10).foreach { b =>
      NdjsonIngest.appendDelta(docs(b * 3 until b * 3 + 3), dir, "doc_id")
      val r = Maintenance.tick(spark, root, maxLayers = 100)
      assert(r.failed.isEmpty, r.failed.toString)
    }
    // 1 bootstrap + 10 insert ticks would be 11 layers without the
    // tick-side length compact; the >8 fold keeps the union bounded
    assert(graft.operators.DedupIndex.layers(s"$root/state/minhash")
      .length <= 9)
    assert(graft.operators.SimHashIndex.layers(s"$root/state/simhash")
      .length <= 9)
    // and the folded index still answers
    assert(graft.operators.SimHashIndex
      .candidatesForIds(spark, Seq(30L).toDF("id"),
        s"$root/state/simhash").columns.nonEmpty)
  }

  test("an UNREADABLE feed cursor fails CLOSED: its table's gc skips " +
    "the tick (commits survive) while other dirs still gc; a readable " +
    "cursor restores reclamation next tick") {
    val root = java.nio.file.Files.createTempDirectory("maintclosed")
      .toString
    def docs(ids: Range) = ids.map(i =>
      (i.toLong, s"src${i % 2}", s"short document $i")).toDF(
      "doc_id", "source", "text")
    // dir A: registered feed whose cursor file is CORRUPT
    val a = s"$root/tables/a"
    NdjsonIngest.appendVersion(docs(0 until 3), a, "doc_id")
    (1 to 3).foreach(b =>
      NdjsonIngest.appendDelta(docs(b * 3 until b * 3 + 3), a, "doc_id"))
    val stateDir = s"$root/corpus-state"
    Maintenance.registerCorpus(root, "a",
      Maintenance.CorpusFeedSpec(a, stateDir))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$stateDir/feed"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$stateDir/feed", "cursor"), "not-a-number")
    // dir B: no feed — gc must proceed normally
    val b = s"$root/tables/b"
    NdjsonIngest.appendVersion(docs(0 until 3), b, "doc_id")
    (1 to 3).foreach(n =>
      NdjsonIngest.appendDelta(docs(n * 3 until n * 3 + 3), b, "doc_id"))
    val r1 = Maintenance.tick(spark, root, maxLayers = 2,
      retainCommits = 1)
    // the corrupt cursor lands in failed (its own guard), the tick
    // survives, and A's pre-compact layers are NOT reclaimed — the old
    // fail-open behavior gc'd them with plain retainCommits, breaking
    // the consumer's readChanges forever
    assert(r1.failed.exists(_._1.startsWith("feed-cursor corpus/a")),
      r1.failed.toString)
    assert(!r1.gced.contains(a),
      s"gc must skip the dir with an unreadable feed cursor: ${r1.gced}")
    assert(new java.io.File(a, "v1").isDirectory,
      "commits a consumer may not have read must survive")
    assert(r1.gced.getOrElse(b, 0) > 0,
      s"dirs without feeds must still gc: ${r1.gced}")
    // recovery: a readable cursor at the head restores reclamation
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$stateDir/feed", "cursor"),
      NdjsonIngest.commits(a).last.toString)
    val r2 = Maintenance.tick(spark, root, maxLayers = 2,
      retainCommits = 1)
    assert(r2.gced.getOrElse(a, 0) > 0, s"gc must resume: ${r2.gced}")
    assert(!new java.io.File(a, "v1").exists())
  }
}
