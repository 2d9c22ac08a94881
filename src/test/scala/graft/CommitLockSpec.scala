package graft

import org.apache.spark.sql.functions._
import graft.sources.NdjsonIngest

/** The per-table commit lock: every pointer-flipping writer (commits,
  * tombstones, compaction, gc) is a read-modify-write over `latest`,
  * and since the serve maintenance loop fires compaction on a timer
  * inside live deployments, an unlocked compactor could read the chain,
  * write its snapshot, and flip — silently dropping a delta committed
  * in between. These tests race real committing threads against
  * compaction loops and assert no commit is ever lost.
  */
class CommitLockSpec extends SparkSpec {

  private def tmpDir(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lock")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)))
    s"$tmp/t"
  }

  test("a compaction loop racing a committing thread never drops a " +
      "delta from latest (append-only chain)") {
    val dir = tmpDir()
    val session = spark
    import session.implicits._
    val batches = 24
    val perBatch = 4
    NdjsonIngest.appendVersion(
      (0 until perBatch).map(i => (i.toLong, "seed")).toDF("id", "tag"),
      dir, "id")
    @volatile var writerErr: Option[Throwable] = None
    val writer = new Thread(() => {
      try {
        (1 until batches).foreach { b =>
          val batch = (0 until perBatch)
            .map(i => ((b * perBatch + i).toLong, s"b$b")).toDF("id", "tag")
          NdjsonIngest.appendDelta(batch, dir, "id")
        }
      } catch { case t: Throwable => writerErr = Some(t) }
    }, "race-appender")
    writer.start()
    // compact aggressively while the appender runs — every iteration is
    // a full read-latest → write-snapshot → flip cycle
    while (writer.isAlive)
      NdjsonIngest.compactVersions(spark, dir, maxLayers = 2)
    writer.join()
    writerErr.foreach(t => fail(s"appender died: $t", t))
    val ids = NdjsonIngest.readLatest(spark, dir)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.length == batches * perBatch,
      s"rows lost: ${ids.length} of ${batches * perBatch} survive")
    assert(ids.toSeq == (0L until (batches * perBatch).toLong),
      "the surviving id set must be exactly the committed ids")
  }

  test("a merged-chain compaction loop racing upserts and tombstones " +
      "preserves every committed mutation") {
    val dir = tmpDir()
    val session = spark
    import session.implicits._
    val keys = 16
    NdjsonIngest.appendVersion(
      (0 until keys).map(i => (i.toLong, 0L)).toDF("id", "ver"), dir, "id")
    @volatile var writerErr: Option[Throwable] = None
    val rounds = 10
    val writer = new Thread(() => {
      try {
        (1 to rounds).foreach { r =>
          // each round bumps every key's version, then tombstones one
          // distinct key per round (resurrecting it next round's upsert)
          NdjsonIngest.upsertDelta(
            (0 until keys).map(i => (i.toLong, r.toLong)).toDF("id", "ver"),
            dir, "id")
          NdjsonIngest.deleteDelta(
            Seq((r % keys).toLong).toDF("id"), dir, "id")
        }
      } catch { case t: Throwable => writerErr = Some(t) }
    }, "race-upserter")
    writer.start()
    while (writer.isAlive)
      NdjsonIngest.compactMerged(spark, dir, "id", maxLayers = 2)
    writer.join()
    writerErr.foreach(t => fail(s"upserter died: $t", t))
    val state = NdjsonIngest.readLatestMerged(spark, dir, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // final state: every key at version `rounds` except the last
    // tombstoned key (rounds % keys), which no later upsert resurrected
    val expected = (0 until keys).map(_.toLong)
      .filterNot(_ == (rounds % keys).toLong)
      .map(_ -> rounds.toLong).toMap
    assert(state == expected,
      s"merged state diverged: ${state.toSeq.sorted} vs ${expected.toSeq.sorted}")
  }

  test("a band-index compact+gc loop racing an appender never loses a " +
      "committed signature layer (same lock, index chains)") {
    val dir = s"${tmpDir()}/minhash"
    val session = spark
    import session.implicits._
    def docs(b: Int) = (0 until 3).map(i =>
      ((b * 3 + i).toLong, s"document text number ${b * 3 + i} with " +
        s"shared words ${(b * 3 + i) / 2}")).toDF("doc_id", "text")
    graft.operators.DedupIndex.build(spark, docs(0), "doc_id", "text", dir)
    @volatile var writerErr: Option[Throwable] = None
    val batches = 12
    val writer = new Thread(() => {
      try (1 until batches).foreach { b =>
        graft.operators.DedupIndex.append(spark, docs(b), "doc_id",
          "text", dir)
      } catch { case t: Throwable => writerErr = Some(t) }
    }, "race-index-appender")
    writer.start()
    while (writer.isAlive) {
      graft.operators.DedupIndex.compact(spark, dir, maxLayers = 2)
      graft.operators.DedupIndex.gc(dir)
    }
    writer.join()
    writerErr.foreach(t => fail(s"index appender died: $t", t))
    graft.operators.DedupIndex.compact(spark, dir, maxLayers = 1)
    val ids = graft.operators.DedupIndex.load(spark, dir)
      .select("id").distinct().collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until (batches * 3).toLong),
      s"signatures lost: ${ids.length} of ${batches * 3} ids survive")
  }

  test("gc racing a committing thread never reclaims a layer the " +
      "final pointer references") {
    val dir = tmpDir()
    val session = spark
    import session.implicits._
    NdjsonIngest.appendVersion(Seq((0L, "seed")).toDF("id", "tag"), dir, "id")
    @volatile var writerErr: Option[Throwable] = None
    val n = 30
    val writer = new Thread(() => {
      try {
        (1 to n).foreach { i =>
          NdjsonIngest.appendDelta(Seq((i.toLong, s"b$i")).toDF("id", "tag"),
            dir, "id")
          if (i % 5 == 0) NdjsonIngest.compactVersions(spark, dir, 3)
        }
      } catch { case t: Throwable => writerErr = Some(t) }
    }, "race-gc-appender")
    writer.start()
    while (writer.isAlive) NdjsonIngest.gcVersions(dir, retainCommits = 1)
    writer.join()
    writerErr.foreach(t => fail(s"appender died: $t", t))
    NdjsonIngest.gcVersions(dir, retainCommits = 1)
    val ids = NdjsonIngest.readLatest(spark, dir)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L to n.toLong),
      "every committed row must survive interleaved gc")
  }
}
