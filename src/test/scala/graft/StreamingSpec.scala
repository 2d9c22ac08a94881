package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("hourlyCounts runs identically on a batch DataFrame") {
    val df = Seq(
      (ts(5), "click", 1.0), (ts(10), "click", 2.0), (ts(20), "view", 3.0))
      .toDF("ts", "event_type", "value")
    val out = EventStreams.hourlyCounts(df)
      .select(col("event_type"), col("cnt"), col("sum_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(out === Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("hourlyCounts over a stream emits finalized windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hourlyCounts(
      mem.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hc")
      .outputMode("append").start()
    try {
      mem.addData((ts(5), "click", 1.0), (ts(10), "click", 2.0))
      q.processAllAvailable()
      // watermark still inside the 10:00 window → nothing finalized
      assert(spark.table("hc").count() === 0)
      // push watermark past 11:10 to close the 10:00-11:00 window
      mem.addData((Timestamp.valueOf("2024-01-01 11:30:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hc")
        .select(col("event_type"), col("cnt")).as[(String, Long)].collect().toSet
      assert(rows === Set(("click", 2L)))
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival; watermark EVICTS state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = EventStreams.dedupStream(
      mem.toDF.toDF("ts", "content"), "content", "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    def texts(): Seq[String] =
      spark.table("dedup").select("content").as[String].collect().sorted.toSeq
    try {
      mem.addData((ts(0), "a"), (ts(1), "b"), (ts(2), "a"))
      q.processAllAvailable()
      assert(texts() === Seq("a", "b"))
      // in-horizon duplicate suppressed; ts(30) pushes the watermark to
      // 10:20, past a's expiry (arrival 10:00 + 10 min lateness)
      mem.addData((ts(3), "a"), (ts(30), "c"))
      q.processAllAvailable()
      assert(texts() === Seq("a", "b", "c"))
      // a's state was evicted, so a post-horizon re-occurrence re-emits —
      // that eviction is what bounds state on an unbounded stream
      mem.addData((ts(31), "a"))
      q.processAllAvailable()
      assert(texts() === Seq("a", "a", "b", "c"))
    } finally q.stop()
  }

  test("transformWithState running totals accumulate across micro-batches") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the async checksum-file writer deadlocks the RocksDB snapshot
    // upload under the forked test JVM; checksums are an operational
    // nicety, not part of the semantics under test
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val mem = MemoryStream[EventStreams.EvV]
    // ttl = null → TimeMode.None: a processing-time TTL arms cleanup
    // timers that drive continuous empty micro-batches under the
    // default trigger — pointless in a test; the cross-batch state
    // semantics are what's under test here
    val q = EventStreams.runningTotals(mem.toDS(), null)
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    def rows(): Map[Long, (Long, Double)] =
      spark.table("totals").as[EventStreams.UserTotals].collect()
        .groupBy(_.user_id)
        // update mode appends one row per (batch, user); totals are
        // monotone, so the max row is the current state
        .map { case (u, rs) =>
          val m = rs.maxBy(_.n_events); u -> (m.n_events, m.total_value)
        }
    try {
      mem.addData(EventStreams.EvV(1, "view", 1.5), EventStreams.EvV(1, "click", 2.0),
        EventStreams.EvV(2, "view", 4.0))
      q.processAllAvailable()
      assert(rows() === Map(1L -> ((2L, 3.5)), 2L -> ((1L, 4.0))))
      // second batch: state carries over, only touched users re-emit
      mem.addData(EventStreams.EvV(1, "buy", 10.0))
      q.processAllAvailable()
      assert(rows() === Map(1L -> ((3L, 13.5)), 2L -> ((1L, 4.0))))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join matches follows within the window only") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, String)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = EventStreams.joinWithin(
      views.toDF.toDF("user_id", "ts", "event_type"),
      clicks.toDF.toDF("user_id", "ts", "event_type"),
      windowSeconds = 120)
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      // user 1: view at 10:00, click at 10:01 (inside 2 min) → match;
      // user 2: view at 10:00, click at 10:05 (outside) → no match;
      // user 3: click with no view → no match
      views.addData((1L, ts(0), "view"), (2L, ts(0), "view"))
      clicks.addData((1L, ts(1), "click"), (2L, ts(5), "click"), (3L, ts(1), "click"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select("user_id", "base_type", "follow_type")
        .as[(Long, String, String)].collect().toSet
      assert(rows === Set((1L, "view", "click")))
      // late-but-in-window follow in a later micro-batch still joins
      // (state retained until the watermark passes)
      clicks.addData((2L, ts(2), "click"))
      q.processAllAvailable()
      val rows2 = spark.table("ssjoin").select("user_id").as[Long].collect().sorted
      assert(rows2.toSeq === Seq(1L, 2L))
    } finally q.stop()
    // identical call shape runs on static frames (batch backfill)
    val b = EventStreams.joinWithin(
      Seq((1L, ts(0), "view")).toDF("user_id", "ts", "event_type"),
      Seq((1L, ts(1), "click"), (1L, ts(9), "click")).toDF("user_id", "ts", "event_type"),
      windowSeconds = 120)
    assert(b.count() === 1)
  }

  test("streaming commits feed incremental aggregates at O(batch) per micro-batch") {
    import org.apache.spark.sql.types._
    import graft.sources.{IncrementalAgg, NdjsonIngest}
    val root = java.nio.file.Files.createTempDirectory("sagg").toFile
    val inDir = new java.io.File(root, "in"); inDir.mkdirs()
    val tableDir = s"$root/table"; val ckDir = s"$root/ck"
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("seq", StringType)))
    def drop(name: String, lines: String*): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(inDir, name).toPath, lines.mkString("\n"))
    def runOnce(): Unit = {
      val q = graft.streaming.StreamingIngest.start(
        spark, inDir.toString, schema, "seq", "ACGTACGT", tableDir, "id", ckDir)
      q.awaitTermination()
    }
    drop("f1.ndjson",
      """{"id":"k1","seq":"ACGTACGT"}""", """{"id":"k2","seq":"TCGTACGT"}""")
    runOnce()
    // the rollup dashboard serves from per-layer partials
    def servedCnt(): Long = IncrementalAgg
      .serve(spark, tableDir, "rows", Nil, Nil, distinctCols = Seq("id"))
      .select("cnt").as[Long].head()
    assert(servedCnt() === 2L)
    // next micro-batch: ONLY the new layer is summarized (O(batch)),
    // and the merged serve reflects it
    drop("f2.ndjson", """{"id":"k3","seq":"ACCTACGT"}""")
    runOnce()
    assert(IncrementalAgg.maintain(spark, tableDir, "rows", Nil, Nil,
      distinctCols = Seq("id")).length === 1)
    assert(servedCnt() === 3L)
    assert(IncrementalAgg
      .serve(spark, tableDir, "rows", Nil, Nil, distinctCols = Seq("id"))
      .select("approx_distinct_id").as[Long].head() === 3L)
    // direct parity
    assert(NdjsonIngest.readLatest(spark, tableDir).count() === 3L)
  }

  test("streaming NDJSON ingest commits atomic versions; checkpoint gives exactly-once per file") {
    import org.apache.spark.sql.types._
    import graft.sources.NdjsonIngest
    val root = java.nio.file.Files.createTempDirectory("singest").toFile
    val inDir = new java.io.File(root, "in"); inDir.mkdirs()
    val tableDir = s"$root/table"
    val ckDir = s"$root/ck"
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("seq", StringType)))
    def drop(name: String, lines: String*): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(inDir, name).toPath, lines.mkString("\n"))
    def runOnce(): Unit = {
      val q = graft.streaming.StreamingIngest.start(
        spark, inDir.toString, schema, "seq", "ACGTACGT", tableDir, "id", ckDir)
      q.awaitTermination()
    }
    drop("f1.ndjson",
      """{"id":"k1","seq":"ACGTACGT"}""",
      """{"id":"k2","seq":"TCGTACGT"}""")
    runOnce()
    val v1 = NdjsonIngest.readLatest(spark, tableDir)
    assert(v1.count() === 2)
    assert(v1.columns.contains("muts") && !v1.columns.contains("seq"))
    // second file: only the NEW file is processed (checkpointed source
    // log) and committed as a DELTA layer; readers union the chain
    drop("f2.ndjson", """{"id":"k3","seq":"ACCTACGT"}""")
    runOnce()
    val v2 = NdjsonIngest.readLatest(spark, tableDir)
    assert(v2.count() === 3)
    assert(v2.select("id").as[String].collect().sorted.toSeq === Seq("k1", "k2", "k3"))
    // two committed versions exist; readers only ever saw latest
    val versions = new java.io.File(tableDir).list().count(_.startsWith("v"))
    assert(versions === 2)

    // ---- checkpoint REPLAY of the last committed batch is a no-op ----
    // (crash after commit, before the sink checkpoint records the batch:
    // on restart foreachBatch re-offers the same batch id — the commit
    // tag in the atomic `latest` pointer detects it; the old behavior
    // re-unioned the batch and poisoned the stream on the dup-PK abort)
    val lastTag = NdjsonIngest.latestTag(tableDir)
    val streamId = graft.streaming.StreamingIngest.streamIdOf(ckDir)
    assert(lastTag.exists(_.startsWith(s"$streamId:batch")))
    val replayId = lastTag.get.stripPrefix(s"$streamId:batch").toLong
    val replayBatch = Seq(("k3", "ACCTACGT")).toDF("id", "seq")
    graft.streaming.StreamingIngest.ingestBatch(
      spark, replayBatch, replayId, "seq", "ACGTACGT", tableDir, "id", streamId)
    // no new version, no failure, table unchanged
    assert(new java.io.File(tableDir).list().count(_.startsWith("v")) === 2)
    assert(NdjsonIngest.readLatest(spark, tableDir).count() === 3)
    // a genuinely NEW batch with a conflicting pk still aborts loudly
    intercept[NdjsonIngest.DuplicatePrimaryKey] {
      graft.streaming.StreamingIngest.ingestBatch(
        spark, replayBatch, replayId + 1, "seq", "ACGTACGT", tableDir, "id", streamId)
    }

    // ---- untagged batch append BETWEEN a streaming commit and its
    // replay must not clear the replay tag: the batch-appended version
    // still contains streaming batch `replayId`, so the carried-forward
    // tag keeps the replay a no-op (instead of re-unioning already
    // committed rows into a dup-PK abort loop) ----
    val prev = NdjsonIngest.readLatest(spark, tableDir)
    val extra = graft.seq.SequenceModel.diff(
      Seq(("k4", "ACGAACGT")).toDF("id", "seq"), "seq", "ACGTACGT",
      missingSyms = Set("N"))
    NdjsonIngest.appendVersion(prev.unionByName(extra), tableDir, "id")
    assert(NdjsonIngest.latestTag(tableDir) === lastTag) // tag carried
    val nVersions = new java.io.File(tableDir).list().count(_.startsWith("v"))
    graft.streaming.StreamingIngest.ingestBatch(
      spark, replayBatch, replayId, "seq", "ACGTACGT", tableDir, "id", streamId)
    // replay after the interleaved append: still a no-op, k4 retained
    assert(new java.io.File(tableDir).list().count(_.startsWith("v")) === nVersions)
    val after = NdjsonIngest.readLatest(spark, tableDir)
    assert(after.count() === 4)
    assert(after.select("id").as[String].collect().sorted.toSeq ===
      Seq("k1", "k2", "k3", "k4"))
  }

  test("fresh stream on the same table dir does not skip its batch 0 (namespaced replay tag)") {
    import graft.sources.NdjsonIngest
    val root = java.nio.file.Files.createTempDirectory("snamespace").toFile
    val tableDir = s"$root/table"
    def ingest(spark: org.apache.spark.sql.SparkSession,
        df: org.apache.spark.sql.DataFrame, b: Long, seqCol: String,
        ref: String, dir: String, pk: String, sid: String): Unit =
      graft.streaming.StreamingIngest.ingestBatch(
        spark, df, b, seqCol, ref, dir, pk, sid)
    ingest(spark, Seq(("k1", "ACGTACGT")).toDF("id", "seq"), 0L,
      "seq", "ACGTACGT", tableDir, "id", "streamA")
    assert(NdjsonIngest.readLatest(spark, tableDir).count() === 1)
    // a DIFFERENT stream (fresh checkpoint → batch ids restart at 0) on
    // the same tableDir: its batch 0 must commit. With the old bare
    // `batch<N>` tag it matched streamA's committed tag and was silently
    // dropped.
    val b0b = Seq(("k2", "TCGTACGT")).toDF("id", "seq")
    ingest(spark, b0b, 0L, "seq", "ACGTACGT", tableDir, "id", "streamB")
    val after = NdjsonIngest.readLatest(spark, tableDir)
    assert(after.count() === 2)
    assert(after.select("id").as[String].collect().sorted.toSeq === Seq("k1", "k2"))
    // streamB's OWN replay of its batch 0 is still a no-op
    val nv = new java.io.File(tableDir).list().count(_.startsWith("v"))
    ingest(spark, b0b, 0L, "seq", "ACGTACGT", tableDir, "id", "streamB")
    assert(new java.io.File(tableDir).list().count(_.startsWith("v")) === nv)
  }

  test("streaming delta commits write O(batch) and auto-compact past 8 layers") {
    import graft.sources.NdjsonIngest
    val root = java.nio.file.Files.createTempDirectory("sdelta").toFile
    val tableDir = s"$root/table"
    (0 until 10).foreach { b =>
      graft.streaming.StreamingIngest.ingestBatch(
        spark, Seq((s"k$b", "ACGTACGT")).toDF("id", "seq"), b.toLong,
        "seq", "ACGTACGT", tableDir, "id", "s1")
    }
    // every batch landed; the chain was compacted back under the bound
    val table = NdjsonIngest.readLatest(spark, tableDir)
    assert(table.count() === 10)
    assert(NdjsonIngest.latestLayers(tableDir).length <= 9)
    // delta layers hold one row each (O(batch) writes): check a mid-chain
    // pre-compaction layer kept on disk for old readers
    assert(spark.read.parquet(s"$tableDir/v3").count() === 1)
    // gc reclaims the dirs the compacted pointer no longer references
    val dead = NdjsonIngest.gcVersions(tableDir)
    assert(dead.nonEmpty)
    assert(NdjsonIngest.readLatest(spark, tableDir).count() === 10)
  }

  test("file-source stream restart with a widened schema evolves end-to-end") {
    import graft.sources.NdjsonIngest
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("sevo2").toFile
    val inDir = new java.io.File(root, "in"); inDir.mkdirs()
    val tableDir = s"$root/table"
    def drop(name: String, lines: String*): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(inDir, name).toPath, lines.mkString("\n"))
    val ckDir = s"$root/ck"
    val s1 = StructType(Seq(
      StructField("id", StringType), StructField("seq", StringType)))
    drop("f1.ndjson", """{"id":"k1","seq":"ACGTACGT"}""")
    graft.streaming.StreamingIngest.start(
      spark, inDir.toString, s1, "seq", "ACGTACGT", tableDir, "id",
      ckDir).awaitTermination()
    assert(NdjsonIngest.readLatest(spark, tableDir).count() === 1)
    // the source gains a qc column; the stream restarts on the SAME
    // checkpoint (so only the new file is processed) with the widened
    // read schema, opting into additive evolution
    val s2 = StructType(s1.fields :+ StructField("qc", DoubleType))
    drop("f2.ndjson", """{"id":"k2","seq":"TCGTACGT","qc":0.75}""")
    graft.streaming.StreamingIngest.start(
      spark, inDir.toString, s2, "seq", "ACGTACGT", tableDir, "id",
      ckDir, evolve = true).awaitTermination()
    val t = NdjsonIngest.readLatest(spark, tableDir)
    assert(t.count() === 2)
    assert(t.columns.contains("qc"))
    // the pre-evolution row reads null under the head schema; the new
    // row carries its value
    assert(t.filter(col("id") === "k1").select("qc").as[Option[Double]]
      .collect().toSeq === Seq(None))
    assert(t.filter(col("id") === "k2").select("qc").as[Option[Double]]
      .collect().toSeq === Seq(Some(0.75)))
  }

  test("stream restart with a new schema version evolves the table only when opted in") {
    import graft.sources.NdjsonIngest
    val root = java.nio.file.Files.createTempDirectory("sevolve").toFile
    val tableDir = s"$root/table"
    graft.streaming.StreamingIngest.ingestBatch(
      spark, Seq(("k1", "ACGTACGT")).toDF("id", "seq"), 0L,
      "seq", "ACGTACGT", tableDir, "id", "s1")
    // the stream restarts with a source that gained a `qc` column: the
    // default (strict) path still treats that as drift and aborts loudly
    val b = Seq(("k2", "TCGTACGT", 0.9)).toDF("id", "seq", "qc")
    intercept[NdjsonIngest.SchemaMismatch] {
      graft.streaming.StreamingIngest.ingestBatch(
        spark, b, 0L, "seq", "ACGTACGT", tableDir, "id", "s2")
    }
    // opted in, the same batch commits through additive evolution: old
    // rows surface qc as null, the old layer is untouched
    graft.streaming.StreamingIngest.ingestBatch(
      spark, b, 0L, "seq", "ACGTACGT", tableDir, "id", "s2", evolve = true)
    val t = NdjsonIngest.readLatest(spark, tableDir)
    assert(t.count() === 2)
    assert(t.filter(col("id") === "k1").select("qc").as[Option[Double]]
      .collect().toSeq === Seq(None))
    assert(t.filter(col("id") === "k2").select("qc").as[Option[Double]]
      .collect().toSeq === Seq(Some(0.9)))
    // replay of the evolving batch is still a no-op (same namespaced tag)
    val nv = new java.io.File(tableDir).list().count(_.startsWith("v"))
    graft.streaming.StreamingIngest.ingestBatch(
      spark, b, 0L, "seq", "ACGTACGT", tableDir, "id", "s2", evolve = true)
    assert(new java.io.File(tableDir).list().count(_.startsWith("v")) === nv)
  }

  test("session_window aggregation finalizes sessions past the watermark; batch parity") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.sessionWindows(
      mem.toDF.toDF("user_id", "ts"), "10 minutes")
      .writeStream.format("memory").queryName("swin")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(1)))
      q.processAllAvailable()
      // watermark hasn't passed any session's close yet
      assert(spark.table("swin").count() === 0)
      // an event 50 min later pushes the watermark past both sessions'
      // close (last event + 10 min gap) → they finalize
      mem.addData((3L, ts(50)))
      q.processAllAvailable()
      val rows = spark.table("swin")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSet
      assert(rows === Set((1L, 2L), (2L, 1L)))
    } finally q.stop()
    // identical call on a static frame: same sessions, no state store
    val b = EventStreams.sessionWindows(
      Seq((1L, ts(0)), (1L, ts(5)), (1L, ts(45)), (2L, ts(1)))
        .toDF("user_id", "ts"), "10 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    assert(b === Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("sessionize closes sessions on gap and on timeout") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionize(
      mem.toDS.withWatermark("ts", "0 seconds").as[Ev], gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1L, ts(0), "a"), Ev(1L, ts(5), "a"))
      q.processAllAvailable()
      // same session, still open
      assert(spark.table("sess").count() === 0)
      // 40 min later → gap closes the first session in-batch
      mem.addData(Ev(1L, ts(45), "a"))
      q.processAllAvailable()
      val rows = spark.table("sess")
        .as[EventStreams.SessionOut].collect().toSet
      assert(rows.exists(s => s.user_id == 1L && s.n_events == 2L &&
        s.duration_ms == 5 * 60 * 1000))
    } finally q.stop()
  }
}
