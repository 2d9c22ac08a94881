package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.DedupIndex
import graft.sources.{ChangeFeedConsumer, NdjsonIngest}

class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far away"
  private val nearDup =
    "the quick brown fox leaps over the lazy dog and then runs far away"
  private val other =
    "completely different words about spark shuffles and parquet row groups"

  test("build + candidates: banded equi-join finds dup pairs, not others") {
    val dir = Files.createTempDirectory("dedupidx").toString + "/idx"
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    DedupIndex.build(spark, docs, "doc_id", "text", dir)
    assert(DedupIndex.layers(dir) === Seq("1"))
    // probing the corpus against itself: the near-dup pair surfaces, the
    // unrelated doc pairs with nobody
    val pairs = DedupIndex.candidates(spark, docs, "doc_id", "text", dir)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc produced candidates: $pairs")
    // an exact duplicate probe hits every band of its original
    val probe = Seq((9L, base)).toDF("doc_id", "text")
    val hit = DedupIndex.candidates(spark, probe, "doc_id", "text", dir)
      .as[(Long, Long)].collect().toSet
    assert(hit.contains((1L, 9L)))
    // double-build refuses; append/load demand a committed index
    intercept[IllegalArgumentException] {
      DedupIndex.build(spark, docs, "doc_id", "text", dir)
    }
    intercept[IllegalArgumentException] {
      DedupIndex.load(spark, dir + "_nope")
    }
  }

  test("change feed keeps the persisted dedup index fresh at O(batch)") {
    val root = Files.createTempDirectory("dedupfeed").toString
    val tableDir = s"$root/docs"; val idxDir = s"$root/idx"
    val cursorDir = s"$root/cursor"
    // the document table is an ordinary versioned table
    NdjsonIngest.appendVersion(
      Seq((1L, base), (3L, other)).toDF("doc_id", "text"),
      tableDir, "doc_id")                                      // commit 1
    // preprocessing: index the current table, mark the feed consumed
    DedupIndex.build(spark,
      NdjsonIngest.readLatest(spark, tableDir), "doc_id", "text", idxDir)
    assert(ChangeFeedConsumer.process(spark, tableDir, "doc_id", cursorDir)(
      _ => ()).contains((0L, 1L)))
    // a live O(batch) delta append with a near-dup of an OLD document...
    NdjsonIngest.appendDelta(
      Seq((42L, nearDup)).toDF("doc_id", "text"), tableDir, "doc_id") // commit 2
    // ...and ONE consumer tick signs exactly the new rows into layer 2
    var fed: org.apache.spark.sql.DataFrame = null
    val r = ChangeFeedConsumer.process(spark, tableDir, "doc_id", cursorDir) { df =>
      fed = df.filter(col("_change_type") === "insert")
        .select("doc_id", "text")
      DedupIndex.append(spark, fed, "doc_id", "text", idxDir)
      ()
    }
    assert(r.contains((1L, 2L)))
    assert(DedupIndex.layers(idxDir) === Seq("1", "2"))
    assert(spark.read.parquet(s"$idxDir/bands/layer=2")
      .select("id").distinct().as[Long].collect().toSeq === Seq(42L))
    // the fed batch probes the whole index: the CROSS-LAYER pair with the
    // old document surfaces without recomputing any old signature
    val pairs = DedupIndex
      .candidates(spark, fed, "doc_id", "text", idxDir)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 42L)), s"cross-layer pair missing: $pairs")
    // idle tick is a no-op
    assert(ChangeFeedConsumer.process(spark, tableDir, "doc_id", cursorDir)(
      _ => fail("callback on empty feed")).isEmpty)
  }

  test("deleted documents stop producing candidates when probed with the live set") {
    val root = Files.createTempDirectory("deldedup").toString
    val tableDir = s"$root/docs"; val idxDir = s"$root/idx"
    NdjsonIngest.appendVersion(
      Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text"),
      tableDir, "doc_id")
    DedupIndex.build(spark,
      NdjsonIngest.readLatest(spark, tableDir), "doc_id", "text", idxDir)
    val probe = Seq((9L, base)).toDF("doc_id", "text")
    def withLive() = DedupIndex.candidates(spark, probe, "doc_id", "text", idxDir,
      live = Some(NdjsonIngest.readLatestMerged(spark, tableDir, "doc_id")
        .select("doc_id")))
      .as[(Long, Long)].collect().toSet
    assert(withLive().contains((1L, 9L)))
    NdjsonIngest.deleteDelta(Seq(1L).toDF("doc_id"), tableDir, "doc_id")
    val after = withLive()
    assert(!after.exists(p => p._1 == 1L || p._2 == 1L), s"deleted doc in $after")
    // routing-blind probe still sees the stale signature (documented)
    assert(DedupIndex.candidates(spark, probe, "doc_id", "text", idxDir)
      .as[(Long, Long)].collect().toSet.contains((1L, 9L)))
    // purge-on-compact physically removes it
    assert(DedupIndex.compact(spark, idxDir,
      live = Some(NdjsonIngest.readLatestMerged(spark, tableDir, "doc_id")
        .select("doc_id"))))
    assert(DedupIndex.load(spark, idxDir).select("id").distinct()
      .as[Long].collect().toSet === Set(2L, 3L))
    assert(!DedupIndex.candidates(spark, probe, "doc_id", "text", idxDir)
      .as[(Long, Long)].collect().toSet.exists(p => p._1 == 1L || p._2 == 1L))
  }

  test("append recovers from an orphan layer dir (crash between write and commit)") {
    val dir = Files.createTempDirectory("deduporphan").toString + "/idx"
    DedupIndex.build(spark, Seq((1L, base)).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    // simulate a crash: layer 2 written on disk but never committed to meta
    DedupIndex.bandSignatures(
      Seq((2L, nearDup)).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(s"$dir/bands/layer=2")
    assert(DedupIndex.layers(dir) === Seq("1"))
    // append must number PAST the orphan, not collide with ErrorIfExists
    DedupIndex.append(spark, Seq((3L, other)).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    assert(DedupIndex.layers(dir) === Seq("1", "3"))
    // readers see only committed layers — the orphan stays invisible
    val ids = DedupIndex.load(spark, dir).select("id").distinct()
      .as[Long].collect().toSet
    assert(ids === Set(1L, 3L))
  }

  test("a pre-slicing index (legacy meta) is refused loudly, not silently empty") {
    // an index written under the old full-md5 signature scheme can never
    // equi-join against the sliced sigs — probes would return ZERO
    // candidates forever; the format marker turns that into a loud error
    val dir = Files.createTempDirectory("dedupfmt").toString + "/idx"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "meta"), "1\n2") // legacy: no format line
    val e = intercept[IllegalStateException] { DedupIndex.layers(dir) }
    assert(e.getMessage.contains("rebuild"))
  }

  test("compaction folds the layer chain; candidates unchanged") {
    val dir = Files.createTempDirectory("dedupcomp").toString + "/idx"
    DedupIndex.build(spark, Seq((1L, base)).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    (0 until 9).foreach { i =>
      DedupIndex.append(spark,
        Seq((100L + i, s"$base extra token$i")).toDF("doc_id", "text"),
        "doc_id", "text", dir)
    }
    val probe = Seq((9L, base)).toDF("doc_id", "text")
    val before = DedupIndex.candidates(spark, probe, "doc_id", "text", dir)
      .as[(Long, Long)].collect().toSet
    assert(DedupIndex.layers(dir).length === 10)
    assert(DedupIndex.compact(spark, dir, maxLayers = 8))
    assert(DedupIndex.layers(dir).length === 1)
    val after = DedupIndex.candidates(spark, probe, "doc_id", "text", dir)
      .as[(Long, Long)].collect().toSet
    assert(after === before)
    // under the bound: no-op
    assert(!DedupIndex.compact(spark, dir, maxLayers = 8))
    // the physical half is DEFERRED (drain contract, like gcVersions):
    // compact leaves the superseded dirs for in-flight readers; gc()
    // reclaims them — after it, disk holds exactly the committed chain
    def onDisk() = Option(new java.io.File(s"$dir/bands").listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("layer=")).toSet
    assert(onDisk().size > 1) // superseded layers still present post-flip
    assert(DedupIndex.gc(dir).nonEmpty)
    assert(onDisk() === DedupIndex.layers(dir).map(l => s"layer=$l").toSet)
  }
}
