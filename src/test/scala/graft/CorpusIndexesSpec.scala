package graft

import java.nio.file.Files
import graft.core.CorpusIndexes
import graft.operators.{DedupIndex, SimHashIndex}
import graft.sources.NdjsonIngest

/** One-call corpus preprocessing: indexes + cluster table advance with
  * the change feed — O(batch) folds for insert ticks, the sound
  * rebuild/purge path for deletes and upserts.
  */
class CorpusIndexesSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far away " +
      "across the wide green field toward the old stone bridge"
  private val nearDup = base.replace("jumps", "leaps")
  private val other =
    "completely different words about spark shuffles parquet row groups " +
      "executors stages tasks codegen whole stage compilation"

  private def docs(r: (Long, String, String)*) =
    r.toDF("doc_id", "source", "text")

  private def clusterMap(stateDir: String): Map[Long, Long] =
    CorpusIndexes.clusters(spark, stateDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bootstrap → insert tick → delete tick → upsert tick") {
    val root = Files.createTempDirectory("corpusidx").toString
    val tableDir = s"$root/docs"; val state = s"$root/state"

    // bootstrap from the table's current state
    NdjsonIngest.appendVersion(
      docs((1L, "s", base), (3L, "s", other)), tableDir, "doc_id") // c1
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((0L, 1L)))
    assert(clusterMap(state) === Map(1L -> 1L, 3L -> 3L))
    assert(DedupIndex.layers(s"$state/minhash") === Seq("1"))
    assert(SimHashIndex.layers(s"$state/simhash") === Seq("1"))
    // fresh → no-op
    assert(CorpusIndexes.sync(spark, tableDir, state).isEmpty)

    // INSERT tick: a near-dup of doc 1 arrives → O(batch) fold merges it
    NdjsonIngest.appendDelta(docs((42L, "s", nearDup)), tableDir, "doc_id") // c2
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((1L, 2L)))
    assert(clusterMap(state) === Map(1L -> 1L, 3L -> 3L, 42L -> 1L))
    assert(DedupIndex.layers(s"$state/minhash").length === 2) // appended
    assert(SimHashIndex.layers(s"$state/simhash").length === 2)

    // DELETE tick: doc 1 goes → rebuild path purges its signatures and
    // re-derives the cluster table from the live world
    NdjsonIngest.deleteDelta(Seq(1L).toDF("doc_id"), tableDir, "doc_id") // c3
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((2L, 3L)))
    assert(clusterMap(state) === Map(3L -> 3L, 42L -> 42L))
    assert(SimHashIndex.load(spark, s"$state/simhash")
      .select("id").distinct().as[Long].collect().toSet === Set(3L, 42L))
    assert(DedupIndex.load(spark, s"$state/minhash")
      .select("id").distinct().as[Long].collect().toSet === Set(3L, 42L))

    // UPSERT tick: doc 3's text becomes doc 42's → its STALE signature
    // must be re-signed (id survives, content changed) and the pair forms
    NdjsonIngest.upsertDelta(docs((3L, "s", nearDup)), tableDir, "doc_id") // c4
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((3L, 4L)))
    assert(clusterMap(state) === Map(3L -> 3L, 42L -> 3L))
    // and nothing further to do
    assert(CorpusIndexes.sync(spark, tableDir, state).isEmpty)

    // generation retention: 4 syncs happened; only the last two gens remain
    val gens = new java.io.File(s"$state/clusters").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
      .map(_.getName.stripPrefix("gen=").toLong).sorted.toSeq
    assert(gens === Seq(3L, 4L), s"gens $gens")

    // DELETE-EVERYTHING tick: both chains fold to zero signatures and the
    // cluster table goes empty — and the state must stay consumable
    NdjsonIngest.deleteDelta(Seq(3L, 42L).toDF("doc_id"),
      tableDir, "doc_id") // c5
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((4L, 5L)))
    assert(clusterMap(state) === Map.empty)
    assert(SimHashIndex.load(spark, s"$state/simhash").isEmpty)
    assert(DedupIndex.load(spark, s"$state/minhash").isEmpty)
    // an idle poll (no new commits) still runs the deferred physical gc:
    // the superseded layer dirs — tombstoned docs' signatures — vanish
    assert(CorpusIndexes.sync(spark, tableDir, state).isEmpty)
    def layerDirs(sub: String) = Option(
      new java.io.File(s"$state/$sub/bands").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("layer="))
    assert(layerDirs("minhash") === DedupIndex.layers(s"$state/minhash").length)
    assert(layerDirs("simhash") === SimHashIndex.layers(s"$state/simhash").length)
    // life after the wipe: new docs index and cluster normally
    NdjsonIngest.appendDelta(
      docs((50L, "s", base), (51L, "s", nearDup)), tableDir, "doc_id") // c6
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((5L, 6L)))
    assert(clusterMap(state) === Map(50L -> 50L, 51L -> 50L))
  }

  test("a replayed insert tick does not duplicate index layers") {
    val root = Files.createTempDirectory("corpusreplay").toString
    val tableDir = s"$root/docs"; val state = s"$root/state"
    NdjsonIngest.appendVersion(
      docs((1L, "s", base), (3L, "s", other)), tableDir, "doc_id") // c1
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((0L, 1L)))
    NdjsonIngest.appendDelta(docs((42L, "s", nearDup)), tableDir, "doc_id") // c2
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((1L, 2L)))
    val mhLayers = DedupIndex.layers(s"$state/minhash")
    val shLayers = SimHashIndex.layers(s"$state/simhash")
    def sigRows() = (
      DedupIndex.load(spark, s"$state/minhash").count(),
      SimHashIndex.load(spark, s"$state/simhash").count())
    val rows = sigRows()
    // crash between the index commits and the cursor advance: rewind the
    // cursor so the (1,2] tick REPLAYS — the feed-range tag on the layer
    // entries must make both appends skip, keeping one signature per doc
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(state, "feed", "cursor"), "1")
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((1L, 2L)))
    assert(DedupIndex.layers(s"$state/minhash") === mhLayers)
    assert(SimHashIndex.layers(s"$state/simhash") === shLayers)
    assert(sigRows() === rows)
    assert(clusterMap(state) === Map(1L -> 1L, 3L -> 3L, 42L -> 1L))
    // the tag survives a fold: compacting then replaying again still skips
    assert(SimHashIndex.compact(spark, s"$state/simhash", maxLayers = 1))
    assert(DedupIndex.compact(spark, s"$state/minhash", maxLayers = 1))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(state, "feed", "cursor"), "1")
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((1L, 2L)))
    assert(SimHashIndex.layers(s"$state/simhash").length === 1)
    assert(DedupIndex.layers(s"$state/minhash").length === 1)
    assert(sigRows() === rows)
    // and that sync tick ran the deferred physical gc: the folded chains'
    // superseded layer dirs are gone from disk
    Seq(s"$state/simhash" -> SimHashIndex.layers(s"$state/simhash"),
        s"$state/minhash" -> DedupIndex.layers(s"$state/minhash"))
      .foreach { case (d, committed) =>
        val onDisk = Option(new java.io.File(s"$d/bands").listFiles())
          .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("layer=")).toSet
        assert(onDisk === committed.map(l => s"layer=$l").toSet, s"$d: $onDisk")
      }
  }

  test("a bootstrap-crash replay does not re-sign the corpus") {
    val root = Files.createTempDirectory("corpusboot").toString
    val tableDir = s"$root/docs"; val state = s"$root/state"
    NdjsonIngest.appendVersion(
      docs((1L, "s", base), (3L, "s", other)), tableDir, "doc_id") // c1
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((0L, 1L)))
    // crash between the bootstrap's index/cluster commits and the cursor
    // write: the cursor reads 0 and the WHOLE feed replays as an insert
    // tick — the bootstrap layers' feed:0-1 tag must mark it covered
    // instead of re-signing every doc as duplicates
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(state, "feed", "cursor"), "0")
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((0L, 1L)))
    def perId(df: org.apache.spark.sql.DataFrame) = df.groupBy("id").count()
      .select("count").distinct().as[Long].collect().toSet
    assert(perId(DedupIndex.load(spark, s"$state/minhash")) === Set(4L))
    assert(perId(SimHashIndex.load(spark, s"$state/simhash")) === Set(4L))
    assert(clusterMap(state) === Map(1L -> 1L, 3L -> 3L))
  }

  test("a replay WIDENED by new commits re-signs only the unseen commits") {
    val root = Files.createTempDirectory("corpuswide").toString
    val tableDir = s"$root/docs"; val state = s"$root/state"
    NdjsonIngest.appendVersion(
      docs((1L, "s", base), (3L, "s", other)), tableDir, "doc_id") // c1
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((0L, 1L)))
    NdjsonIngest.appendDelta(docs((42L, "s", nearDup)), tableDir, "doc_id") // c2
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((1L, 2L)))
    // crash before the cursor advance, AND commit 3 lands before the
    // retry — the replayed range widens to (1,3]; the chains' covered
    // watermark (2) must confine the append to commit 3's rows only
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(state, "feed", "cursor"), "1")
    NdjsonIngest.appendDelta(docs((43L, "s",
      "unrelated third topic entirely about cooking pasta with garlic " +
        "butter sauce and fresh basil leaves from the garden")),
      tableDir, "doc_id") // c3
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((1L, 3L)))
    // exactly one signature set per doc (4 band rows each), nothing doubled
    def perId(df: org.apache.spark.sql.DataFrame) = df.groupBy("id").count()
      .select("count").distinct().as[Long].collect().toSet
    assert(perId(DedupIndex.load(spark, s"$state/minhash")) === Set(4L))
    assert(perId(SimHashIndex.load(spark, s"$state/simhash")) === Set(4L))
    assert(clusterMap(state) === Map(1L -> 1L, 3L -> 3L, 42L -> 1L, 43L -> 43L))
  }

  test("a live file stream keeps the corpus indexes in lockstep end-to-end") {
    // the full production wiring in one place: NDJSON drop dir → file
    // stream → exactly-once delta commits on the versioned table →
    // change feed → CorpusIndexes.sync advancing every persisted index
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("corpusstream").toString
    val in = s"$root/in"; val tableDir = s"$root/docs"
    val state = s"$root/state"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType), StructField("text", StringType)))
    def drop(name: String, rows: (Long, String)*): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(in, name),
        rows.map { case (id, tx) =>
          s"""{"doc_id":$id,"source":"s","text":"$tx"}"""
        }.mkString("\n"))
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(in)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], id: Long) =>
          val sid = graft.streaming.StreamingIngest.streamIdOf(ckpt)
          val tag = s"$sid:batch$id"
          if (!NdjsonIngest.latestTag(tableDir).contains(tag) && !b.isEmpty)
            NdjsonIngest.appendDelta(b.toDF(), tableDir, "doc_id",
              tag = Some(tag))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drop("a.ndjson", 1L -> base, 3L -> other)
    runOnce()
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((0L, 1L)))
    assert(clusterMap(state) === Map(1L -> 1L, 3L -> 3L))

    // a later drop commits ONE delta layer; sync folds it as an
    // O(batch) insert tick (layer count grows by exactly one per chain)
    drop("b.ndjson", 42L -> nearDup)
    runOnce()
    assert(CorpusIndexes.sync(spark, tableDir, state).contains((1L, 2L)))
    assert(clusterMap(state) === Map(1L -> 1L, 3L -> 3L, 42L -> 1L))
    assert(DedupIndex.layers(s"$state/minhash").length === 2)
    assert(SimHashIndex.layers(s"$state/simhash").length === 2)

    // replaying the stream (same checkpoint, no new files) commits
    // nothing and sync is a no-op — the feed cursor holds
    runOnce()
    assert(CorpusIndexes.sync(spark, tableDir, state).isEmpty)
  }
}
