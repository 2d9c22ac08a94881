package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.SimHashIndex
import graft.sources.{ChangeFeedConsumer, NdjsonIngest}

class SimHashIndexSpec extends SparkSpec {
  import spark.implicits._

  // near-dups: one word swapped in a long-enough document; `other` shares
  // almost no tokens, so its signature is far in hamming space
  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far away " +
      "across the wide green field toward the old stone bridge"
  private val nearDup = base.replace("jumps", "leaps")
  private val other =
    "completely different words about spark shuffles parquet row groups " +
      "executors stages tasks codegen whole stage compilation"

  private def docs(r: (Long, String, String)*) =
    r.toDF("doc_id", "source", "text")

  test("build + candidates: band equi-join + popcount verify finds near-dups only") {
    val dir = Files.createTempDirectory("shidx").toString + "/idx"
    val d = docs((1L, "s", base), (2L, "s", nearDup), (3L, "s", other))
    SimHashIndex.build(spark, d, "doc_id", "source", "text", dir)
    assert(SimHashIndex.layers(dir) === Seq("1"))
    val pairs = SimHashIndex.candidates(spark, d, "doc_id", "source", "text", dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc produced candidates: $pairs")
    // an exact duplicate probes at hamming 0
    val probe = docs((9L, "s", base))
    val hit = SimHashIndex.candidates(spark, probe, "doc_id", "source", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(hit.contains((1L, 9L, 0)))
    // different SOURCE blocks the pair even for identical text
    val cross = docs((9L, "other_src", base))
    assert(SimHashIndex.candidates(spark, cross, "doc_id", "source", "text", dir)
      .count() === 0)
    // double-build refuses; load demands a committed index
    intercept[IllegalArgumentException] {
      SimHashIndex.build(spark, d, "doc_id", "source", "text", dir)
    }
    intercept[IllegalArgumentException] { SimHashIndex.load(spark, dir + "_nope") }
  }

  test("signature matches the in-query q_simhash construction") {
    // the index and the in-query ops must stay in lockstep: compare the
    // persisted packed bands against a signature computed directly
    val d = docs((1L, "s", base), (3L, "s", other))
    val toks = d.select(col("doc_id").as("id"), col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val sig = SimHashIndex.signature(toks, Seq("id"))
      .as[(Long, String)].collect().toMap
    val dir = Files.createTempDirectory("shsig").toString + "/idx"
    SimHashIndex.build(spark, d, "doc_id", "source", "text", dir)
    SimHashIndex.load(spark, dir).collect().foreach { r =>
      val sh = sig(r.getAs[Long]("id"))
      val band = r.getAs[Int]("band")
      val expected = java.lang.Integer.parseInt(
        sh.substring(16 * band, 16 * band + 16), 2)
      assert(r.getAs[Int]("bits") === expected, s"id=${r.get(0)} band=$band")
      (0 until 4).foreach { b =>
        assert(r.getAs[Int](s"p$b") ===
          java.lang.Integer.parseInt(sh.substring(16 * b, 16 * b + 16), 2))
      }
    }
  }

  test("change feed keeps the persisted simhash index fresh at O(batch)") {
    val root = Files.createTempDirectory("shfeed").toString
    val tableDir = s"$root/docs"; val idxDir = s"$root/idx"
    val cursorDir = s"$root/cursor"
    NdjsonIngest.appendVersion(
      docs((1L, "s", base), (3L, "s", other)), tableDir, "doc_id") // commit 1
    SimHashIndex.build(spark,
      NdjsonIngest.readLatest(spark, tableDir), "doc_id", "source", "text", idxDir)
    assert(ChangeFeedConsumer.process(spark, tableDir, "doc_id", cursorDir)(
      _ => ()).contains((0L, 1L)))
    // O(batch) delta append with a near-dup of an OLD document
    NdjsonIngest.appendDelta(
      docs((42L, "s", nearDup)), tableDir, "doc_id") // commit 2
    var fed: org.apache.spark.sql.DataFrame = null
    val r = ChangeFeedConsumer.process(spark, tableDir, "doc_id", cursorDir) { df =>
      fed = df.filter(col("_change_type") === "insert")
        .select("doc_id", "source", "text")
      SimHashIndex.append(spark, fed, "doc_id", "source", "text", idxDir)
      ()
    }
    assert(r.contains((1L, 2L)))
    assert(SimHashIndex.layers(idxDir) === Seq("1", "2"))
    // the fed batch probes the whole index: the CROSS-LAYER pair with the
    // old document surfaces without re-signing any old row
    val pairs = SimHashIndex
      .candidates(spark, fed, "doc_id", "source", "text", idxDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 42L)), s"cross-layer pair missing: $pairs")
    // once the batch's layer is committed, an ID probe (no re-signing)
    // yields the same pairs as re-signing the batch text
    val byId = SimHashIndex
      .candidatesForIds(spark, fed.select("doc_id"), idxDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(byId === pairs, s"id-probe $byId != text-probe $pairs")
  }

  test("deleted documents stop producing pairs when probed with the live set") {
    val root = Files.createTempDirectory("shdel").toString
    val tableDir = s"$root/docs"; val idxDir = s"$root/idx"
    NdjsonIngest.appendVersion(
      docs((1L, "s", base), (2L, "s", nearDup), (3L, "s", other)),
      tableDir, "doc_id")
    SimHashIndex.build(spark,
      NdjsonIngest.readLatest(spark, tableDir), "doc_id", "source", "text", idxDir)
    val probe = docs((9L, "s", base))
    def pairsWithLive() = SimHashIndex.candidates(
      spark, probe, "doc_id", "source", "text", idxDir,
      live = Some(NdjsonIngest.readLatestMerged(spark, tableDir, "doc_id")
        .select("doc_id")))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairsWithLive().contains((1L, 9L)))
    // tombstone doc 1: its persisted signature must stop matching
    NdjsonIngest.deleteDelta(Seq(1L).toDF("doc_id"), tableDir, "doc_id")
    val after = pairsWithLive()
    assert(!after.exists(p => p._1 == 1L || p._2 == 1L), s"deleted doc in $after")
    assert(after.contains((2L, 9L))) // the near-dup survivor still pairs
    // without the live filter the stale signature would still match
    assert(SimHashIndex.candidates(spark, probe, "doc_id", "source", "text", idxDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      .contains((1L, 9L)))
    // purge-on-compact physically removes the tombstoned signature: even a
    // live-blind probe no longer sees it
    assert(SimHashIndex.compact(spark, idxDir,
      live = Some(NdjsonIngest.readLatestMerged(spark, tableDir, "doc_id")
        .select("doc_id"))))
    assert(SimHashIndex.layers(idxDir).length === 1)
    assert(SimHashIndex.load(spark, idxDir).select("id").distinct()
      .as[Long].collect().toSet === Set(2L, 3L))
    assert(!SimHashIndex.candidates(spark, probe, "doc_id", "source", "text", idxDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      .exists(p => p._1 == 1L || p._2 == 1L))
  }

  test("append recovers from an orphan layer dir; compaction folds the chain") {
    val dir = Files.createTempDirectory("shorphan").toString + "/idx"
    SimHashIndex.build(spark, docs((1L, "s", base)), "doc_id", "source", "text", dir)
    // orphan: layer 2 on disk, never committed
    SimHashIndex.bandRows(docs((2L, "s", nearDup)), "doc_id", "source", "text")
      .write.parquet(s"$dir/bands/layer=2")
    SimHashIndex.append(spark, docs((3L, "s", other)), "doc_id", "source", "text", dir)
    assert(SimHashIndex.layers(dir) === Seq("1", "3"))
    assert(SimHashIndex.load(spark, dir).select("id").distinct()
      .as[Long].collect().toSet === Set(1L, 3L))
    // grow the chain past the bound, compact, candidates unchanged
    (0 until 8).foreach { i =>
      SimHashIndex.append(spark,
        docs((100L + i, "s", s"$base extra token$i")), "doc_id", "source", "text", dir)
    }
    val probe = docs((9L, "s", base))
    val before = SimHashIndex.candidates(spark, probe, "doc_id", "source", "text", dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(SimHashIndex.layers(dir).length === 10)
    assert(SimHashIndex.compact(spark, dir, maxLayers = 8))
    assert(SimHashIndex.layers(dir).length === 1)
    val after = SimHashIndex.candidates(spark, probe, "doc_id", "source", "text", dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(after === before)
    assert(!SimHashIndex.compact(spark, dir, maxLayers = 8))
    // the physical half is DEFERRED (drain contract, like gcVersions):
    // compact leaves the superseded dirs for in-flight readers; gc()
    // reclaims them — after it, disk holds exactly the committed chain
    def onDisk() = Option(new java.io.File(s"$dir/bands").listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("layer=")).toSet
    assert(onDisk().size > 1) // superseded layers still present post-flip
    assert(SimHashIndex.gc(dir).nonEmpty)
    assert(onDisk() === SimHashIndex.layers(dir).map(l => s"layer=$l").toSet)
  }
}
