package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, DedupIndex, SimHashIndex}
import graft.sources.{ChangeFeedConsumer, NdjsonIngest}

/** ONE-CALL preprocessing for a versioned DOCUMENT corpus — the
  * training-data twin of [[Database.build]]'s genomic preprocessing:
  * keeps the persisted near-dup indexes (MinHash bands, SimHash bands)
  * AND the materialized dedup cluster table in lockstep with the
  * table's change feed.
  *
  * Layout under `stateDir`:
  * {{{
  *   minhash/       DedupIndex layer chain
  *   simhash/       SimHashIndex layer chain
  *   clusters/gen=N (node, comp) parquet generations
  *   clusters/meta  current generation pointer (tmp+rename, committed LAST)
  *   feed/cursor    ChangeFeedConsumer cursor
  * }}}
  *
  * Per [[sync]] tick (insert-only commits): both indexes `append` the
  * batch (O(batch) signing), the batch's candidate edges come from an ID
  * probe of the just-committed simhash layer ([[SimHashIndex
  * .candidatesForIds]] — no re-signing), and the cluster table advances
  * via [[ConnectedComponents.refresh]] (contracted O(batch) fixpoint +
  * one linear remap pass). A tick containing DELETES or UPSERTS
  * purge-compacts the chains for the touched ids, re-signs their current
  * text, and repairs ONLY the clusters containing a touched id
  * ([[ConnectedComponents.repair]]: affected clusters recompute from
  * scratch over their live members, merges into untouched clusters fold
  * via broadcast remap — O(affected + batch), not O(corpus)).
  * Crash-safe: the cursor advances only after every artifact
  * committed; each chain records the feed range it covers on its layer
  * entries, and an insert-tick append starts from max(covered, cursor) —
  * so a replayed tick re-signs only the commits that chain has not seen
  * (no duplicate signatures, even when new commits widen the retried
  * range), and its cluster refresh rewrites an identical generation
  * (idempotent).
  */
object CorpusIndexes {

  private def clustersMeta(stateDir: String) =
    java.nio.file.Paths.get(stateDir, "clusters", "meta")

  private def commitClusters(stateDir: String, gen: Long): Unit = {
    val tmp = java.nio.file.Paths.get(stateDir, "clusters", ".meta.tmp")
    java.nio.file.Files.createDirectories(tmp.getParent)
    java.nio.file.Files.writeString(tmp, gen.toString)
    java.nio.file.Files.move(tmp, clustersMeta(stateDir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def clustersGen(stateDir: String): Option[Long] = {
    val p = clustersMeta(stateDir)
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim.toLong)
    else None
  }

  /** The committed (node, comp) cluster table. */
  def clusters(spark: SparkSession, stateDir: String): DataFrame = {
    val gen = clustersGen(stateDir).getOrElse(
      throw new IllegalArgumentException(s"no committed clusters at $stateDir"))
    spark.read.parquet(s"$stateDir/clusters/gen=$gen")
  }

  private def writeClusters(stateDir: String, labels: DataFrame): Unit = {
    val gen = clustersGen(stateDir).getOrElse(0L) + 1
    labels.select(col("node"), col("comp"))
      .write.mode("overwrite").parquet(s"$stateDir/clusters/gen=$gen")
    commitClusters(stateDir, gen)
    // retain the committed gen plus one predecessor (for readers that
    // loaded just before the pointer flip); older generations are garbage
    val dir = new java.io.File(s"$stateDir/clusters")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
      .filter(_.getName.stripPrefix("gen=").toLongOption.exists(_ < gen - 1))
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }

  /** The live docs PINNED to commit `at` (the tick's head) — never
    * "latest": a commit landing mid-tick would otherwise be signed by this
    * tick's missing-doc append (untagged) and signed AGAIN when its own
    * tick arrives, accumulating duplicate signatures per doc.
    */
  private def liveDocs(spark: SparkSession, tableDir: String,
      idCol: String, at: Long): DataFrame =
    NdjsonIngest.readCommitMerged(spark, tableDir, idCol, at)

  /** Bring both signature chains to the table's current merged state.
    * `touched`: ids the triggering tick changed in ANY way. The purge
    * keeps (live MINUS touched): an upserted doc keeps its id, so a
    * purge by live-ids alone would retain its STALE signature — dropping
    * touched ids forces a fresh signing of their current text via the
    * missing-doc append below. Returns the (checkpointed) live docs.
    */
  private def syncChains(spark: SparkSession, tableDir: String,
      stateDir: String, idCol: String, srcCol: String, textCol: String,
      at: Long, touched: Option[DataFrame]): DataFrame = {
    val live = liveDocs(spark, tableDir, idCol, at).localCheckpoint()
    val liveIds = live.select(idCol)
    val keepIds = touched.foldLeft(liveIds) { (l, t) =>
      l.join(t.toDF("__t_id"), col(idCol) === col("__t_id"), "left_anti")
    }
    // signatures a live doc should have but the chain lacks (never
    // indexed, or purged above because its tick touched it)
    def missingFrom(indexed: DataFrame): DataFrame =
      live.join(indexed.select(col("id")).distinct().toDF("__have_id"),
        col(idCol) === col("__have_id"), "left_anti")
    // bootstrap builds carry their feed coverage (0, at] as a layer tag —
    // a crash before the cursor write then replays as an already-covered
    // insert tick instead of re-signing the whole corpus as duplicates
    if (DedupIndex.layers(s"$stateDir/minhash").isEmpty)
      DedupIndex.build(spark, live, idCol, textCol, s"$stateDir/minhash",
        tag = Some(s"feed:0-$at"))
    else {
      DedupIndex.compact(spark, s"$stateDir/minhash", live = Some(keepIds))
      val miss = missingFrom(DedupIndex.load(spark, s"$stateDir/minhash"))
      if (!miss.isEmpty)
        DedupIndex.append(spark, miss, idCol, textCol, s"$stateDir/minhash")
    }
    if (SimHashIndex.layers(s"$stateDir/simhash").isEmpty)
      SimHashIndex.build(spark, live, idCol, srcCol, textCol,
        s"$stateDir/simhash", tag = Some(s"feed:0-$at"))
    else {
      SimHashIndex.compact(spark, s"$stateDir/simhash", live = Some(keepIds))
      val miss = missingFrom(SimHashIndex.load(spark, s"$stateDir/simhash"))
      if (!miss.isEmpty)
        SimHashIndex.append(spark, miss, idCol, srcCol, textCol,
          s"$stateDir/simhash")
    }
    live
  }

  /** Bootstrap: index the live docs as of `at` and cluster from scratch. */
  private def rebuild(spark: SparkSession, tableDir: String, stateDir: String,
      idCol: String, srcCol: String, textCol: String, at: Long): Unit = {
    val live = syncChains(spark, tableDir, stateDir, idCol, srcCol, textCol,
      at, touched = None)
    val liveIds = live.select(idCol)
    val edges = SimHashIndex.candidatesForIds(spark, liveIds, s"$stateDir/simhash")
    writeClusters(stateDir, ConnectedComponents.components(
      edges, "a_id", "b_id", liveIds.toDF("node"), "node"))
  }

  /** Advance every artifact to the table's head. Returns the commit
    * range processed, or None when already fresh. First call bootstraps
    * from the table's current state.
    */
  def sync(spark: SparkSession, tableDir: String, stateDir: String,
      idCol: String = "doc_id", srcCol: String = "source",
      textCol: String = "text"): Option[(Long, Long)] = {
    if (clustersGen(stateDir).isEmpty) {
      // bootstrap: index the world as-is, then mark the feed consumed so
      // the next tick starts from here
      val head = NdjsonIngest.commits(tableDir).lastOption.getOrElse(0L)
      require(head > 0, s"no commits at $tableDir")
      rebuild(spark, tableDir, stateDir, idCol, srcCol, textCol, head)
      ChangeFeedConsumer.writeCursor(s"$stateDir/feed", head)
      return Some((0L, head))
    }
    // physical gc of layers superseded by EARLIER compactions: deferred a
    // full poll so any reader that resolved the pre-flip meta has drained
    // (same contract as NdjsonIngest.gcVersions). Runs on EVERY poll, not
    // only ticks with new data — a feed that goes idle right after a
    // delete still reclaims the tombstoned docs' signatures one poll later
    DedupIndex.gc(s"$stateDir/minhash")
    SimHashIndex.gc(s"$stateDir/simhash")
    ChangeFeedConsumer.processWithRange(spark, tableDir, idCol,
        s"$stateDir/feed") { (feed: DataFrame, range: (Long, Long)) =>
      val f = feed.localCheckpoint()
      // anything but plain inserts (deletes, upsert rows — which OVERWRITE
      // their pk, so appending them would keep the stale signature too —
      // or a mid-life snapshot) makes the refresh algebra unsound:
      // purge-and-repair path
      val hasNonInsert = f.filter(col("_change_type") =!= "insert").limit(1)
        .count() > 0
      if (hasNonInsert) {
        // delete/upsert tick: purge+re-sign the chains for the touched
        // ids, then repair ONLY the clusters containing one — untouched
        // clusters keep their labels (modulo a broadcast merge remap),
        // never re-entering the fixpoint. O(affected + Δ), not O(corpus).
        val touched = f.select(idCol).distinct().localCheckpoint()
        val live = syncChains(spark, tableDir, stateDir, idCol, srcCol,
          textCol, range._2, Some(touched))
        writeClusters(stateDir, ConnectedComponents.repair(
          clusters(spark, stateDir), touched, live.select(idCol),
          ids => SimHashIndex.candidatesForIds(spark, ids,
            s"$stateDir/simhash")
            .select(col("a_id").as("a"), col("b_id").as("b"))))
      } else {
        val batch = f.filter(col("_change_type") === "insert")
          .select(col(idCol), col(srcCol), col(textCol), col("_commit"))
          .localCheckpoint()
        // replay guard, per chain: each tagged layer records the feed
        // range it covers; an append starts from the chain's covered
        // watermark (or the cursor, whichever is later), so a crash
        // between an index commit and the cursor advance — even with NEW
        // commits landing before the retry widens the range — re-signs
        // only the commits the chain has not seen. Completed non-insert
        // ticks are covered by the cursor itself (range._1).
        def coveredTo(tags: Set[String]): Long =
          graft.operators.BandChain.coveredTo(tags, range._1)
        def appendFrom(covered: Long)(
            append: (DataFrame, String) => Unit): Unit =
          if (covered < range._2)
            append(batch.filter(col("_commit") > covered),
              s"feed:$covered-${range._2}")
        appendFrom(coveredTo(DedupIndex.tags(s"$stateDir/minhash"))) {
          (b, tag) => DedupIndex.append(spark, b, idCol, textCol,
            s"$stateDir/minhash", Some(tag)); ()
        }
        appendFrom(coveredTo(SimHashIndex.tags(s"$stateDir/simhash"))) {
          (b, tag) => SimHashIndex.append(spark, b, idCol, srcCol, textCol,
            s"$stateDir/simhash", Some(tag)); ()
        }
        val edges = SimHashIndex.candidatesForIds(spark,
          batch.select(idCol), s"$stateDir/simhash")
        writeClusters(stateDir, ConnectedComponents.refresh(
          clusters(spark, stateDir), edges, "a_id", "b_id",
          batch.select(col(idCol).as("node")), "node"))
      }
    }
  }
}
