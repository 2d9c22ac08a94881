package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** PERSISTED MinHash-LSH near-duplicate index over a document table,
  * maintained incrementally from the change feed — the dedup analog of
  * the ANN codes index and the sequence posting index: pay the signature
  * computation once per document at ingest, never rescan the corpus.
  *
  * Layout:
  * {{{
  *   dir/bands/layer=N/   parquet (band, sig, id) — LSH band signatures
  *   dir/meta             committed layer list, written LAST (tmp+rename)
  * }}}
  *
  * Same MinHash parameters as the in-query dedup ops (12 hash slots —
  * three keyed md5s sliced into four 32-bit values each — banded 4×3):
  * two documents land in the same (band, sig) bucket iff
  * one of their 4 band signatures is identical, so candidate pairs come
  * from an EQUI-join on (band, sig) — never an all-pairs comparison. An
  * [[append]] derives bands for the NEW documents only (O(batch), wired
  * to `ChangeFeedConsumer` ticks like the ANN index) and commits them as
  * an extra layer; readers union committed layers; [[compact]] bounds the
  * chain. Exact-Jaccard verification of candidates stays with the caller
  * against the live document table — the index stores no text.
  */
object DedupIndex {

  val NumHashes = 12
  val Bands = 4
  private val rows = NumHashes / Bands

  /** Chain protocol + signature-format guard ([[BandChain]]): format 2 =
    * three sliced md5s (8-hex-char slots); 1 (or no marker) = the
    * original twelve full-md5 slots.
    */
  private val chain = new BandChain("dedup", format = 2, legacyFormat = 1)

  private def commitMeta(dir: String, layers: Seq[String]): Unit =
    chain.commitMeta(dir, layers)

  def layers(dir: String): Seq[String] = chain.layers(dir)

  /** Every feed tag committed on any layer (replay-coverage probe). */
  def tags(dir: String): Set[String] = chain.tags(dir)

  private def nextLayer(dir: String, committed: Seq[String]): String =
    chain.nextLayer(dir, committed)

  /** The (id, band, sig) LSH signatures of `docs` — one shuffle (the
    * signature aggregate over exploded shingles), width-12 rows, then a
    * map-side band explode.
    */
  def bandSignatures(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // rebalance the narrow doc rows before the shingle fan-out + minhash
    // aggregate: a batch (or the one-file test table) often sits in a
    // single scan split, which would run the whole signing pass one-task
    val ex = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        explode(TF.shingles(col(textCol), 3)).as("s"))
    // three md5s per shingle, each sliced into four independent 32-bit
    // (8-hex-char) hash values — 12 slots at a quarter of the md5 work,
    // the same scheme as q_minhash_lsh (lexicographic min over fixed-
    // width hex == numeric min)
    val keyed = (0 until 3).foldLeft(ex) { (d, k) =>
      d.withColumn(s"m$k", md5(concat(lit(s"$k|"), col("s"))))
    }
    val mh = keyed.groupBy("id").agg(
      min(substring(col("m0"), 1, 8)).as("h0"),
      (1 until NumHashes).map(i =>
        min(substring(col(s"m${i / 4}"), 1 + 8 * (i % 4), 8)).as(s"h$i")): _*)
    mh.select(col("id"),
      explode(array((0 until Bands).map { bd =>
        struct(lit(bd).as("band"),
          concat_ws(",",
            (0 until rows).map(r => col(s"h${rows * bd + r}")): _*).as("sig"))
      }: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  private def writeLayer(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, dir: String, layer: String): Unit =
    bandSignatures(docs, idCol, textCol)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$dir/bands/layer=$layer")

  /** Index `docs` from scratch as layer 1 (errors when a committed index
    * already exists — use [[append]] for increments). `tag`, when given
    * (the feed range the bootstrap covers, `feed:0-N`), is recorded on the
    * layer: a crash between this commit and the consumer's cursor write
    * would otherwise replay the whole feed as an insert tick and re-sign
    * every bootstrapped doc as duplicates.
    */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, dir: String, tag: Option[String] = None): Unit =
    graft.core.DirLock.withLock(dir, ".commit.lock") {
    require(layers(dir).isEmpty, s"committed dedup index already at $dir")
    new java.io.File(dir).mkdirs()
    writeLayer(spark, docs, idCol, textCol, dir, "1")
    commitMeta(dir, Seq(chain.entryOf("1", tag.toSeq)))
  }

  /** Index only `newDocs` as the next layer — O(batch), the change-feed
    * consumer's per-tick work. `tag`, when given (the change-feed commit
    * range), is recorded on the layer entry; an append whose tag is
    * ALREADY committed is skipped (returns false) — a crash between this
    * commit and the feed cursor advance replays the tick, and without
    * the guard the same batch would accumulate as duplicate signatures.
    */
  def append(spark: SparkSession, newDocs: DataFrame, idCol: String,
      textCol: String, dir: String, tag: Option[String] = None): Boolean =
    graft.core.DirLock.withLock(dir, ".commit.lock") {
    val es = chain.entries(dir)
    require(es.nonEmpty, s"no committed dedup index at $dir")
    if (tag.exists(chain.tags(dir))) return false
    val next = nextLayer(dir, es.map(chain.nameOf))
    writeLayer(spark, newDocs, idCol, textCol, dir, next)
    commitMeta(dir, es :+ chain.entryOf(next, tag.toSeq))
    true
  }

  /** The committed band table (union of layers). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val ls = layers(dir)
    require(ls.nonEmpty, s"no committed dedup index at $dir")
    spark.read.option("basePath", s"$dir/bands")
      .parquet(ls.map(l => s"$dir/bands/layer=$l"): _*)
      .select("id", "band", "sig")
  }

  /** Candidate near-dup pairs of `probe` docs against the WHOLE index
    * (across every layer): equi-join on (band, sig), self-pairs dropped,
    * deduplicated with a < b. Callers verify with exact Jaccard against
    * the live table.
    *
    * `live`, when given (one `idCol` row per still-live document),
    * semi-joins the index side so signatures of since-deleted documents
    * stop producing pairs — band layers are append-only and outlive
    * `deleteDelta` (same contract as [[SimHashIndex.candidates]]).
    */
  def candidates(spark: SparkSession, probe: DataFrame, idCol: String,
      textCol: String, dir: String,
      live: Option[DataFrame] = None): DataFrame =
    pairsOf(spark, bandSignatures(probe, idCol, textCol)
      .select(col("id").as("p_id"), col("band"), col("sig")), dir, live)

  /** Candidate pairs for documents ALREADY IN the index — the committed
    * tick's shape: the probe's band signatures come from the index itself
    * (an id semi-join on the layer chain), no re-shingling or hashing.
    */
  def candidatesForIds(spark: SparkSession, ids: DataFrame, dir: String,
      live: Option[DataFrame] = None): DataFrame =
    pairsOf(spark, load(spark, dir)
      .join(ids.toDF("__q_id"), col("id") === col("__q_id"), "left_semi")
      .select(col("id").as("p_id"), col("band"), col("sig")), dir, live)

  private def pairsOf(spark: SparkSession, pb: DataFrame, dir: String,
      live: Option[DataFrame]): DataFrame = {
    val idx = live.foldLeft(load(spark, dir)) { (ix, lv) =>
      ix.join(lv.toDF("__live_id"), col("id") === col("__live_id"), "left_semi")
    }
    pb.join(idx, Seq("band", "sig"))
      .filter(col("p_id") =!= col("id"))
      .select(least(col("p_id"), col("id")).as("a_id"),
        greatest(col("p_id"), col("id")).as("b_id"))
      .distinct()
  }

  /** Fold a chain longer than `maxLayers` into one layer (signatures are
    * append-only: plain rewrite), bounding union width and small files —
    * the same policy as the posting-index and ANN-codes chains.
    * `live`, when given, PURGES tombstoned documents' signatures during
    * the fold (the physical half of the delete lifecycle — probe-time
    * `candidates(live = …)` filtering is the logical half), and forces
    * the fold even under the layer bound so a purge can be scheduled
    * explicitly.
    */
  def compact(spark: SparkSession, dir: String, maxLayers: Int = 8,
      live: Option[DataFrame] = None): Boolean =
    graft.core.DirLock.withLock(dir, ".commit.lock") {
    val es = chain.entries(dir)
    val ls = es.map(chain.nameOf)
    require(ls.nonEmpty, s"no committed dedup index at $dir")
    if (ls.length <= maxLayers && live.isEmpty) return false
    val next = nextLayer(dir, ls)
    val folded = live.foldLeft(load(spark, dir)) { (ix, lv) =>
      ix.join(lv.toDF("__live_id"), col("id") === col("__live_id"), "left_semi")
    }
    folded.write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$dir/bands/layer=$next")
    // feed coverage is MONOTONE (the consumer always appends from its
    // covered watermark), so the folded layer keeps only the newest feed
    // tag — enough to stay replay-recognisable without the meta line
    // growing with tick count
    commitMeta(dir, Seq(chain.entryOf(next,
      BandChain.pruneFeedTags(es.flatMap(chain.tagsOf).distinct))))
    true
  }

  /** Delete on-disk layer dirs not in the committed meta — the PHYSICAL
    * completion of earlier compactions plus crash-orphan cleanup. Same
    * drain contract as [[SimHashIndex.gc]] / `NdjsonIngest.gcVersions`:
    * call once readers of the superseded chain have drained; the corpus
    * consumer runs it at the start of every POLL. Returns the deleted
    * dir names.
    */
  def gc(dir: String): Seq[String] =
    graft.core.DirLock.withLock(dir, ".commit.lock")(
      chain.gcLayers(dir, layers(dir)))
}
