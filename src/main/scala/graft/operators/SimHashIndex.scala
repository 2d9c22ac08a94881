package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** PERSISTED SimHash near-duplicate index — the cosine-family twin of the
  * MinHash [[DedupIndex]]: pay the 64-bit signature once per document at
  * ingest, keep it in layered parquet band rows, and answer near-dup
  * probes with a band EQUI-join + popcount hamming verify, never an
  * all-pairs comparison.
  *
  * Layout (same chain discipline as DedupIndex / the posting index):
  * {{{
  *   dir/bands/layer=N/   parquet (id, source, p0..p3, band, bits)
  *   dir/meta             committed layer list, written LAST (tmp+rename)
  * }}}
  *
  * Signature/banding parameters match the in-query ops exactly (64
  * md5-nibble hyperplanes, 4 bands of 16 bits, hamming ≤ 3 — Manku
  * WWW'07): two documents are candidates iff one of their 4 packed band
  * values is identical, so a (source, band, bits) equi-join bounds the
  * probe cost by bucket size (2^16 values per band) at any corpus scale.
  * Each stored row carries the full packed signature (p0..p3) so the
  * hamming verify needs no second lookup. [[append]] signs only the NEW
  * documents — O(batch), the change-feed consumer's per-tick work.
  */
object SimHashIndex {

  val Bands = 4
  val HammingMax = 3

  /** Chain protocol + signature-format guard ([[BandChain]]): format 1 =
    * 64-bit md5-nibble hyperplanes, 4×16-bit packed bands.
    */
  private val chain = new BandChain("simhash", format = 1, legacyFormat = 0)

  private def commitMeta(dir: String, layers: Seq[String]): Unit =
    chain.commitMeta(dir, layers)

  def layers(dir: String): Seq[String] = chain.layers(dir)

  /** Every feed tag committed on any layer (replay-coverage probe). */
  def tags(dir: String): Set[String] = chain.tags(dir)

  private def nextLayer(dir: String, committed: Seq[String]): String =
    chain.nextLayer(dir, committed)

  /** 64-bit SimHash signature per group over exploded `tok` rows
    * (md5-nibble hyperplanes: bit k's vote is the top bit of nibble k of
    * md5("0|"+tok) for k ≤ 32, md5("1|"+tok) for k > 32). Vote sums are
    * integer shifts over conv-packed 16-bit chunks — value-identical to
    * summing ±1 votes (sign(Σ±1) ⟺ 2·ones ≥ n). Returns the group
    * columns plus `sh`, the 64-char '0'/'1' signature. Shared by the
    * in-query simhash ops and this index.
    */
  def signature(toks: DataFrame, groupCols: Seq[String]): DataFrame = {
    val withH = toks
      .withColumn("h0", md5(concat(lit("0|"), col("tok"))))
      .withColumn("h1", md5(concat(lit("1|"), col("tok"))))
    // each md5 half (16 hex chars = 64 bits) parses as ONE signed long
    // (conv toBase -10 = signed read, so the full 64-bit range round-trips
    // through cast("long")); plane bits then come from plain shifts — the
    // former per-token 16×(substring+conv+cast) chunk decode was the
    // dominant non-md5 cost of signing. Bit j of hex char p (1-based) =
    // (value >> (63 - 4(p-1))) & 1: top bit of nibble p ⇔ hex digit ≥ 8,
    // exactly the substr-IN-('8'..'f') vote the SQL oracle computes.
    val withChunks = Seq(
      ("l0", "h0", 1), ("l1", "h0", 17), ("l2", "h1", 1), ("l3", "h1", 17))
      .foldLeft(withH) { case (d, (l, h, off)) =>
        d.withColumn(l, conv(substring(col(h), off, 16), 16, -10).cast("long"))
      }
    val sums = (1 to 64).map { j =>
      val p = (j - 1) % 32                 // char index 0..31 within its md5
      val l = (if (j <= 32) 0 else 2) + p / 16
      val shift = 63 - 4 * (p % 16)        // nibble top-bit within the long
      sum(shiftright(col(s"l$l"), shift).bitwiseAND(1)).as(s"b$j")
    } :+ count(lit(1)).as("n")
    withChunks.groupBy(groupCols.map(col): _*).agg(sums.head, sums.tail: _*)
      .select(groupCols.map(col) :+
        concat((1 to 64).map(j =>
          when(col(s"b$j") * 2 >= col("n"), lit("1")).otherwise(lit("0"))): _*)
          .as("sh"): _*)
  }

  /** Packed band rows of `docs`: (id, source, p0..p3, band, bits) — one
    * shuffle (the signature aggregate), then a map-side band explode.
    */
  def bandRows(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String): DataFrame = {
    // rebalance the narrow doc rows before the token fan-out + 64-sum
    // signature aggregate (single-split batches would sign one-task)
    val toks = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), col(srcCol).as("source"),
      explode(TF.tokens(col(textCol))).as("tok"))
    val packed = signature(toks, Seq("id", "source")).select(
      col("id") +: col("source") +:
        (0 until Bands).map(b =>
          conv(substring(col("sh"), 1 + 16 * b, 16), 2, 10).cast("int")
            .as(s"p$b")): _*)
    packed.select(
      col("id") +: col("source") +: (0 until Bands).map(b => col(s"p$b")) :+
        explode(array((0 until Bands).map { bi =>
          struct(lit(bi).as("band"), col(s"p$bi").as("bits"))
        }: _*)).as("bd"): _*)
      .select(col("id") +: col("source") +:
        (0 until Bands).map(b => col(s"p$b")) :+
        col("bd.band").as("band") :+ col("bd.bits").as("bits"): _*)
  }

  private def writeLayer(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, dir: String, layer: String): Unit =
    bandRows(docs, idCol, srcCol, textCol)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$dir/bands/layer=$layer")

  /** Index `docs` from scratch as layer 1. */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
      srcCol: String, textCol: String, dir: String,
      tag: Option[String] = None): Unit =
    graft.core.DirLock.withLock(dir, ".commit.lock") {
    require(layers(dir).isEmpty, s"committed simhash index already at $dir")
    new java.io.File(dir).mkdirs()
    writeLayer(docs, idCol, srcCol, textCol, dir, "1")
    // tag = the feed range a bootstrap covers — without it, a crash before
    // the consumer's cursor write replays the whole feed as an insert tick
    // and re-signs every bootstrapped doc as duplicates
    commitMeta(dir, Seq(chain.entryOf("1", tag.toSeq)))
  }

  /** Sign only `newDocs` as the next layer — O(batch). `tag`, when given
    * (the change-feed commit range), is recorded on the layer entry; an
    * append whose tag is ALREADY committed is skipped (returns false) —
    * a crash between this commit and the feed cursor advance replays the
    * tick, and without the guard the same batch would accumulate as
    * duplicate signatures per document.
    */
  def append(spark: SparkSession, newDocs: DataFrame, idCol: String,
      srcCol: String, textCol: String, dir: String,
      tag: Option[String] = None): Boolean =
    graft.core.DirLock.withLock(dir, ".commit.lock") {
    val es = chain.entries(dir)
    require(es.nonEmpty, s"no committed simhash index at $dir")
    if (tag.exists(chain.tags(dir))) return false
    val next = nextLayer(dir, es.map(chain.nameOf))
    writeLayer(newDocs, idCol, srcCol, textCol, dir, next)
    commitMeta(dir, es :+ chain.entryOf(next, tag.toSeq))
    true
  }

  /** The committed band table (union of layers). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val ls = layers(dir)
    require(ls.nonEmpty, s"no committed simhash index at $dir")
    spark.read.option("basePath", s"$dir/bands")
      .parquet(ls.map(l => s"$dir/bands/layer=$l"): _*)
      .select("id", "source", "p0", "p1", "p2", "p3", "band", "bits")
  }

  /** Near-dup pairs of `probe` docs against the WHOLE index (every
    * layer): (source, band, bits) equi-join, popcount hamming ≤
    * [[HammingMax]] verify from the stored packed signatures, self-pairs
    * dropped, a < b deduped.
    *
    * `live`, when given (one `idCol` row per still-live document —
    * `NdjsonIngest.readMerged`'s id column for a merge-on-read table),
    * semi-joins the INDEX side so signatures of since-deleted documents
    * stop producing pairs: band layers are append-only and outlive
    * `deleteDelta`, so without the filter a tombstoned doc would keep
    * matching forever.
    */
  def candidates(spark: SparkSession, probe: DataFrame, idCol: String,
      srcCol: String, textCol: String, dir: String,
      live: Option[DataFrame] = None): DataFrame = {
    val pb = bandRows(probe, idCol, srcCol, textCol).select(
      col("id").as("q_id") +: col("source") +:
        (0 until Bands).map(b => col(s"p$b").as(s"q_p$b")) :+
        col("band") :+ col("bits"): _*)
    pairsOf(spark, pb, dir, live)
  }

  /** Candidate pairs for documents ALREADY IN the index — the change-feed
    * tick's shape once its layer is committed: the batch's band rows come
    * from the index itself (an id semi-join on the layer chain), so the
    * probe pays NO re-tokenization or signing, just the banded equi-join.
    */
  def candidatesForIds(spark: SparkSession, ids: DataFrame, dir: String,
      live: Option[DataFrame] = None): DataFrame = {
    val pb = load(spark, dir)
      .join(ids.toDF("__q_id"), col("id") === col("__q_id"), "left_semi")
      .select(col("id").as("q_id") +: col("source") +:
        (0 until Bands).map(b => col(s"p$b").as(s"q_p$b")) :+
        col("band") :+ col("bits"): _*)
    pairsOf(spark, pb, dir, live)
  }

  private def pairsOf(spark: SparkSession, pb: DataFrame, dir: String,
      live: Option[DataFrame]): DataFrame = {
    val ham: Column = (0 until Bands).map(k =>
      bit_count(col(s"q_p$k").bitwiseXOR(col(s"p$k")))).reduce(_ + _)
    val idx = live.foldLeft(load(spark, dir)) { (ix, lv) =>
      ix.join(lv.toDF("__live_id"), col("id") === col("__live_id"), "left_semi")
    }
    pb.join(idx, Seq("source", "band", "bits"))
      .filter(col("q_id") =!= col("id"))
      .withColumn("hamming", ham.cast("int"))
      .filter(col("hamming") <= HammingMax)
      .select(least(col("q_id"), col("id")).as("a_id"),
        greatest(col("q_id"), col("id")).as("b_id"), col("hamming"))
      .distinct()
  }

  /** Fold a chain longer than `maxLayers` into one layer. `live` (a
    * one-column frame of live ids), when given, PURGES tombstoned
    * documents' signatures during the fold and forces the fold even
    * under the layer bound — the physical half of the delete lifecycle
    * (probe-time `candidates(live = …)` is the logical half).
    */
  def compact(spark: SparkSession, dir: String, maxLayers: Int = 8,
      live: Option[DataFrame] = None): Boolean =
    graft.core.DirLock.withLock(dir, ".commit.lock") {
    val es = chain.entries(dir)
    val ls = es.map(chain.nameOf)
    require(ls.nonEmpty, s"no committed simhash index at $dir")
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
    * completion of earlier compactions (a purge-compact's fold drops the
    * tombstoned signatures from the live chain; this reclaims their
    * superseded dirs) plus crash-orphan cleanup. Same contract as
    * `NdjsonIngest.gcVersions`: call once in-flight readers of the
    * superseded chain have drained — a reader that resolved `meta`
    * before the flip may still be lazily scanning those files, and an
    * immediate delete would fail its job mid-read. [[graft.core
    * .CorpusIndexes.sync]] runs it at the START of every poll (idle polls
    * included), giving a full poll interval of grace. Returns the deleted
    * dir names.
    */
  def gc(dir: String): Seq[String] =
    graft.core.DirLock.withLock(dir, ".commit.lock")(
      chain.gcLayers(dir, layers(dir)))
}
