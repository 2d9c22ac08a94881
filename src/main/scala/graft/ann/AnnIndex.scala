package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** PERSISTED IVF-PQ index: train once at preprocessing, load-not-rebuild
  * at query time, extend incrementally on append — the same
  * train-is-a-preprocessing-step discipline the sequence posting indexes
  * follow ([[graft.Planner]] SeqIndex), applied to vector search. At
  * 100 TB the codes table is the only per-row artifact (m small ints per
  * vector, a fraction of the float payload) and the model (centroids +
  * codebooks) is a few KB that ships broadcast; retraining per query —
  * what the self-contained [[Pq.topk]] benchmark query does — would be a
  * non-starter.
  *
  * Layout under `indexDir`:
  *   model/centroids   parquet (cell, vec)        — IVF coarse quantizer
  *   model/codebooks   parquet (j, c, vec)        — PQ sub-codebooks
  *   codes/layer=<n>/  parquet (id, code) PARTITIONED BY cell — one layer
  *                     per build/append (`layer` itself is a partition
  *                     column, so a multi-layer chain reads as ONE
  *                     partitioned dataset); search prunes partitions by
  *                     the probed cells before any row is read
  *   meta              text: the committed layer list, written LAST via
  *                     tmp+rename — the atomic commit marker ([[load]]
  *                     returns None until it exists)
  *
  * Appends encode new vectors with the FROZEN model (no retrain — the
  * standard IVF-PQ maintenance contract; periodic full rebuilds handle
  * drift) and commit a new codes layer. Wiring appends off
  * [[graft.sources.NdjsonIngest.readChanges]] gives O(batch) index
  * maintenance for an append-only embedding table.
  */
object AnnIndex {

  final case class Handle(
      indexDir: String,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      layers: Seq[String])

  /** GENERATION indirection for zero-downtime retrains: when
    * `<root>/current` exists it names the live generation subdirectory
    * (`gen-<n>`), and every public entry point resolves through it —
    * [[rebuildSwap]] builds the next generation beside the live one and
    * flips the pointer atomically, so a reader either sees the old
    * generation (intact on disk) or the new one, never a torn index.
    * Indexes without the pointer keep the flat layout (resolve is the
    * identity, and a resolved generation dir never contains a pointer,
    * so resolution is idempotent).
    */
  private def resolveDir(root: String): String = {
    val p = java.nio.file.Paths.get(root, "current")
    if (!java.nio.file.Files.exists(p)) root
    else s"$root/${java.nio.file.Files.readString(p).trim}"
  }

  private def currentGen(root: String): Long = {
    val p = java.nio.file.Paths.get(root, "current")
    if (!java.nio.file.Files.exists(p)) 0L
    else scala.util.Try(java.nio.file.Files.readString(p).trim
      .stripPrefix("gen-").toLong).getOrElse(0L)
  }

  private def metaPath(indexDir: String) =
    java.nio.file.Paths.get(indexDir, "meta")

  /** Committed layer ENTRIES (`layerName` or `layerName\tfeed:a-b` — the
    * same tagged-entry convention as the band chains: a tag records the
    * change-feed range a layer covers, for replay recognition).
    */
  private def entries(indexDir: String): Seq[String] =
    if (!java.nio.file.Files.exists(metaPath(indexDir))) Seq.empty
    else java.nio.file.Files.readString(metaPath(indexDir))
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Every feed tag committed on any codes layer. */
  def tags(root: String): Set[String] =
    entries(resolveDir(root)).flatMap(graft.operators.BandChain.tagsOf).toSet

  /** The committed index, or None when nothing was ever committed. The
    * returned Handle pins the RESOLVED generation dir: handle-driven
    * reads keep working off the old generation's files across a
    * concurrent [[rebuildSwap]].
    */
  def load(spark: SparkSession, root: String): Option[Handle] = {
    val indexDir = resolveDir(root)
    if (!java.nio.file.Files.exists(metaPath(indexDir))) return None
    val layers = entries(indexDir).map(graft.operators.BandChain.nameOf)
    val cents = spark.read.parquet(s"$indexDir/model/centroids")
      .orderBy("cell").select("vec")
      .collect().map(_.getSeq[Double](0).toArray)
    val books = spark.read.parquet(s"$indexDir/model/codebooks")
      .orderBy("j", "c").select("j", "vec").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Double](1).toArray)).toArray
    Some(Handle(indexDir, cents, books, layers))
  }

  private def writeCodesLayer(h: Handle, emb: DataFrame, idCol: String,
      vecCol: String, layer: String): Unit = {
    Pq.index(emb.select(col(idCol).as("id"), col(vecCol)), vecCol,
        h.cents, h.books)
      .select(col("id"), col("code"), col("cell"))
      .write.mode(SaveMode.ErrorIfExists).partitionBy("cell")
      .parquet(s"${h.indexDir}/codes/layer=$layer")
    writeCellStats(h.indexDir, layer)
  }

  /** Per-layer (cell, cnt) sidecar, derived from the just-written layer
    * (O(batch) read-back, written BEFORE the meta commit so a committed
    * layer always has its stats). The chain's per-cell POPULATION — the
    * watermark [[requireBalanced]] enforces — is the cells-bounded sum
    * of these, so checking balance never scans the codes themselves.
    */
  private def writeCellStats(indexDir: String, layer: String): Unit = {
    val spark = SparkSession.active
    spark.read.parquet(s"$indexDir/codes/layer=$layer")
      .groupBy("cell").count()
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/cellstats/layer=$layer")
  }

  /** The chain's max per-cell code population, or None when any committed
    * layer predates the cellstats sidecars (legacy index — balance then
    * unverifiable, checks skip).
    */
  def maxCellPopulation(spark: SparkSession, indexDir: String,
      layers: Seq[String]): Option[Long] = {
    if (layers.isEmpty) return Some(0L)
    if (!layers.forall(l => new java.io.File(
        s"$indexDir/cellstats/layer=$l").isDirectory)) return None
    val stats = spark.read.option("basePath", s"$indexDir/cellstats")
      .parquet(layers.map(l => s"$indexDir/cellstats/layer=$l"): _*)
      .groupBy("cell").agg(sum("count").as("n"))
      .agg(max("n")).collect()(0)
    if (stats.isNullAt(0)) Some(0L) else Some(stats.getLong(0))
  }

  private def baselinePath(indexDir: String) =
    java.nio.file.Paths.get(indexDir, "cellbase")

  /** Build-time max cell population (the balance baseline), when the
    * index recorded one.
    */
  def cellBaseline(indexDir: String): Option[Long] =
    if (!java.nio.file.Files.exists(baselinePath(indexDir))) None
    else scala.util.Try(java.nio.file.Files
      .readString(baselinePath(indexDir)).trim.toLong).toOption

  /** Enforce the cell-size watermark: the quantizer is FROZEN at build
    * time while `syncFromFeed` appends into its cells forever, so a
    * corpus grown far past the build-time size degrades the within-cell
    * joins ([[graft.ann.Similarity.semdedupFromIndex]]) and the probe
    * cost ([[search]]) toward quadratic. Throws once the current max
    * cell population exceeds `factor` × the build-time baseline (floored
    * at 64 rows so small indexes never trip on noise); the escape hatch
    * is [[rebuild]] (retrain with a cell count sized to TODAY's corpus).
    * Legacy indexes without the baseline/stats sidecars skip the check.
    */
  // balance is a pure function of the COMMITTED chain (layers are
  // immutable once written): cache per (dir, chain) so per-query checks
  // (search runs one per call) don't re-scan the stats sidecars
  private val balanceCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Option[String]]()

  def requireBalanced(spark: SparkSession, indexDir: String,
      layers: Seq[String], factor: Double = 4.0): Unit =
    imbalanceReason(spark, indexDir, layers, factor)
      .foreach(msg => throw new IllegalStateException(msg))

  /** The watermark verdict without the throw — Some(reason) when the
    * corpus outgrew the frozen quantizer. [[syncFromFeed]]'s
    * rebuildOnImbalance mode consults this to turn the loud failure into
    * a zero-downtime [[rebuildSwap]].
    */
  def imbalanceReason(spark: SparkSession, indexDir: String,
      layers: Seq[String], factor: Double = 4.0): Option[String] = {
    if (balanceCache.size > 1024) balanceCache.clear() // stale-chain keys
    balanceCache.computeIfAbsent(
      (indexDir, s"$factor|${layers.mkString(",")}"), _ => {
        for {
          base <- cellBaseline(indexDir)
          pop <- maxCellPopulation(spark, indexDir, layers)
          bound = (factor * math.max(base, 64L)).toLong
          if pop > bound
        } yield s"index at $indexDir is out of balance: max cell " +
          s"population $pop exceeds $bound (${factor}x the build-time " +
          s"baseline $base) — the corpus outgrew the frozen quantizer; " +
          "run AnnIndex.rebuild with a cell count sized to the current corpus"
      })
  }

  /** Retrain IN PLACE with a fresh quantizer sized to TODAY's corpus —
    * the watermark escape hatch. Drops the committed meta first (readers
    * racing the rebuild see "no index", never a torn one), clears the
    * model/codes/stats dirs, then runs the normal build. Call when
    * in-flight readers of the old chain have drained (same contract as
    * [[gcCodes]]); for zero-downtime swaps build into a fresh indexDir
    * instead.
    */
  def rebuild(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, root: String, dim: Int, cells: Int, m: Int,
      k: Int, iters: Int = 2, tag: Option[String] = None): Handle = {
    val indexDir = resolveDir(root)
    java.nio.file.Files.deleteIfExists(metaPath(indexDir))
    Seq("model", "codes", "cellstats", "cellbase").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(indexDir, d)))
    // a rebuilt generation may reuse layer names: drop this dir's cached
    // balance verdicts (they described the old generation's sidecars)
    balanceCache.keySet.removeIf(_._1 == indexDir)
    val h = buildOrLoad(spark, emb, idCol, vecCol, indexDir, dim, cells,
      m, k, iters, tag)
    // invalidate AGAIN after the build commits: a concurrent balance
    // check racing the window between the deletion above and the new
    // meta commit could have cached a vacuous verdict under a chain key
    // the rebuilt generation reuses ("1"), silently disabling the
    // watermark for the new index
    balanceCache.keySet.removeIf(_._1 == indexDir)
    h
  }

  /** ZERO-DOWNTIME retrain: build the NEXT GENERATION (`gen-<n+1>`)
    * beside the live one with a fresh quantizer, then flip the
    * `<root>/current` pointer atomically. Readers holding a loaded
    * Handle keep working off the old generation's files (nothing of it
    * is deleted); new loads resolve to the new generation. Superseded
    * generations — including the pre-swap flat layout — reclaim via
    * [[gcGenerations]] once they leave the drain window (the serve
    * maintenance loop runs it after each sync).
    */
  def rebuildSwap(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, root: String, dim: Int, cells: Int, m: Int,
      k: Int, iters: Int = 2, tag: Option[String] = None): Handle =
    // swaps are serialized per index root (an advisory DirLock, same
    // mechanism as the table commit lock): the crash-debris deletion
    // below reasons "gen-<n+1> exists but the pointer still names
    // gen-<n>, so it is an abandoned partial build" — only sound when
    // no OTHER writer (a second serve process, a manual rebuild racing
    // the maintenance tick) can be mid-build in that dir. Under the
    // lock a concurrent rebuild simply queues and then retrains the
    // generation AFTER the first one's swap; a crashed holder's OS
    // lock releases with its process, so the debris rule still fires.
    graft.core.DirLock.withLock(root, ".swap.lock") {
    val next = s"gen-${currentGen(root) + 1}"
    // a CRASHED earlier swap may have left gen-<n+1> fully committed
    // (meta written) with the pointer never flipped — buildOrLoad would
    // then LOAD that stale generation (trained on the older corpus) and
    // flip the pointer to it instead of retraining. The pointer still
    // names gen-<n>, so gen-<n+1> is unreferenced by construction:
    // delete it and train fresh (and drop its cached balance verdicts —
    // they described the dead partial generation).
    if (new java.io.File(root, next).exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(root, next))
      balanceCache.keySet.removeIf(_._1 == s"$root/$next")
    }
    val h = buildOrLoad(spark, emb, idCol, vecCol, s"$root/$next",
      dim, cells, m, k, iters, tag)
    val tmp = java.nio.file.Paths.get(root, ".current.tmp")
    java.nio.file.Files.writeString(tmp, next)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(root, "current"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    h
    }

  private def commitMeta(indexDir: String, layers: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(indexDir, ".meta.tmp")
    java.nio.file.Files.writeString(tmp, layers.mkString("\n"))
    java.nio.file.Files.move(tmp, metaPath(indexDir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Load the committed index, or train + encode + commit it. Training
    * cost is paid ONCE per indexDir; every later call is a metadata read
    * plus two small model scans.
    */
  /** `tag`, when given (the feed range the bootstrap covers, `feed:0-N`),
    * is recorded on layer 1: a crash between this commit and the
    * consumer's cursor write would otherwise replay the WHOLE feed as an
    * insert tick and re-encode every bootstrapped vector as duplicates.
    */
  def buildOrLoad(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, indexDir: String, dim: Int, cells: Int, m: Int,
      k: Int, iters: Int = 2, tag: Option[String] = None): Handle =
    // double-checked under the per-dir commit lock: loads stay
    // lock-free (readers never serialize), two concurrent builders
    // train once — the second re-loads what the first committed
    load(spark, indexDir).getOrElse(
      graft.core.DirLock.withLock(indexDir, ".commit.lock") {
    load(spark, indexDir).getOrElse {
      import spark.implicits._
      val cents = Ivf.train(emb, vecCol, dim, cells, iters)
      val books = Pq.train(emb, vecCol, dim, m, k, iters)
      new java.io.File(s"$indexDir/model").mkdirs()
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "vec").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/model/centroids")
      books.zipWithIndex.flatMap { case (bk, j) =>
        bk.zipWithIndex.map { case (c, i) => (j, i, c.toSeq) }
      }.toSeq.toDF("j", "c", "vec").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/model/codebooks")
      val h = Handle(indexDir, cents, books, Seq("1"))
      writeCodesLayer(h, emb, idCol, vecCol, "1")
      // the balance baseline: the build-time max cell population, the
      // yardstick requireBalanced measures later growth against (written
      // before the meta commit, like the stats themselves)
      maxCellPopulation(spark, indexDir, Seq("1")).foreach(p =>
        java.nio.file.Files.writeString(baselinePath(indexDir), p.toString))
      commitMeta(indexDir,
        Seq(graft.operators.BandChain.entryOf("1", tag.toSeq)))
      h
    }
      })

  /** Encode `newEmb` with the frozen model and commit it as a new codes
    * layer — O(batch) work, the model files are never touched. `tag`,
    * when given (the change-feed commit range), is recorded on the layer
    * entry; an append whose tag is ALREADY committed is skipped (same
    * replay contract as the band chains).
    */
  def append(spark: SparkSession, newEmb: DataFrame, idCol: String,
      vecCol: String, root: String,
      tag: Option[String] = None): Handle = {
    val indexDir = resolveDir(root)
    graft.core.DirLock.withLock(indexDir, ".commit.lock") {
    val h = load(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no committed index at $indexDir"))
    if (tag.exists(tags(indexDir))) return h
    // a zero-row batch (e.g. an empty-but-valid delta commit) must not
    // commit a layer: partitionBy of an empty frame writes no parquet
    // footers, and a committed footer-less layer fails every later read
    if (newEmb.isEmpty) return h
    // orphan-aware numbering (BandChain discipline): a crash between a
    // layer write and the meta commit must not wedge every later
    // ErrorIfExists write on the orphan dir
    val next = graft.operators.BandChain
      .nextLayerIn(s"$indexDir/codes", h.layers)
    writeCodesLayer(h, newEmb, idCol, vecCol, next)
    commitMeta(indexDir, entries(indexDir) :+
      graft.operators.BandChain.entryOf(next, tag.toSeq))
    h.copy(layers = h.layers :+ next)
    }
  }

  /** Fold a codes chain longer than `maxLayers` into ONE layer — codes are
    * append-only (no per-key resolution needed), so compaction is a plain
    * rewrite that bounds the small-files count and the per-cell file
    * fan-in, same policy as the table/posting-index chains. The model is
    * untouched.
    */
  /** `live` (a one-column frame of live ids), when given, PURGES deleted
    * vectors' codes during the fold and forces the fold even under the
    * layer bound — the physical half of the delete lifecycle
    * (search-time `live = …` filtering is the logical half).
    */
  def compactCodes(spark: SparkSession, root: String,
      maxLayers: Int = 8,
      live: Option[org.apache.spark.sql.DataFrame] = None): Boolean = {
    val indexDir = resolveDir(root)
    graft.core.DirLock.withLock(indexDir, ".commit.lock") {
    val h = load(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no committed index at $indexDir"))
    if (h.layers.isEmpty ||
        (h.layers.length <= maxLayers && live.isEmpty)) return false
    val next = graft.operators.BandChain
      .nextLayerIn(s"$indexDir/codes", h.layers)
    val folded = live.foldLeft(
      spark.read.option("basePath", s"$indexDir/codes")
        .parquet(h.layers.map(l => s"$indexDir/codes/layer=$l"): _*)
        .select("id", "code", "cell")) { (c, lv) =>
      c.join(lv.toDF("__live_id"), col("id") === col("__live_id"), "left_semi")
    }
    folded.write.mode(SaveMode.ErrorIfExists).partitionBy("cell")
      .parquet(s"$indexDir/codes/layer=$next")
    // a purge that drops EVERY row leaves a footer-less dir (partitionBy
    // writes no files for zero rows) — committing it would wedge every
    // later read, so commit an EMPTY chain instead (the model survives;
    // the next append starts a fresh layer 1+)
    val wroteRows = Option(
      new java.io.File(s"$indexDir/codes/layer=$next").listFiles())
      .getOrElse(Array.empty).exists(_.getName.startsWith("cell="))
    if (!wroteRows) {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$indexDir/codes/layer=$next"))
      commitMeta(indexDir, Seq.empty)
    } else {
      writeCellStats(indexDir, next)
      // the folded layer keeps only the newest feed tag (coverage is
      // monotone) — replay stays recognisable, meta stays bounded
      commitMeta(indexDir, Seq(graft.operators.BandChain.entryOf(next,
        graft.operators.BandChain.pruneFeedTags(
          entries(indexDir).flatMap(graft.operators.BandChain.tagsOf).distinct))))
    }
    true
    }
  }

  /** Delete on-disk code layers not in the committed meta — the PHYSICAL
    * completion of earlier `compactCodes` calls (a purge-compact's fold
    * drops deleted vectors' codes from the live chain; this reclaims
    * their superseded dirs) plus crash-orphan cleanup. Same drain
    * contract as `NdjsonIngest.gcVersions`: call once in-flight readers
    * of the superseded chain have drained. Returns deleted dir names.
    */
  /** Delete SUPERSEDED GENERATIONS left by [[rebuildSwap]]: every
    * `gen-<k>` with `k ≤ current − keepLatest + 1 − 1` goes, as does
    * the pre-generation FLAT layout (meta/model/codes/… at the root —
    * logically generation 0) once enough newer generations exist. The
    * current generation and its `keepLatest − 1` predecessors stay: a
    * reader that loaded a Handle just before a swap keeps serving the
    * previous generation for its lifetime, so `keepLatest = 2` is the
    * standard one-swap drain window (same contract as
    * `NdjsonIngest.gcVersions` retention). A root with no `current`
    * pointer is untouched. Returns what was deleted.
    */
  def gcGenerations(root: String, keepLatest: Int = 2): Seq[String] = {
    require(keepLatest >= 1, "gcGenerations must keep the live generation")
    // the swap lock serializes generation reclaim against rebuildSwap:
    // a builder's in-progress gen-<n+1> is newer than any reclaim floor,
    // but the pointer read + delete walk must not interleave with a flip
    graft.core.DirLock.withLock(root, ".swap.lock") {
    val cur = currentGen(root)
    if (cur == 0L) return Nil // flat layout or no index: nothing swapped
    val floor = cur - keepLatest + 1 // lowest generation kept
    val genDirs = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix("gen-").toLong).toOption.map(f -> _))
      .filter { case (_, k) => k < floor }
    val deadGens = genDirs.map { case (f, _) =>
      org.apache.commons.io.FileUtils.deleteQuietly(f)
      balanceCache.keySet.removeIf(_._1 == f.getPath)
      f.getName
    }.toSeq
    // the flat layout is generation 0: reclaim its artifacts once the
    // drain window has moved past it
    val flatDead =
      if (0L >= floor) Nil
      else Seq("meta", "model", "codes", "cellstats", "cellbase")
        .filter { d =>
          val f = new java.io.File(root, d)
          val existed = f.exists()
          if (existed) org.apache.commons.io.FileUtils.deleteQuietly(f)
          existed
        }
    if (flatDead.nonEmpty) balanceCache.keySet.removeIf(_._1 == root)
    deadGens ++ flatDead
    }
  }

  def gcCodes(root: String): Seq[String] = {
    val indexDir = resolveDir(root)
    if (!java.nio.file.Files.exists(metaPath(indexDir)))
      throw new IllegalStateException(s"no committed index at $indexDir")
    // under the per-dir commit lock: an appender's freshly-written
    // layer dir is not in meta until its commit — an unlocked gc racing
    // it would reclaim the layer mid-write
    graft.core.DirLock.withLock(indexDir, ".commit.lock") {
    // meta-only read: the committed layer names are all gc needs — loading
    // the model (two Spark jobs) here would tax every consumer tick
    val live = entries(indexDir).map(graft.operators.BandChain.nameOf)
    // the stats sidecars of dropped layers go with them
    if (new java.io.File(s"$indexDir/cellstats").isDirectory)
      graft.operators.BandChain.gcLayerDirs(s"$indexDir/cellstats", live)
    graft.operators.BandChain.gcLayerDirs(s"$indexDir/codes", live)
    }
  }

  /** ONE-CALL change-feed maintenance for a persisted IVF-PQ index over
    * a versioned embedding table — the vector twin of
    * [[graft.core.CorpusIndexes.sync]], completing the replay-safe
    * persisted-index trio. Bootstrap trains the model and encodes the
    * live vectors (`dim`/`cells`/`m`/`k`/`iters` are used only then);
    * each later POLL first runs the DEFERRED physical gc of earlier
    * folds (even when the feed has nothing new — the drain window is one
    * poll interval), then a tick with new commits is either
    *  - insert tick: an O(batch) tagged append starting from the chain's
    *    covered watermark — a crash-replayed tick, even one WIDENED by
    *    commits landing before the retry, re-encodes only the commits
    *    the chain has not seen;
    *  - delete/upsert tick: purge-compact against (live MINUS touched),
    *    then re-encode whatever the chain lacks (an upserted vector's
    *    stale code is purged via `touched` even though its id is live).
    */
  def syncFromFeed(spark: SparkSession, tableDir: String, indexDir: String,
      stateDir: String, idCol: String, vecCol: String,
      dim: Int, cells: Int, m: Int, k: Int,
      iters: Int = 2,
      // when set, a post-tick watermark trip triggers [[rebuildSwap]]
      // (next generation sized to today's corpus, atomic pointer flip)
      // instead of leaving the index to fail search loudly — turning
      // the watermark into zero-downtime maintenance
      rebuildOnImbalance: Boolean = false,
      balanceFactor: Double = 4.0): Option[(Long, Long)] = {
    import graft.sources.{ChangeFeedConsumer, NdjsonIngest}
    // PINNED reads: the tick's live set is resolved as of the tick's head
    // commit, never "latest" — a commit landing mid-tick would otherwise be
    // encoded by this tick's miss-append AND re-encoded when its own tick
    // replays it (the cursor only advances to the head the feed read saw),
    // leaving duplicate code rows that rank twice in search
    def liveEmb(at: Long) =
      NdjsonIngest.readCommitMerged(spark, tableDir, idCol, at)
    if (load(spark, indexDir).isEmpty) {
      val head = NdjsonIngest.commits(tableDir).lastOption.getOrElse(0L)
      require(head > 0, s"no commits at $tableDir")
      buildOrLoad(spark, liveEmb(head), idCol, vecCol, indexDir,
        dim, cells, m, k, iters, tag = Some(s"feed:0-$head"))
      ChangeFeedConsumer.writeCursor(stateDir, head)
      return Some((0L, head))
    }
    // physical gc of layers superseded by EARLIER compactions — on every
    // poll, not only ticks with new data, so a feed that goes idle after a
    // delete still reclaims the tombstoned vectors' codes one poll later
    gcCodes(indexDir)
    val res = ChangeFeedConsumer.processWithRange(spark, tableDir, idCol,
      stateDir) { (feed, range) =>
      // the chain may already cover the whole range (bootstrap-crash
      // replay: index + feed:0-N tag committed, cursor write lost) — skip
      // the work; processWithRange still advances the cursor. (A `return`
      // would non-local-return out of syncFromFeed and skip that advance.)
      val alreadyCovered = graft.operators.BandChain
        .coveredTo(tags(indexDir), 0L) >= range._2
      lazy val f = feed.localCheckpoint()
      if (alreadyCovered) { /* no-op tick */ }
      else if (f.filter(col("_change_type") =!= "insert").limit(1)
          .count() > 0) {
        val live = liveEmb(range._2).localCheckpoint()
        val keep = live.select(idCol).join(
          f.select(idCol).distinct().toDF("__t"),
          col(idCol) === col("__t"), "left_anti")
        compactCodes(spark, indexDir, live = Some(keep))
        val h = load(spark, indexDir).get
        val miss =
          if (h.layers.isEmpty) live // purge emptied the chain: re-encode all
          else {
            // h.indexDir, not the root: the handle pins the resolved
            // generation the codes actually live in
            val have = spark.read.option("basePath", s"${h.indexDir}/codes")
              .parquet(h.layers.map(l => s"${h.indexDir}/codes/layer=$l"): _*)
              .select(col("id")).distinct()
            live.join(have.toDF("__have"),
              col(idCol) === col("__have"), "left_anti")
          }
        if (!miss.isEmpty) append(spark, miss, idCol, vecCol, indexDir)
      } else {
        val covered = graft.operators.BandChain
          .coveredTo(tags(indexDir), range._1)
        if (covered < range._2)
          append(spark,
            f.filter(col("_change_type") === "insert")
              .filter(col("_commit") > covered).select(col(idCol), col(vecCol)),
            idCol, vecCol, indexDir,
            tag = Some(s"feed:$covered-${range._2}"))
      }
    }
    // auto-retrain: once the tick is in, a tripped watermark builds the
    // NEXT GENERATION with a cell count sized to TODAY's corpus (target
    // rows/cell = the old build-time baseline) and swaps the pointer —
    // searches against already-loaded handles keep working off the old
    // generation; the new tag re-covers the whole feed so a replayed
    // tick never re-encodes
    if (rebuildOnImbalance) load(spark, indexDir).foreach { h =>
      if (imbalanceReason(spark, h.indexDir, h.layers,
          balanceFactor).isDefined) {
        val head = NdjsonIngest.commits(tableDir).lastOption.getOrElse(0L)
        val live = liveEmb(head).localCheckpoint()
        val target = math.max(64L, cellBaseline(h.indexDir).getOrElse(64L))
        val cellsNow = math.max(cells,
          math.ceil(live.count().toDouble / target).toInt)
        rebuildSwap(spark, live, idCol, vecCol, indexDir, dim, cellsNow,
          m, k, iters, tag = Some(s"feed:0-$head"))
      }
    }
    res
  }

  /** IVF-PQ search against the PERSISTED codes: partition-pruned scan of
    * the probed cells only, ADC via per-query LUT lookups, exact-cosine
    * re-rank of the top `refine` after an equi-join back to the vector
    * table (the index never stores floats). Same semantics as [[Pq.topk]];
    * the difference is what gets read.
    */
  /** `live`, when given (one `idCol` row per still-live vector),
    * semi-joins the code scan BEFORE the ADC top-`refine` cut: the exact
    * re-rank join against `emb` already drops deleted vectors, but
    * without the filter their persisted codes still consume refine slots
    * (with a small `refine`, a deleted near neighbor can push every live
    * one out). Codes layers are append-only and outlive deletes — same
    * contract as the near-dup band indexes.
    */
  def search(spark: SparkSession, h: Handle, emb: DataFrame, idCol: String,
      vecCol: String, probes: Seq[(Long, Array[Double])],
      k: Int = 5, nprobe: Int = 4, refine: Int = 20,
      live: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    // an all-row purge commits an EMPTY chain (model retained) — no codes,
    // no neighbors; n_id keeps the embedding table's id type
    if (h.layers.isEmpty) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("q_id", LongType),
          StructField("rk", IntegerType),
          StructField("n_id", emb.schema(idCol).dataType),
          StructField("cos", DoubleType))))
    }
    // probe cost is O(max cell population): refuse to serve an index the
    // corpus has outgrown (the frozen quantizer can't split cells —
    // rebuild does)
    requireBalanced(spark, h.indexDir, h.layers)
    val m = h.books.length
    val pdf = probes.flatMap { case (qid, qv) =>
      val l = Pq.lut(qv, h.books)
      Ivf.probeCells(qv, h.cents, nprobe).map(cell => (qid, qv.toSeq, l, cell))
    }.toDF("q_id", "qv", "lut", "cell")
    val probedCells = probes
      .flatMap { case (_, qv) => Ivf.probeCells(qv, h.cents, nprobe) }
      .distinct.map(Integer.valueOf)
    val codesAll = spark.read
      // basePath anchors partition discovery when the chain has >1 layer
      // root (each layer is its own partitioned dataset under codes/)
      .option("basePath", s"${h.indexDir}/codes")
      .parquet(h.layers.map(l => s"${h.indexDir}/codes/layer=$l"): _*)
      // static partition pruning: unprobed cells' files are never listed
      // into the scan
      .filter(col("cell").isin(probedCells: _*))
    val codes = live.foldLeft(codesAll) { (c, lv) =>
      c.join(lv.select(col(idCol).as("__live_id")),
        col("id") === col("__live_id"), "left_semi")
    }
    val adc = (0 until m).map(j =>
      element_at(element_at(col("lut"), j + 1),
        element_at(col("code"), j + 1) + 1)).reduce(_ + _)
    val wAdc = Window.partitionBy("q_id").orderBy(col("adc").desc, col("id"))
    val wCos = Window.partitionBy("q_id").orderBy(col("cos").desc, col("id"))
    codes.join(broadcast(pdf), Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .withColumn("adc", adc)
      .withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= refine)
      .join(emb.select(col(idCol).as("id"), col(vecCol).as("nv"),
        VF.norm2(col(vecCol)).as("nn")), Seq("id"))
      .withColumn("cos",
        round(VF.dot(col("qv"), col("nv")) / (VF.norm2(col("qv")) * col("nn")), 6))
      .withColumn("rk", row_number().over(wCos).cast("int"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("id").as("n_id"), col("cos"))
  }
}
