package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ann.AnnIndex
import graft.functions.{VectorFunctions => VF}

/** Persisted IVF-PQ index: build-once/load-later, frozen-model appends,
  * partition-pruned search with recall vs exhaustive cosine.
  */
class AnnIndexSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8

  /** 4 direction clusters × 25 (same shape as IvfSpec/PqSpec). */
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val base = Seq(
      Array.tabulate(dim)(i => if (i < 2) 1.0 else 0.0),
      Array.tabulate(dim)(i => if (i >= 2 && i < 4) 1.0 else 0.0),
      Array.tabulate(dim)(i => if (i >= 4 && i < 6) 1.0 else 0.0),
      Array.tabulate(dim)(i => if (i >= 6) 1.0 else 0.0))
    for (c <- 0 until 4; j <- 0 until 25) yield {
      val rnd = new scala.util.Random(c * 100L + j)
      ((c * 25 + j).toLong, base(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
  }

  private lazy val emb = vecs.toDF("vec_id", "embedding").localCheckpoint()

  test("semdedupFromIndex reuses the persisted cells: equal to fresh " +
    "assignment, skips deleted ids, tracks upserts to the newest layer") {
    import graft.ann.{Ivf, Similarity}
    val dir = Files.createTempDirectory("sdidx").toString + "/idx"
    val h = AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim = dim, cells = 4, m = 4, k = 4, iters = 2)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cell", "kept", "dup_of").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1).toSeq
    val fromIdx = Similarity.semdedupFromIndex(h, emb, "vec_id", "embedding", 0.9)
    val fresh = Similarity.semdedupInCells(
      Ivf.assign(emb, "embedding", h.cents), "vec_id", "embedding", 0.9)
    assert(key(fromIdx) === key(fresh))
    assert(fromIdx.count() === 100)
    // deleted vectors: codes outlive the rows, but the join on the live
    // corpus drops them from BOTH sides (no kept verdict, no dup_of ref)
    val live = emb.filter(col("vec_id") < 50)
    val afterDel = Similarity.semdedupFromIndex(h, live, "vec_id", "embedding", 0.9)
    assert(afterDel.count() === 50)
    assert(afterDel.filter(col("dup_of") >= 50).count() === 0)
    // an upserted id re-encodes in a later layer: its NEWEST cell wins
    val moved = Seq((0L, Array.tabulate(dim)(i =>
      if (i >= 6) 1.0f else 0.0f))).toDF("vec_id", "embedding")
    AnnIndex.append(spark, moved, "vec_id", "embedding", dir)
    val h2 = AnnIndex.load(spark, dir).get
    val emb2 = emb.filter(col("vec_id") =!= 0L).union(moved)
    val after = Similarity.semdedupFromIndex(h2, emb2, "vec_id", "embedding", 0.9)
    val cell0 = after.filter(col("vec_id") === 0L).select("cell").head().getInt(0)
    val cluster4 = Ivf.assign(moved, "embedding", h2.cents)
      .select("cell").head().getInt(0)
    assert(cell0 === cluster4, "upserted id must carry its newest cell")
    // the index LAGGING the corpus (a row with no committed code) is an
    // operational ordering error: loud throw, never a silent drop
    val lagging = emb2.union(
      Seq((999L, Array.fill(dim)(0.5f))).toDF("vec_id", "embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.semdedupFromIndex(h2, lagging, "vec_id", "embedding", 0.9)
        .count()
    }
    assert(e.getMessage.contains("index lags the corpus"))
  }

  private def exhaustiveTop5(probeIds: Seq[Long]) = {
    val e = emb.select(col("vec_id"), col("embedding"),
      VF.norm2(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id").isin(probeIds.map(Long.box): _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("nq"))
    val nn = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
      col("nrm").as("nn"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(nn, col("q_id") =!= col("n_id"))
      .withColumn("cos",
        round(VF.dot(col("qv"), col("nv")) / (col("nq") * col("nn")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("q_id", "n_id")
  }

  test("build → load → search: trained once, loaded thereafter, good recall") {
    val dir = Files.createTempDirectory("annidx").toString + "/idx"
    val h1 = AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    assert(h1.layers === Seq("1"))
    // second call LOADS: model parquet mtimes untouched
    val modelFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "model"))
      .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
    val mtimes = modelFiles.map(f => f -> new java.io.File(f.toString).lastModified).toMap
    val h2 = AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    assert(modelFiles.forall(f => new java.io.File(f).lastModified == mtimes(f)),
      "model files rewritten on load")
    assert(h2.cents.map(_.toSeq).toSeq === h1.cents.map(_.toSeq).toSeq)
    assert(h2.books.map(_.map(_.toSeq).toSeq).toSeq ===
      h1.books.map(_.map(_.toSeq).toSeq).toSeq)
    // recall@5 ≥ 0.8 on well-separated clusters
    val probeIds = Seq(0L, 1L, 2L)
    val probes = vecs.filter(v => probeIds.contains(v._1))
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val got = AnnIndex.search(spark, h2, emb, "vec_id", "embedding", probes,
      k = 5, nprobe = 1, refine = 15)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val truth = exhaustiveTop5(probeIds).as[(Long, Long)].collect().toSet
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall, got=$got truth=$truth")
    // search output is ranked 1..5 per probe
    val ranks = AnnIndex.search(spark, h2, emb, "vec_id", "embedding", probes,
      k = 5, nprobe = 1, refine = 15)
      .groupBy("q_id").agg(collect_list("rk").as("rks"))
      .select("rks").as[Seq[Int]].collect()
    assert(ranks.forall(_.sorted == Seq(1, 2, 3, 4, 5)))
  }

  test("cell-size watermark: a corpus grown far past the frozen " +
    "quantizer trips search and dedup; rebuild resets the baseline") {
    import graft.ann.Similarity
    val dir = Files.createTempDirectory("wmidx").toString + "/idx"
    AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 2)
    // build-time baseline recorded: ~25 per cell here
    assert(AnnIndex.cellBaseline(dir).exists(_ > 0))
    // grow ONE cell 10x past the bound (300 copies of one direction —
    // identical vectors always land in the same frozen cell, so the
    // watermark must trip deterministically: bound = 4 × max(base, 64))
    val grown = (1000L until 1300L).map(i =>
      (i, Array.tabulate(dim)(j => if (j < 2) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    AnnIndex.append(spark, grown, "vec_id", "embedding", dir)
    val h = AnnIndex.load(spark, dir).get
    assert(AnnIndex.maxCellPopulation(spark, dir, h.layers).exists(_ >= 300))
    val all = emb.union(grown).localCheckpoint()
    val probes = Seq((0L, vecs.head._2.map(_.toDouble)))
    val eSearch = intercept[IllegalStateException] {
      AnnIndex.search(spark, h, all, "vec_id", "embedding", probes).count()
    }
    assert(eSearch.getMessage.contains("out of balance"))
    val eDedup = intercept[IllegalStateException] {
      Similarity.semdedupFromIndex(h, all, "vec_id", "embedding", 0.9).count()
    }
    assert(eDedup.getMessage.contains("out of balance"))
    // the escape hatch: retrain against TODAY's corpus — the rebuilt
    // baseline absorbs the growth and both paths serve again
    val h2 = AnnIndex.rebuild(spark, all, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 2)
    assert(AnnIndex.search(spark, h2, all, "vec_id", "embedding", probes)
      .count() > 0)
    assert(Similarity.semdedupFromIndex(h2, all, "vec_id", "embedding", 0.9)
      .count() === all.count())
  }

  test("append encodes with the frozen model and search sees the new layer") {
    val dir = Files.createTempDirectory("annidx").toString + "/idx"
    AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    val mtimes = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "model"))
      .filter(_.toString.endsWith(".parquet")).toArray.map(_.toString)
      .map(f => f -> new java.io.File(f).lastModified).toMap
    // a new vector IDENTICAL to probe 0 (cos = 1.0 → must re-rank first;
    // a merely-nearby direction can legitimately lose the top-5 to lucky
    // noise draws), id 999
    val nv = vecs.head._2.clone()
    val h = AnnIndex.append(spark,
      Seq((999L, nv)).toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    assert(h.layers === Seq("1", "2"))
    assert(mtimes.forall { case (f, t) => new java.io.File(f).lastModified == t },
      "append retrained the model")
    // the appended layer holds ONE row; search from a cluster-0 probe now
    // returns 999 among the top-5 (it is nearly identical to the probe)
    val appended = spark.read.parquet(s"$dir/codes/layer=2")
    assert(appended.count() === 1)
    val all = emb.unionByName(Seq((999L, nv)).toDF("vec_id", "embedding"))
    // refine must clear the whole cell: PQ codes collide inside a tight
    // cluster and the ADC tie-break (id asc) would otherwise cut 999
    // before the exact re-rank sees it
    val got = AnnIndex.search(spark, h, all, "vec_id", "embedding",
      Seq((0L, vecs.head._2.map(_.toDouble))), k = 5, nprobe = 1, refine = 30)
      .select("n_id").as[Long].collect().toSet
    assert(got.contains(999L), s"appended vector missing from $got")
  }

  test("live-set filter keeps deleted vectors out of the refine window") {
    val dir = Files.createTempDirectory("annidxdel").toString + "/idx"
    val h = AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    // ids 1..10 are deleted from the vector table; the code layers keep
    // their persisted codes (append-only)
    val deleted = (1L to 10L).map(Long.box)
    val liveEmb = emb.filter(!col("vec_id").isin(deleted: _*)).localCheckpoint()
    val probes = Seq((0L, vecs.head._2.map(_.toDouble)))
    val got = AnnIndex.search(spark, h, liveEmb, "vec_id", "embedding",
      probes, k = 5, nprobe = 1, refine = 30,
      live = Some(liveEmb.select("vec_id")))
    val ids = got.select("n_id").as[Long].collect().toSet
    assert(ids.intersect(deleted.map(_.toLong).toSet).isEmpty)
    assert(ids.size === 5) // deleted codes no longer consume refine slots
    // equals the exhaustive top-5 over the LIVE subset (cluster 0 keeps
    // 14 live neighbors, so the whole true top-5 sits in the probed cell)
    val e = liveEmb.select(col("vec_id"), col("embedding"),
      VF.norm2(col("embedding")).as("nrm"))
    val w = Window.orderBy(col("cos").desc, col("vec_id"))
    val truth = e.filter(col("vec_id") =!= 0L)
      .withColumn("cos", round(
        VF.dot(typedLit(vecs.head._2.map(_.toDouble).toSeq), col("embedding")) /
          (lit(math.sqrt(vecs.head._2.map(x => x.toDouble * x).sum)) * col("nrm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("vec_id").as[Long].collect().toSet
    assert(ids === truth, s"got $ids vs exhaustive $truth")
    // the code scan carries the semi-join (before the ADC cut)
    val plan = AnnIndex.search(spark, h, liveEmb, "vec_id", "embedding",
      probes, k = 5, nprobe = 1, refine = 30,
      live = Some(liveEmb.select("vec_id")))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.toLowerCase.contains("leftsemi"), plan.take(1500))
    // purge-on-compact physically drops the deleted codes: a live-blind
    // search now equals the filtered one
    assert(AnnIndex.compactCodes(spark, dir,
      live = Some(liveEmb.select("vec_id"))))
    val h2 = AnnIndex.load(spark, dir).get
    assert(h2.layers.length === 1)
    val blind = AnnIndex.search(spark, h2, liveEmb, "vec_id", "embedding",
      probes, k = 5, nprobe = 1, refine = 30)
      .select("n_id").as[Long].collect().toSet
    assert(blind === truth)
  }

  test("change feed keeps the persisted index fresh without retraining") {
    import graft.sources.{ChangeFeedConsumer, NdjsonIngest}
    val base = Files.createTempDirectory("annfeed").toString
    val tableDir = s"$base/emb"; val idxDir = s"$base/idx"
    val cursorDir = s"$base/cursor"
    // the embedding table is an ordinary versioned table
    NdjsonIngest.appendVersion(vecs.toDF("vec_id", "embedding"),
      tableDir, "vec_id")                                        // commit 1
    // preprocessing: index the current table, then mark the feed consumed
    // up to the indexed state
    AnnIndex.buildOrLoad(spark, NdjsonIngest.readLatest(spark, tableDir),
      "vec_id", "embedding", idxDir, dim, cells = 4, m = 2, k = 8, iters = 3)
    assert(ChangeFeedConsumer.process(spark, tableDir, "vec_id", cursorDir)(
      _ => ()).contains((0L, 1L)))
    // live appends land as O(batch) delta commits...
    val nv = vecs.head._2.clone()
    NdjsonIngest.appendDelta(
      Seq((999L, nv)).toDF("vec_id", "embedding"), tableDir, "vec_id") // commit 2
    // ...and ONE consumer tick encodes exactly the new rows into a new
    // index layer with the frozen model
    val r = ChangeFeedConsumer.process(spark, tableDir, "vec_id", cursorDir) { df =>
      AnnIndex.append(spark,
        df.filter(col("_change_type") === "insert")
          .select("vec_id", "embedding"),
        "vec_id", "embedding", idxDir)
      ()
    }
    assert(r.contains((1L, 2L)))
    val h = AnnIndex.load(spark, idxDir).get
    assert(h.layers === Seq("1", "2"))
    assert(spark.read.parquet(s"$idxDir/codes/layer=2").count() === 1)
    // search over the live table sees the appended vector immediately
    val got = AnnIndex.search(spark, h,
      NdjsonIngest.readLatest(spark, tableDir), "vec_id", "embedding",
      Seq((0L, vecs.head._2.map(_.toDouble))), k = 5, nprobe = 1, refine = 30)
      .select("n_id").as[Long].collect().toSet
    assert(got.contains(999L), s"fed vector missing from $got")
    // an idle tick is a no-op
    assert(ChangeFeedConsumer.process(spark, tableDir, "vec_id", cursorDir)(
      _ => fail("callback on empty feed")).isEmpty)
  }

  test("codes compaction folds the layer chain; search results unchanged") {
    import graft.sources.NdjsonIngest
    val dir = Files.createTempDirectory("annidx").toString + "/idx"
    AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    (0 until 3).foreach { i =>
      AnnIndex.append(spark,
        Seq((1000L + i, vecs(i)._2.clone())).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dir)
    }
    val all = emb.unionByName(
      (0 until 3).map(i => (1000L + i, vecs(i)._2.clone())).toDF("vec_id", "embedding"))
    val probes = Seq((0L, vecs.head._2.map(_.toDouble)))
    def results(h: AnnIndex.Handle) =
      AnnIndex.search(spark, h, all, "vec_id", "embedding", probes,
        k = 5, nprobe = 1, refine = 40)
        .select("rk", "n_id").as[(Int, Long)].collect().toSeq.sorted
    val before = results(AnnIndex.load(spark, dir).get)
    assert(!AnnIndex.compactCodes(spark, dir, maxLayers = 4)) // under bound
    assert(AnnIndex.compactCodes(spark, dir, maxLayers = 2))
    val h = AnnIndex.load(spark, dir).get
    assert(h.layers.length === 1)
    assert(results(h) === before)
    // the physical half is DEFERRED (drain contract, like gcVersions):
    // compact leaves the superseded dirs for in-flight readers; gcCodes
    // reclaims them — after it, disk holds exactly the committed chain
    def onDisk() = Option(new java.io.File(s"$dir/codes").listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("layer=")).toSet
    assert(onDisk().size > 1) // superseded layers still present post-flip
    assert(AnnIndex.gcCodes(dir).nonEmpty)
    assert(onDisk() === h.layers.map(l => s"layer=$l").toSet)
  }

  test("codes chain numbers past an orphan layer dir (crash recovery)") {
    val dir = Files.createTempDirectory("annorphan").toString + "/idx"
    AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    // simulate a crash between a layer write and its meta commit: an
    // on-disk codes/layer=2 that no meta references — ErrorIfExists would
    // wedge every later append/compact if numbering ignored it
    new java.io.File(s"$dir/codes/layer=2").mkdirs()
    val h = AnnIndex.append(spark,
      Seq((9000L, vecs.head._2.clone())).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    assert(h.layers === Seq("1", "3")) // past the orphan
    assert(AnnIndex.compactCodes(spark, dir, maxLayers = 1)) // folds fine
    assert(AnnIndex.load(spark, dir).get.layers === Seq("4"))
    // gc reclaims the orphan and the superseded layers
    assert(AnnIndex.gcCodes(dir).toSet === Set("layer=1", "layer=2", "layer=3"))
  }

  test("syncFromFeed: bootstrap, tagged inserts, widened replay, delete purge") {
    import graft.sources.NdjsonIngest
    val base = Files.createTempDirectory("annsync").toString
    val tableDir = s"$base/emb"; val idxDir = s"$base/idx"
    val cursorDir = s"$base/cursor"
    def sync() = AnnIndex.syncFromFeed(spark, tableDir, idxDir, cursorDir,
      "vec_id", "embedding", dim, cells = 4, m = 2, k = 8, iters = 3)
    // bootstrap from the table's current state
    NdjsonIngest.appendVersion(vecs.toDF("vec_id", "embedding"),
      tableDir, "vec_id") // c1
    assert(sync().contains((0L, 1L)))
    assert(sync().isEmpty) // fresh → no-op
    // bootstrap-crash replay: the cursor write is the LAST bootstrap step;
    // rewind it to 0 as if the crash hit just before it — layer 1's
    // feed:0-1 tag must mark the replayed (0,1] tick already covered
    // instead of re-encoding every bootstrapped vector
    graft.sources.ChangeFeedConsumer.writeCursor(cursorDir, 0L)
    assert(sync().contains((0L, 1L)))
    assert(AnnIndex.load(spark, idxDir).get.layers === Seq("1"))
    // insert tick: O(batch) tagged append with the frozen model
    NdjsonIngest.appendDelta(
      Seq((1000L, vecs.head._2.clone())).toDF("vec_id", "embedding"),
      tableDir, "vec_id") // c2
    assert(sync().contains((1L, 2L)))
    assert(AnnIndex.load(spark, idxDir).get.layers.length === 2)
    // crash before the cursor advance AND commit 3 lands before the
    // retry: the covered watermark (2) must confine the append to c3
    graft.sources.ChangeFeedConsumer.writeCursor(cursorDir, 1L)
    NdjsonIngest.appendDelta(
      Seq((1001L, vecs(1)._2.clone())).toDF("vec_id", "embedding"),
      tableDir, "vec_id") // c3
    assert(sync().contains((1L, 3L)))
    val h = AnnIndex.load(spark, idxDir).get
    val codes = spark.read.option("basePath", s"$idxDir/codes")
      .parquet(h.layers.map(l => s"$idxDir/codes/layer=$l"): _*)
    // exactly ONE code per vector — nothing doubled by the replay
    assert(codes.groupBy("id").count().select("count").distinct()
      .as[Long].collect().toSet === Set(1L))
    assert(codes.select("id").as[Long].collect().toSet
      === vecs.map(_._1).toSet ++ Set(1000L, 1001L))
    // delete tick: purge-compact drops the tombstoned codes physically
    NdjsonIngest.deleteDelta(Seq(1000L, 1001L).toDF("vec_id"),
      tableDir, "vec_id") // c4
    assert(sync().contains((3L, 4L)))
    val h2 = AnnIndex.load(spark, idxDir).get
    assert(h2.layers.length === 1)
    val codes2 = spark.read.option("basePath", s"$idxDir/codes")
      .parquet(h2.layers.map(l => s"$idxDir/codes/layer=$l"): _*)
    assert(codes2.select("id").as[Long].collect().toSet === vecs.map(_._1).toSet)
    // search against the synced index still matches exhaustive top-5
    val probeIds = Seq(0L, 30L)
    val probes = vecs.filter(v => probeIds.contains(v._1))
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val got = AnnIndex.search(spark, h2, emb, "vec_id", "embedding", probes,
      k = 5, nprobe = 2, refine = 30)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(got === exhaustiveTop5(probeIds)
      .as[(Long, Long)].collect().toSet)
    // delete EVERYTHING: a partitionBy write of zero rows leaves no
    // parquet footers, so the purge must commit an EMPTY chain (model
    // retained) rather than a footer-less layer that wedges every read
    NdjsonIngest.deleteDelta(vecs.map(_._1).toDF("vec_id"),
      tableDir, "vec_id") // c5
    assert(sync().contains((4L, 5L)))
    val h3 = AnnIndex.load(spark, idxDir).get
    assert(h3.layers.isEmpty)
    assert(AnnIndex.search(spark, h3, emb, "vec_id", "embedding", probes,
      k = 5, nprobe = 2, refine = 30).isEmpty)
    // an idle poll (feed has nothing new) still runs the deferred gc —
    // the wiped layers' dirs are reclaimed without waiting for new data
    assert(sync().isEmpty)
    def codeDirs() = Option(new java.io.File(s"$idxDir/codes").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("layer="))
    assert(codeDirs() === 0)
    // life after the wipe: the next insert tick starts a fresh layer
    NdjsonIngest.appendDelta(
      Seq((2000L, vecs.head._2.clone())).toDF("vec_id", "embedding"),
      tableDir, "vec_id") // c6
    assert(sync().contains((5L, 6L)))
    val h4 = AnnIndex.load(spark, idxDir).get
    assert(h4.layers.length === 1)
    val afterWipe = AnnIndex.search(spark, h4,
      Seq((2000L, vecs.head._2.clone())).toDF("vec_id", "embedding"),
      "vec_id", "embedding", Seq((0L, vecs.head._2.map(_.toDouble))),
      k = 1, nprobe = 2, refine = 10)
      .select("n_id").as[Long].collect().toSet
    assert(afterWipe === Set(2000L))
  }

  test("syncFromFeed(rebuildOnImbalance): a watermark trip swaps a fresh " +
    "generation atomically; search stays correct throughout") {
    import graft.sources.NdjsonIngest
    val base = Files.createTempDirectory("annswap").toString
    val tableDir = s"$base/emb"; val idxDir = s"$base/idx"
    val cursorDir = s"$base/cursor"
    def sync() = AnnIndex.syncFromFeed(spark, tableDir, idxDir, cursorDir,
      "vec_id", "embedding", dim, cells = 4, m = 2, k = 8, iters = 3,
      rebuildOnImbalance = true)
    NdjsonIngest.appendVersion(vecs.toDF("vec_id", "embedding"),
      tableDir, "vec_id") // c1
    assert(sync().contains((0L, 1L)))
    val h0 = AnnIndex.load(spark, idxDir).get
    // grow ONE frozen cell past the 4×max(base,64) bound: identical
    // vectors land in the same cell deterministically
    NdjsonIngest.appendDelta((1000L until 1300L).map(i =>
      (i, Array.tabulate(dim)(j => if (j < 2) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding"), tableDir, "vec_id") // c2
    assert(sync().contains((1L, 2L)))
    // the sync detected the imbalance and SWAPPED: a generation pointer
    // now resolves loads, and the new handle passes the watermark
    assert(Files.exists(java.nio.file.Paths.get(idxDir, "current")))
    val h1 = AnnIndex.load(spark, idxDir).get
    assert(h1.indexDir !== h0.indexDir)
    assert(AnnIndex.imbalanceReason(spark, h1.indexDir, h1.layers).isEmpty)
    // the OLD generation's files are untouched — a reader holding the
    // pre-swap handle keeps serving (its own watermark would trip, which
    // is exactly the pre-swap contract; its files still exist)
    assert(Files.exists(java.nio.file.Paths.get(h0.indexDir, "meta")))
    // search against the new generation matches exhaustive top-5
    val all = (vecs ++ (1000L until 1300L).map(i =>
      (i, Array.tabulate(dim)(j => if (j < 2) 1.0f else 0.0f))))
      .toDF("vec_id", "embedding").localCheckpoint()
    val probeIds = Seq(30L, 55L)
    val probes = vecs.filter(v => probeIds.contains(v._1))
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val got = AnnIndex.search(spark, h1, all, "vec_id", "embedding",
      probes, k = 5, nprobe = 2, refine = 40)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val exact = all.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val want = probes.flatMap { case (qid, qv) =>
      exact.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv.map(_.toFloat), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
        .map { case (id, _) => (qid, id) }
    }.toSet
    assert(got === want)
    // later ticks keep syncing into the NEW generation (no re-encode of
    // the already-covered feed)
    NdjsonIngest.appendDelta(
      Seq((2000L, vecs(30)._2.clone())).toDF("vec_id", "embedding"),
      tableDir, "vec_id") // c3
    assert(sync().contains((2L, 3L)))
    val h2 = AnnIndex.load(spark, idxDir).get
    assert(h2.indexDir === h1.indexDir)
    val codes = spark.read.option("basePath", s"${h2.indexDir}/codes")
      .parquet(h2.layers.map(l => s"${h2.indexDir}/codes/layer=$l"): _*)
    assert(codes.groupBy("id").count().select("count").distinct()
      .as[Long].collect().toSet === Set(1L))
  }

  test("rebuildSwap after a CRASHED swap (next-gen meta committed, " +
    "pointer never flipped) retrains fresh instead of adopting the " +
    "stale generation") {
    val root = Files.createTempDirectory("annswapcrash").toString + "/idx"
    AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", root,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    // simulate the crash window: gen-1 fully commits (trained on a
    // 2-vector stale corpus so adoption is detectable) but the process
    // dies before `current` flips — the pointer still resolves the flat
    // layout
    val stale = vecs.take(2).toDF("vec_id", "embedding")
    AnnIndex.buildOrLoad(spark, stale, "vec_id", "embedding",
      s"$root/gen-1", dim, cells = 2, m = 2, k = 4, iters = 1)
    assert(!Files.exists(java.nio.file.Paths.get(root, "current")))
    // the retry must DELETE the unreferenced partial generation and
    // train on today's corpus — adopting the stale one would serve an
    // index missing most vectors
    val h = AnnIndex.rebuildSwap(spark, emb, "vec_id", "embedding", root,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    assert(h.indexDir === s"$root/gen-1")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "current")).trim === "gen-1")
    val codes = spark.read.option("basePath", s"${h.indexDir}/codes")
      .parquet(h.layers.map(l => s"${h.indexDir}/codes/layer=$l"): _*)
    assert(codes.select("id").distinct().count() === vecs.length.toLong)
  }

  test("gcGenerations reclaims generations two swaps old; the live and " +
    "previous generations (and an unswapped flat layout) survive") {
    val root = Files.createTempDirectory("anngens").toString + "/idx"
    AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", root,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    // flat layout, no pointer: gc must not touch anything
    assert(AnnIndex.gcGenerations(root) === Nil)
    assert(Files.exists(java.nio.file.Paths.get(root, "meta")))
    // swap 1 (flat → gen-1): flat is the previous generation, still in
    // the drain window
    AnnIndex.rebuildSwap(spark, emb, "vec_id", "embedding", root,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    assert(AnnIndex.gcGenerations(root) === Nil)
    assert(Files.exists(java.nio.file.Paths.get(root, "meta")))
    // swap 2 (gen-1 → gen-2): the flat layout (generation 0) is now two
    // swaps old — reclaimed; gen-1 stays as the drain window
    AnnIndex.rebuildSwap(spark, emb, "vec_id", "embedding", root,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    val dead2 = AnnIndex.gcGenerations(root)
    assert(dead2.contains("meta") && dead2.contains("codes"), dead2)
    assert(!Files.exists(java.nio.file.Paths.get(root, "meta")))
    assert(Files.exists(java.nio.file.Paths.get(root, "gen-1")))
    // swap 3: gen-1 goes, gen-2 stays, gen-3 serves
    AnnIndex.rebuildSwap(spark, emb, "vec_id", "embedding", root,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    assert(AnnIndex.gcGenerations(root) === Seq("gen-1"))
    assert(Files.exists(java.nio.file.Paths.get(root, "gen-2")))
    val h = AnnIndex.load(spark, root).get
    assert(h.indexDir === s"$root/gen-3")
    val got = AnnIndex.search(spark, h, emb, "vec_id", "embedding",
      Seq((0L, vecs.head._2.map(_.toDouble))), k = 3, nprobe = 2)
    assert(got.count() === 3)
  }

  test("search prunes unprobed cell partitions at the scan") {
    val dir = Files.createTempDirectory("annidx").toString + "/idx"
    val h = AnnIndex.buildOrLoad(spark, emb, "vec_id", "embedding", dir,
      dim, cells = 4, m = 2, k = 8, iters = 3)
    val df = AnnIndex.search(spark, h, emb, "vec_id", "embedding",
      Seq((0L, vecs.head._2.map(_.toDouble))), k = 5, nprobe = 1, refine = 15)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val codesScan = p.linesIterator.find(l =>
      l.contains("FileScan") && l.contains("codes"))
    assert(codesScan.exists(l => l.contains("PartitionFilters: [") &&
      l.substring(l.indexOf("PartitionFilters: [")).contains("cell")),
      s"no cell partition filter on the codes scan:\n${codesScan.getOrElse(p)}")
  }
}
