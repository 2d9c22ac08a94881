package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Approximate nearest-neighbor search over embedding columns.
  *
  * Brute force (`q_ann_pairs`/`q_ann_topk`) is the exactness baseline; this
  * is the 100 TB path: random-hyperplane LSH over L independent tables of
  * k bits each. Candidates = same bucket in ANY table; exact cosine then
  * verifies. Precision is 1.0 by construction (every candidate is
  * verified); recall is the classic `1-(1-p^k)^L` with
  * `p = 1 - θ/π` — tune (k, L) per threshold. The pairwise join only ever
  * happens WITHIN buckets, so the shuffle key-space is bounded and no
  * cross join survives at scale.
  */
object Similarity {

  /** Deterministic pseudo-random unit hyperplanes (fixed seed → stable
    * bucketing across runs/partitions).
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Near-duplicate pairs at `threshold`, via (k-bit, L-table) LSH then
    * exact verification.
    */
  def lshNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int = 4, tables: Int = 8, threshold: Double = 0.4,
      seed: Long = 42L): DataFrame = {
    val buckets: Seq[Column] = (0 until tables).map { t =>
      VF.lshBucket(col(vecCol), hyperplanes(dim, k, seed + t)).as(s"b$t")
    }
    // materialize once: the bucketed table feeds 2 join sides × L tables
    // (at scale this is a persisted/bucketed index table)
    val withB = emb.select((col(idCol) +: col(vecCol) +: buckets): _*)
      .withColumn("nrm", VF.norm2(col(vecCol)))
      .localCheckpoint()
    // ONE equi-join on (table, bucket) over the table-exploded rows
    // instead of L separate per-table joins: identical candidate pairs,
    // same exchange bytes in total (L copies of each vector either way),
    // but 2 exchanges and 1 join stage rather than 2L — at cluster scale
    // that is one shuffle boundary to size and one stage to schedule.
    // Cosine-verify MAP-SIDE in the join output; only verified survivors
    // ≥ threshold reach the dropDuplicates exchange (cos per pair is
    // table-independent, so dedup after verification commutes).
    val exploded = withB.select(col(idCol), col(vecCol), col("nrm"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), col(s"b$t").as("bk"))): _*)).as("tb"))
      .select(col(idCol), col(vecCol), col("nrm"),
        col("tb.t").as("t"), col("tb.bk").as("bk"))
    val a = exploded.select(col(idCol).as("a_id"), col(vecCol).as("av"),
      col("nrm").as("na"), col("t"), col("bk"))
    val b = exploded.select(col(idCol).as("b_id"), col(vecCol).as("bv"),
      col("nrm").as("nb"), col("t"), col("bk"))
    a.join(b, Seq("t", "bk")).filter(col("a_id") < col("b_id"))
      .withColumn("cos",
        round(VF.dot(col("av"), col("bv")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
      .dropDuplicates("a_id", "b_id")
  }

  /** SemDeDup (Abbas et al. 2023) within-cell marking: given vectors
    * already tagged with a quantizer `cell`, mark a vector as a
    * near-duplicate if ANY smaller-id cell-mate sits within cosine ≥
    * `threshold` (round-before-threshold, so thresholds compare
    * deterministically across platforms). The kept set is the greedy
    * smallest-id representative per ε-ball — deterministic regardless of
    * partitioning. The only pairwise work is the cell-scoped equi-join.
    */
  def semdedupInCells(
      assigned: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val withN = assigned.select(col(idCol), col(vecCol), col("cell"),
      VF.norm2(col(vecCol)).as("nrm"))
    val a = withN.select(col(idCol).as("a_id"), col("cell"),
      col(vecCol).as("av"), col("nrm").as("na"))
    val b = withN.select(col(idCol), col("cell"),
      col(vecCol).as("bv"), col("nrm").as("nb"))
    val dup = a.join(b, Seq("cell"))
      .filter(col("a_id") < col(idCol))
      .filter(round(VF.dot(col("av"), col("bv")) / (col("na") * col("nb")), 6)
        >= threshold)
      .groupBy(idCol).agg(min(col("a_id")).as("dup_of"))
    assigned.select(col(idCol), col("cell"))
      .join(dup, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        col("dup_of").isNull.as("kept"), col("dup_of"))
  }

  /** SemDeDup off the PERSISTED IVF-PQ index ([[AnnIndex]]): the cell
    * assignment comes from the committed codes layers — maintained
    * O(batch) by the change feed (`AnnIndex.syncFromFeed`) — so dedup
    * pays NO quantizer training or assignment pass per invocation; only
    * the within-cell verify join runs. Exact embeddings come from the
    * corpus table (codes hold lossy PQ bytes), and the inner join on id
    * drops deleted vectors whose codes outlive them (append-only codes
    * contract, same as `AnnIndex.search`'s live filter). An id
    * re-encoded by a later layer (upsert) takes its NEWEST cell.
    *
    * The index must COVER the corpus: a corpus row with no committed
    * code (the feed consumer lagging an append) has no cell and can
    * get no verdict — that's an operational ordering error, so it
    * throws instead of silently dropping the row (run
    * `AnnIndex.syncFromFeed` first).
    */
  def semdedupFromIndex(h: AnnIndex.Handle, emb: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    if (h.layers.isEmpty) {
      // an all-row purge commits an empty chain: valid only while the
      // corpus is empty too — a non-empty corpus with no codes is the
      // same lag error the coverage check below catches
      require(emb.isEmpty,
        "index has no committed codes but the corpus is non-empty — " +
          "run AnnIndex.syncFromFeed before dedup")
      return semdedupInCells(
        emb.select(col(idCol), col(vecCol), lit(0).as("cell")).limit(0),
        idCol, vecCol, threshold)
    }
    // the within-cell verify join is O(Σ cell²): refuse once the corpus
    // has outgrown the frozen quantizer's cells (4x the build-time max —
    // AnnIndex.rebuild with a corpus-sized cell count is the escape)
    AnnIndex.requireBalanced(spark, h.indexDir, h.layers)
    val newestFirst = Window.partitionBy(col(idCol))
      .orderBy(col("layer").cast("long").desc)
    // localCheckpoint: the cells frame feeds BOTH the coverage count and
    // the dedup join — without it the codes scan + per-id window run
    // twice (and a concurrent gcCodes between the two jobs could fail
    // the second scan on a deleted layer dir)
    val cells = spark.read
      .option("basePath", s"${h.indexDir}/codes")
      .parquet(h.layers.map(l => s"${h.indexDir}/codes/layer=$l"): _*)
      .select(col("id").as(idCol), col("cell"), col("layer"))
      .withColumn("rk", row_number().over(newestFirst))
      .filter(col("rk") === 1)
      .select(col(idCol), col("cell"))
      .localCheckpoint()
    val uncovered = emb.select(col(idCol))
      .join(cells, Seq(idCol), "left_anti").count()
    require(uncovered == 0,
      s"$uncovered corpus vectors have no committed code entry — the " +
        "index lags the corpus; run AnnIndex.syncFromFeed before dedup")
    val assigned = emb.select(col(idCol), col(vecCol)).join(cells, Seq(idCol))
    semdedupInCells(assigned, idCol, vecCol, threshold)
  }

  /** SemDeDup production entry point: cells SCALE WITH THE CORPUS —
    * `cells ≈ N / targetCellSize` — so the within-cell self-join stays
    * O(N · targetCellSize) total pairs, LINEAR in corpus size (a fixed
    * cell count would be O(N²/cells), quadratic). The quantizer is the
    * trained IVF coarse quantizer ([[Ivf.train]]: sample-init + Lloyd
    * passes, only the cells×dim model crosses the driver), the same
    * model a persisted [[AnnIndex]] holds — a recurring dedup should use
    * [[semdedupFromIndex]] instead of retraining per run.
    *
    * Scale: the centroid matrix is cells×dim ≈ (N/targetCellSize)×dim
    * doubles and must stay broadcast-sized, so past `maxCellsPerLevel`
    * cells the quantizer goes TWO-LEVEL — assign every vector to one of
    * ceil(cells / maxCellsPerLevel) coarse shards first, then run the
    * single-level recipe per shard with cells sized to THAT shard.
    * Each level's centroid matrix stays under the broadcast budget, pair
    * work stays linear (every pair is still within one fine cell), and
    * the default budget carries ~67M vectors per shard at the default
    * targetCellSize. A pathologically skewed shard (identical vectors —
    * no quantizer can split them) clamps its fine-cell count at the
    * budget instead of recursing forever.
    */
  def semdedup(
      emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.35, targetCellSize: Long = 1024L,
      iters: Int = 2, seed: Long = 11L,
      maxCellsPerLevel: Int = 65536): DataFrame = {
    require(maxCellsPerLevel >= 1, "maxCellsPerLevel must be positive")
    val n = emb.count()
    val cells = math.max(1L, (n + targetCellSize - 1) / targetCellSize)
    if (cells <= maxCellsPerLevel)
      return semdedupLevel(emb, idCol, vecCol, dim, cells.toInt, threshold,
        iters, seed)
    // shard count capped so shard*budget+cell stays an INT — the output
    // schema must not depend on corpus size (single-level cells are
    // IntegerType); at the default budget the cap still addresses ~2e9
    // fine cells (~2 trillion vectors at the default target)
    val shards = Seq(
      (cells + maxCellsPerLevel - 1) / maxCellsPerLevel,
      maxCellsPerLevel.toLong,
      (Int.MaxValue / maxCellsPerLevel).toLong).min.toInt
    val coarse = Ivf.train(emb, vecCol, dim, shards, iters, seed ^ 0x5eedL)
    // one assignment pass, checkpointed: every shard's sub-dedup filters
    // this frame (without the cut each shard would re-run the scan+assign)
    val tagged = Ivf.assign(emb, vecCol, coarse)
      .withColumnRenamed("cell", "__shard").localCheckpoint()
    val counts = tagged.groupBy("__shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val parts = (0 until shards).flatMap { s =>
      counts.get(s).map { sn =>
        val sub = tagged.filter(col("__shard") === s).drop("__shard")
        val fine = math.min(
          math.max(1L, (sn + targetCellSize - 1) / targetCellSize),
          maxCellsPerLevel.toLong).toInt
        semdedupLevel(sub, idCol, vecCol, dim, fine, threshold, iters,
            seed + s)
          // disambiguate cell ids across shards (the verdict columns are
          // shard-local; kept/dup_of semantics don't depend on the id);
          // cast keeps the single-level IntegerType schema — the shard
          // cap above guarantees the offset sum fits
          .withColumn("cell",
            (col("cell") + lit(s * maxCellsPerLevel)).cast("int"))
      }
    }
    parts.reduce(_ unionByName _)
  }

  /** One quantizer level: train `cells` centroids, assign, dedup within
    * cells — the single-level recipe [[semdedup]] composes.
    */
  private def semdedupLevel(
      emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      cells: Int, threshold: Double, iters: Int, seed: Long): DataFrame = {
    val cents = Ivf.train(emb, vecCol, dim, cells, iters, seed)
    semdedupInCells(Ivf.assign(emb, vecCol, cents), idCol, vecCol, threshold)
  }
}
