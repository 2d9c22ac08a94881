package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** IVF (inverted-file) ANN index: a coarse spherical k-means quantizer
  * partitions the vector space into `cells`; each vector is stored under its
  * nearest centroid; a query probes only the `nprobe` nearest cells. This is
  * the second 100 TB similarity path next to hyperplane LSH ([[Similarity]]):
  * LSH needs no training but fixes its geometry up front, IVF adapts cells
  * to the data distribution (fewer, fuller buckets → better recall per
  * candidate examined).
  *
  * Scale shape: training touches the data `iters` times with one
  * groupBy-per-pass (partial-aggregated per-dimension sums — never a
  * collect of vectors; only the cells×dim centroid matrix, the "model", hits
  * the driver, exactly like the reference's broadcast-sized tree contract).
  * Search is an equi-join on cell id: probe fan-out = nprobe, per-cell
  * candidate lists are data-partitioned, no all-pairs anywhere.
  *
  * Determinism: centroids are seeded-Gaussian initialized and every update
  * is a fixed-order aggregate of rounded sums, so the index is reproducible
  * across runs and cluster layouts.
  */
object Ivf {

  /** Deterministic seeded-Gaussian unit vectors: k-means init here, and
    * the frozen quantizer geometry of `q_ann_ivf` (whose SQL oracle
    * embeds the same values as literals — public so the query layer can
    * generate them once for both sides).
    */
  def seedCentroids(dim: Int, cells: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(cells) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }

  /** argmax-dot cell assignment against the centroid matrix: one
    * [[graft.functions.ArgmaxDot]] kernel (max dot, smallest-index
    * tie-break — value-identical to the `array_max` over (dot, -index)
    * structs it replaces, see the kernel's scaladoc for the proof
    * obligations). Unit centroids, so argmax dot == argmax cosine (|v| is
    * constant across candidates). The matrix rides as a codegen REFERENCE
    * object, so the compiled source is identical across Lloyd passes and
    * plans — the struct-forest formulation generated tens of KB of source
    * per plan and re-paid Janino compilation on every action.
    */
  private def assignExpr(vec: Column, cents: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(graft.functions.ArgmaxDot(
      GraftShims.expression(vec), cents, null, 0))
  }

  /** Train the coarse quantizer: farthest-point init on a deterministic
    * bounded sample, then `iters` Lloyd passes of spherical k-means over a
    * BOUNDED, hash-ordered (= deterministic, data-dependent) training
    * sample — the same quantizer-training contract as [[Pq.train]]: the
    * model trains on a sample, only assignment/encoding touches every
    * row. The sample is localCheckpoint-pinned, so training reads the
    * full table ONCE (the sampling top-K) instead of once per Lloyd pass.
    * `sampleRows` scales with the cell count (≥ 64 sample points per
    * requested cell, ≥ 4096) so cells stay well-estimated as callers ask
    * for more of them. Returns the centroid matrix (cells × dim).
    */
  def train(
      emb: DataFrame, vecCol: String,
      dim: Int, cells: Int, iters: Int = 3, seed: Long = 7L): Array[Array[Double]] = {
    val sampleRows = math.max(4096, cells * 64)
    // norm as its own column first: an expression referenced INSIDE a
    // higher-order-function lambda re-evaluates per element — norm2 inline
    // would redo the full dot product dim times per row. Zero-norm vectors
    // project to the zero vector (not NaN): they score 0 against every
    // centroid and land deterministically in cell 0 instead of poisoning
    // centroid updates with NaN sums.
    val unit = emb.select(col(vecCol).as("v"), VF.norm2(col(vecCol)).as("n"))
      .select(transform(col("v"),
        x => coalesce(x.cast("double") / nullif(col("n"), lit(0.0)), lit(0.0)))
        .as("uv"))
    // the Lloyd training sample: NOT a total sort — orderBy+limit compiles
    // to TakeOrderedAndProject (plan-checked), a per-partition top-K heap
    // over one linear scan, merged on the driver. Pinned so each Lloyd
    // pass re-reads the sample, not the table.
    val trainSet = unit
      .withColumn("h", xxhash64(col("uv")))
      .orderBy("h").limit(sampleRows)
      .localCheckpoint()
    try {
      trainInner(trainSet, dim, cells, iters, seed)
    } finally {
      // the pinned sample is consumed entirely inside this call — release
      // its blocks so repeated train() calls in one session don't leak
      org.apache.spark.sql.GraftShims.unpersistLocalCheckpoint(trainSet)
    }
  }

  private def trainInner(
      trainSet: DataFrame,
      dim: Int, cells: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    // init: greedy farthest-point (k-means++-style) over a bounded,
    // hash-ordered prefix of the training sample (identical rows to the
    // pre-sample-training code: the first `cells*32` by hash order) —
    // standard IVF practice: the quantizer trains on a sample, only the
    // cells×dim model crosses the driver. Data-blind random init can
    // split one dense region across cells while merging two others;
    // farthest-point cannot.
    val sample: Array[Array[Double]] = trainSet
      .orderBy("h").limit(math.max(cells * 32, 256))
      .select("uv").collect().map(_.getSeq[Double](0).toArray)
    var cents: Array[Array[Double]] =
      if (sample.isEmpty) seedCentroids(dim, cells, seed)
      else {
        val picked = scala.collection.mutable.ArrayBuffer(sample(0))
        while (picked.size < cells && picked.size < sample.length) {
          // the sample point least similar to its nearest picked centroid
          val far = sample.maxBy { v =>
            -picked.map(c => c.zip(v).map { case (a, b) => a * b }.sum).max
          }
          picked += far
        }
        // more cells than sample points: pad with seeded directions
        val pad = seedCentroids(dim, cells, seed).drop(picked.size)
        (picked ++ pad).toArray
      }
    for (_ <- 0 until iters) {
      // per-(cell, dimension) sums as `dim` aggregate COLUMNS over one
      // groupBy — a single partial-aggregated pass with no explode (the
      // posexplode formulation shuffled rows×dim exploded rows per pass);
      // only the cells×(dim+1) result crosses to the driver
      val aggs = count(lit(1)).as("n") +:
        (0 until dim).map(i => sum(element_at(col("uv"), i + 1)).as(s"d$i"))
      val sums = trainSet
        .select(assignExpr(col("uv"), cents).as("cell"), col("uv"))
        .groupBy("cell").agg(aggs.head, aggs.tail: _*)
        .collect()
      val acc = Array.fill(cells)(new Array[Double](dim))
      val cnt = new Array[Long](cells)
      sums.foreach { r =>
        val cell = r.getInt(0)
        cnt(cell) = r.getLong(1)
        var i = 0
        while (i < dim) {
          if (!r.isNullAt(2 + i)) acc(cell)(i) = r.getDouble(2 + i)
          i += 1
        }
      }
      cents = cents.zipWithIndex.map { case (old, i) =>
        if (cnt(i) == 0) old // empty cell keeps its centroid
        else {
          val n = math.sqrt(acc(i).map(x => x * x).sum)
          if (n == 0) old else acc(i).map(_ / n)
        }
      }
    }
    cents
  }

  /** Vectors tagged with their IVF cell (the persisted index table). */
  def assign(emb: DataFrame, vecCol: String, cents: Array[Array[Double]]): DataFrame =
    emb.withColumn("cell", assignExpr(col(vecCol), cents))

  /** The `nprobe` cells nearest to each probe vector (driver-side over the
    * small centroid matrix).
    */
  def probeCells(probe: Array[Double], cents: Array[Array[Double]], nprobe: Int): Seq[Int] = {
    // zero-norm probe: all dots are 0 either way; dividing by 1 keeps the
    // ranking deterministic (index order) instead of NaN-arbitrary
    val n0 = math.sqrt(probe.map(x => x * x).sum)
    val n = if (n0 == 0) 1.0 else n0
    cents.zipWithIndex
      .map { case (c, i) =>
        (c.zip(probe).map { case (a, b) => a * b / n }.sum, i)
      }
      .sortBy { case (d, i) => (-d, i) }
      .take(nprobe).map(_._2).toSeq
  }

  /** Top-k cosine neighbors for each probe row, examining only `nprobe`
    * cells per probe. `probes` must be bounded (collected + shipped as one
    * literal, like a broadcast dim).
    */
  def topk(
      emb: DataFrame, idCol: String, vecCol: String,
      probes: Seq[(Long, Array[Double])], cents: Array[Array[Double]],
      k: Int = 5, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    import spark.implicits._
    // (probe, probed cell) rows as a broadcast side: the scan is amplified
    // only where a probe actually examines the cell (vs exploding the whole
    // probe list against every row and filtering after)
    val pdf = probes.flatMap { case (qid, qv) =>
      probeCells(qv, cents, nprobe).map(cell => (qid, qv.toSeq, cell))
    }.toDF("q_id", "qv", "cell")
    val indexed = assign(emb, vecCol, cents)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    indexed
      .select(col(idCol).as("n_id"), col(vecCol).as("nv"), col("cell"),
        VF.norm2(col(vecCol)).as("nn"))
      .join(broadcast(pdf), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        round(VF.dot(col("qv"), col("nv")) / (VF.norm2(col("qv")) * col("nn")), 6))
      .select(col("q_id"), col("n_id"), col("cos"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
  }
}
