package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Product quantization (PQ) for ANN at scale, composed with the IVF coarse
  * quantizer ([[Ivf]]) into the canonical billion-vector layout (IVF-PQ):
  * each vector is split into `m` subvectors; each subvector is replaced by
  * the id of its nearest per-subspace codebook centroid. A dim-64 float
  * vector (256 bytes) becomes `m` small ints — the candidate scan reads
  * codes, not floats, and a query scores candidates with `m` lookups into a
  * per-query LUT (asymmetric distance computation, ADC) instead of a
  * 64-term dot product.
  *
  * Scale shape: codes are an ordinary int-array column riding the same
  * partitioning as the ids (at 100 TB: the persisted index table is
  * (cell, code, id) — a fraction of the vector bytes, usually
  * memory-resident where the vectors are not). Search = IVF cell equi-join
  * to bound candidates, ADC via element_at over the broadcast LUT (pure
  * codegen arithmetic, no UDF), exact re-rank of the top `refine` only.
  * Training is per-subspace k-means driven by ONE groupBy per Lloyd pass
  * (all m subspaces explode into (subspace, cell, subvec) rows and
  * aggregate together); only the m×k×(dim/m) codebook crosses the driver.
  *
  * Determinism: seeded codebooks + strict left-fold double arithmetic, so
  * a SQL oracle embedding the same codebook literals reproduces encode,
  * ADC and refine bit-for-bit (same contract as Ivf.seedCentroids).
  */
object Pq {

  /** Deterministic seeded-Gaussian UNIT codebook: `m` subspaces × `k`
    * centroids × (dim/m) dims. Unit centroids make argmin-L2 and
    * argmax-dot coincide up to the constant -1/2 term the encode
    * expression carries anyway. Public so the query layer can embed the
    * same values as SQL literals.
    */
  def seedCodebooks(dim: Int, m: Int, k: Int, seed: Long): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val rnd = new scala.util.Random(seed)
    Array.fill(m, k) {
      val v = Array.fill(sub)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }

  /** argmin-L2 sub-centroid for one subspace, as argmax of
    * `dot(x_j, c) - ||c||²/2` — one [[graft.functions.ArgmaxDot]] kernel
    * per subspace (max score, smallest-index tie-break; the -||c||²/2
    * terms ride as the kernel's bias array, computed with the identical
    * Scala fold as the struct-forest formulation it replaces, and the
    * subspace slice becomes the kernel's offset — no per-centroid slice
    * allocation). Codegen source is ~20 lines per subspace vs tens of KB,
    * so Janino compilation stops dominating every encode-touching action.
    */
  private def codeExpr(vec: Column, book: Array[Array[Double]], off: Int): Column = {
    import org.apache.spark.sql.GraftShims
    val bias = book.map(c => -(c.map(x => x * x).sum / 2))
    GraftShims.column(graft.functions.ArgmaxDot(
      GraftShims.expression(vec), book, bias, off))
  }

  /** The PQ code column: array<int> of length m (one sub-centroid id per
    * subspace).
    */
  def encodeExpr(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    val sub = books(0)(0).length
    array(books.zipWithIndex.map { case (book, j) =>
      codeExpr(vec, book, j * sub)
    }: _*)
  }

  /** Vectors with their `cell` (IVF) and `code` (PQ) columns — the
    * persisted IVF-PQ index table.
    */
  def index(
      emb: DataFrame, vecCol: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]]): DataFrame =
    Ivf.assign(emb, vecCol, cents).withColumn("code", encodeExpr(col(vecCol), books))

  /** Per-query ADC lookup table: lut(j)(i) = dot(q_subvec_j, books(j)(i)).
    * m×k doubles per probe — the "model-sized" object that ships broadcast.
    */
  def lut(probe: Array[Double], books: Array[Array[Array[Double]]]): Seq[Seq[Double]] = {
    val sub = books(0)(0).length
    books.zipWithIndex.map { case (book, j) =>
      book.map { c =>
        var s = 0.0
        var i = 0
        while (i < sub) { s += probe(j * sub + i) * c(i); i += 1 }
        s
      }.toSeq
    }.toSeq
  }

  /** IVF-PQ search: probe `nprobe` cells per query, ADC-score every
    * candidate with m LUT lookups, exact-cosine re-rank only the top
    * `refine` candidates, emit the top `k`. `probes` must be bounded
    * (broadcast-dim contract, like Ivf.topk).
    */
  def topk(
      emb: DataFrame, idCol: String, vecCol: String,
      probes: Seq[(Long, Array[Double])],
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      k: Int = 5, nprobe: Int = 4, refine: Int = 20): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = books.length
    val pdf = probes.flatMap { case (qid, qv) =>
      val l = lut(qv, books)
      Ivf.probeCells(qv, cents, nprobe).map(cell => (qid, qv.toSeq, l, cell))
    }.toDF("q_id", "qv", "lut", "cell")
    // adc = sum_j lut[j][code[j]] — m element_at lookups, no vector math
    val adc = (0 until m).map(j =>
      element_at(element_at(col("lut"), j + 1),
        element_at(col("code"), j + 1) + 1)).reduce(_ + _)
    val wAdc = Window.partitionBy("q_id").orderBy(col("adc").desc, col("n_id"))
    val wCos = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    index(emb, vecCol, cents, books)
      .select(col(idCol).as("n_id"), col(vecCol).as("nv"), col("cell"), col("code"),
        VF.norm2(col(vecCol)).as("nn"))
      .join(broadcast(pdf), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adc", adc)
      .withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= refine)
      // exact re-rank: the full dot product runs on `refine` rows per
      // probe, not on every candidate
      .withColumn("cos",
        round(VF.dot(col("qv"), col("nv")) / (VF.norm2(col("qv")) * col("nn")), 6))
      .withColumn("rk", row_number().over(wCos).cast("int"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("n_id"), col("cos"))
  }

  /** Train per-subspace codebooks with Lloyd passes over unit-normalized
    * vectors (the cosine-workload convention). Training runs on a BOUNDED,
    * hash-ordered (= deterministic, data-dependent) sample — the standard
    * quantizer-training contract at scale: codebooks are a model, models
    * train on samples; only encoding touches every row. One groupBy per
    * pass for ALL subspaces: sample rows explode into (subspace, cell,
    * subvec) and aggregate per-dimension sums together; only
    * m×k×(sub+1) numbers reach the driver per pass.
    */
  def train(
      emb: DataFrame, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int = 3, seed: Long = 11L,
      sampleRows: Int = 4096): Array[Array[Array[Double]]] = {
    val sub = dim / m
    val unit = emb.select(col(vecCol).as("v"), VF.norm2(col(vecCol)).as("n"))
      .select(transform(col("v"),
        x => coalesce(x.cast("double") / nullif(col("n"), lit(0.0)), lit(0.0)))
        .as("uv"))
      // TakeOrderedAndProject top-K heap over one linear scan (not a total
      // sort), then pinned so each Lloyd pass re-reads the sample, not the
      // table
      .withColumn("h", xxhash64(col("uv")))
      .orderBy("h").limit(sampleRows)
      .drop("h")
      .localCheckpoint()
    var books = seedCodebooks(dim, m, k, seed)
    for (_ <- 0 until iters) {
      val exploded = unit.select(explode(array((0 until m).map { j =>
        struct(lit(j).as("j"),
          codeExpr(col("uv"), books(j), j * sub).as("cell"),
          slice(col("uv"), j * sub + 1, sub).as("sv"))
      }: _*)).as("e"))
        .select(col("e.j").as("j"), col("e.cell").as("cell"), col("e.sv").as("sv"))
      val aggs = count(lit(1)).as("n") +:
        (0 until sub).map(i => sum(element_at(col("sv"), i + 1)).as(s"d$i"))
      val sums = exploded.groupBy("j", "cell").agg(aggs.head, aggs.tail: _*).collect()
      val acc = Array.fill(m, k)(new Array[Double](sub))
      val cnt = Array.fill(m, k)(0L)
      sums.foreach { r =>
        val j = r.getInt(0); val cell = r.getInt(1)
        cnt(j)(cell) = r.getLong(2)
        var i = 0
        while (i < sub) {
          if (!r.isNullAt(3 + i)) acc(j)(cell)(i) = r.getDouble(3 + i)
          i += 1
        }
      }
      books = books.zipWithIndex.map { case (book, j) =>
        book.zipWithIndex.map { case (old, c) =>
          // mean (not re-normalized): sub-centroids are L2 cluster means
          if (cnt(j)(c) == 0) old else acc(j)(c).map(_ / cnt(j)(c))
        }
      }
    }
    books
  }
}
