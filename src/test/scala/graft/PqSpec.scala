package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ann.{Ivf, Pq}
import graft.functions.{VectorFunctions => VF}

/** Product quantization: encode determinism, reconstruction quality of
  * trained codebooks, and IVF-PQ search recall vs exhaustive cosine.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8

  /** Same clustered synthetic set as IvfSpec: 4 direction clusters × 25. */
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val base = Seq(
      Array.tabulate(dim)(i => if (i < 2) 1.0 else 0.0),
      Array.tabulate(dim)(i => if (i >= 2 && i < 4) 1.0 else 0.0),
      Array.tabulate(dim)(i => if (i >= 4 && i < 6) 1.0 else 0.0),
      Array.tabulate(dim)(i => if (i >= 6) 1.0 else 0.0))
    for (c <- 0 until 4; j <- 0 until 25) yield {
      val rnd = new scala.util.Random(c * 100L + j)
      val v = base(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      ((c * 25 + j).toLong, v)
    }
  }

  private lazy val emb = vecs.toDF("vec_id", "embedding").localCheckpoint()

  test("seeded codebooks are deterministic unit vectors; encode is stable") {
    val b1 = Pq.seedCodebooks(dim, m = 2, k = 4, seed = 11L)
    val b2 = Pq.seedCodebooks(dim, m = 2, k = 4, seed = 11L)
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq === b2.map(_.map(_.toSeq).toSeq).toSeq)
    b1.foreach(_.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    })
    val e1 = emb.select(Pq.encodeExpr(col("embedding"), b1).as("code"))
      .as[Seq[Int]].collect().toSeq
    val e2 = emb.select(Pq.encodeExpr(col("embedding"), b1).as("code"))
      .as[Seq[Int]].collect().toSeq
    assert(e1 === e2)
    assert(e1.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 4)))
  }

  test("trained codebooks reconstruct better than seeded ones") {
    def mse(books: Array[Array[Array[Double]]]): Double = {
      val sub = dim / books.length
      val unit = emb.select(col("embedding").as("v"), VF.norm2(col("embedding")).as("n"))
        .select(transform(col("v"),
          x => coalesce(x.cast("double") / nullif(col("n"), lit(0.0)), lit(0.0)))
          .as("uv"))
      val code = Pq.encodeExpr(col("uv"), books)
      // per-row squared reconstruction error, summed over subspaces
      val err = books.indices.map { j =>
        val sv = slice(col("uv"), j * sub + 1, sub)
        val cent = element_at(typedLit(books(j).map(_.toSeq).toSeq),
          element_at(col("code"), j + 1) + 1)
        aggregate(zip_with(sv, cent, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
      }.reduce(_ + _)
      unit.withColumn("code", code).select(avg(err)).as[Double].head()
    }
    val seeded = mse(Pq.seedCodebooks(dim, m = 2, k = 4, seed = 11L))
    val trained = mse(Pq.train(emb, "embedding", dim, m = 2, k = 4, iters = 3))
    assert(trained < seeded,
      s"trained mse $trained not better than seeded $seeded")
    // 4 clusters, k=4 per subspace: trained quantization should be tight
    assert(trained < 0.05)
  }

  test("IVF-PQ search recalls the exhaustive top-5 on separated clusters") {
    val cents = Ivf.train(emb, "embedding", dim, cells = 4, iters = 4)
    val books = Pq.train(emb, "embedding", dim, m = 2, k = 8, iters = 3)
    val probes = vecs.filter(_._1 < 3).map { case (id, v) => (id, v.map(_.toDouble)) }
    val got = Pq.topk(emb, "vec_id", "embedding", probes, cents, books,
      k = 5, nprobe = 1, refine = 15)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = emb.select(col("vec_id"), col("embedding"), VF.norm2(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("nq"))
    val n = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"), col("nrm").as("nn"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    val truth = broadcast(q).join(n, col("q_id") =!= col("n_id"))
      .withColumn("cos",
        round(VF.dot(col("qv"), col("nv")) / (col("nq") * col("nn")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall below 0.8 (got=$got truth=$truth)")
  }
}
