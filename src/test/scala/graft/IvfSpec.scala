package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ann.Ivf
import graft.functions.{VectorFunctions => VF}

/** IVF coarse quantizer: deterministic training, cell assignment coherence,
  * and top-k recall vs exhaustive search on a clustered synthetic set.
  */
class IvfSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8

  /** 4 well-separated direction clusters × 25 points with a deterministic
    * per-point wobble — ground-truth neighbors of a point are its cluster.
    */
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

  test("training is deterministic and centroids are unit-norm") {
    val c1 = Ivf.train(emb, "embedding", dim, cells = 4, iters = 3)
    val c2 = Ivf.train(emb, "embedding", dim, cells = 4, iters = 3)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    c1.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("after training, each synthetic cluster lands in one cell") {
    val cents = Ivf.train(emb, "embedding", dim, cells = 4, iters = 4)
    val assigned = Ivf.assign(emb, "embedding", cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 4).foreach { c =>
      val cells = (0 until 25).map(j => assigned((c * 25 + j).toLong)).distinct
      assert(cells.size === 1, s"cluster $c split across cells $cells")
    }
  }

  test("top-k with nprobe=1 over separated clusters matches brute force") {
    val cents = Ivf.train(emb, "embedding", dim, cells = 4, iters = 4)
    val probes = vecs.filter(_._1 < 3).map { case (id, v) => (id, v.map(_.toDouble)) }
    val got = Ivf.topk(emb, "vec_id", "embedding", probes, cents, k = 5, nprobe = 1)
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

    // probes' true neighbors are same-cluster points, which sit in the
    // probed cell — recall is 1.0 by construction here
    assert(got === truth)
  }

  test("empty cells keep their centroid (no NaN collapse)") {
    // 2 points, 8 cells: most cells see no vectors
    val tiny = vecs.take(2).toDF("vec_id", "embedding")
    val cents = Ivf.train(tiny, "embedding", dim, cells = 8, iters = 2)
    cents.foreach(c => assert(c.forall(x => !x.isNaN)))
  }
}
