package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{VectorFunctions => VF}
import graft.core.Tables

/** Scratch dev probe: phase-level timing of the q_pq_recall pipeline. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ph[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // argmax formulation experiment: array_max(array(struct)) vs greatest(structs)
    {
      val emb = Tables.load(spark, sfDir, "embeddings").localCheckpoint()
      val cents = graft.ann.Ivf.seedCentroids(64, 16, 7L)
      val centsLit = typedLit(cents.map(_.toSeq).toSeq)
      def scored = cents.indices.map { i =>
        struct(VF.dot(col("embedding"), element_at(centsLit, i + 1)).as("d"),
          lit(-i).as("ni"))
      }
      val viaArrayMax = (-array_max(array(scored: _*)).getField("ni")).cast("int")
      val viaGreatest = (-greatest(scored: _*).getField("ni")).cast("int")
      for (r <- 1 to 2) {
        ph(s"argmax via array_max (r$r)") {
          emb.select(viaArrayMax.as("c")).agg(sum(col("c"))).collect()
        }
        ph(s"argmax via greatest (r$r)") {
          emb.select(viaGreatest.as("c")).agg(sum(col("c"))).collect()
        }
        val eq = emb.select(viaArrayMax.as("a"), viaGreatest.as("b"))
          .filter(col("a") =!= col("b")).count()
        println(s"disagreements: $eq")
      }
    }
    for (rep <- 1 to 2) {
      println(s"== rep $rep ==")
      val emb = ph("checkpoint emb") {
        Tables.load(spark, sfDir, "embeddings").localCheckpoint()
      }
      val cents = ph("ivf.train") {
        graft.ann.Ivf.train(emb, "embedding", dim = 64, cells = 16, iters = 2)
      }
      val books = ph("pq.train") {
        graft.ann.Pq.train(emb, "embedding", dim = 64, m = 8, k = 16, iters = 2)
      }
      val probes = ph("probes") {
        VF.collectProbes(emb.filter(col("vec_id") < 10), "vec_id", "embedding")
      }
      val pq = graft.ann.Pq
        .topk(emb, "vec_id", "embedding", probes, cents, books,
          k = 5, nprobe = 12, refine = 80)
        .select("q_id", "n_id")
      val e = emb.select(col("vec_id"), col("embedding"), VF.norm2(col("embedding")).as("nrm"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("nq"))
      val nn = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"), col("nrm").as("nn"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
      val truth = ph("truth ckpt") {
        broadcast(q).join(nn, col("q_id") =!= col("n_id"))
          .withColumn("cos",
            round(VF.dot(col("qv"), col("nv")) / (col("nq") * col("nn")), 6))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select("q_id", "n_id")
          .localCheckpoint()
      }
      ph("index only (assign+encode)") {
        graft.ann.Pq.index(emb, "embedding", cents, books)
          .select(col("vec_id"), col("cell"),
            xxhash64(col("code")).cast("double").as("ch"))
          .agg(sum(col("ch"))).collect()
      }
      val pqFull = graft.ann.Pq
        .topk(emb, "vec_id", "embedding", probes, cents, books,
          k = 5, nprobe = 12, refine = 80)
      ph("pq.topk count") { pqFull.count() }
      // stagewise: candidates -> adc -> first window -> second window
      val m = books.length
      val pdf = {
        import spark.implicits._
        probes.flatMap { case (qid, qv) =>
          val l = graft.ann.Pq.lut(qv, books)
          graft.ann.Ivf.probeCells(qv, cents, 12).map(cell => (qid, qv.toSeq, l, cell))
        }.toDF("q_id", "qv", "lut", "cell")
      }
      val adc = (0 until m).map(j =>
        element_at(element_at(col("lut"), j + 1),
          element_at(col("code"), j + 1) + 1)).reduce(_ + _)
      val cand = graft.ann.Pq.index(emb, "embedding", cents, books)
        .select(col("vec_id").as("n_id"), col("embedding").as("nv"),
          col("cell"), col("code"), VF.norm2(col("embedding")).as("nn"))
        .join(broadcast(pdf), Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
      ph("candidates count") { cand.count() }
      val withAdc = cand.withColumn("adc", adc)
      ph("adc count") { withAdc.count() }
      ph("adc sum (forces adc eval)") {
        withAdc.agg(sum(col("adc"))).collect()
      }
      if (rep == 2) {
        val pw = new java.io.PrintWriter("/tmp/adc_plan.txt")
        pw.println(withAdc.agg(sum(col("adc"))).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        pw.close()
      }
      ph("adc+code sum (forces encode too)") {
        withAdc.agg(sum(col("adc") + xxhash64(col("code")).cast("double"))).collect()
      }
      val wAdc = Window.partitionBy("q_id").orderBy(col("adc").desc, col("n_id"))
      val ark = withAdc.withColumn("ark", row_number().over(wAdc))
        .filter(col("ark") <= 80)
      ph("first window count") { ark.count() }
      val wCos = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
      val full2 = ark.withColumn("cos",
          round(VF.dot(col("qv"), col("nv")) / (VF.norm2(col("qv")) * col("nn")), 6))
        .withColumn("rk", row_number().over(wCos).cast("int"))
        .filter(col("rk") <= 5)
      ph("both windows count") { full2.count() }
      val hit = ph("hit count (pq search)") {
        pq.join(truth, Seq("q_id", "n_id"), "left_semi").count()
      }
      val total = ph("total") { truth.count() }
      println(s"hit=$hit total=$total recall=${hit.toDouble / total}")
      // cell balance of the trained quantizer
      val hist = graft.ann.Ivf.assign(emb, "embedding", cents)
        .groupBy("cell").count().orderBy("cell").collect()
        .map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
      println(s"cells: $hist")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
