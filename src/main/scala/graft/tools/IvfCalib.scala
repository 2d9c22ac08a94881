package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ann.Ivf
import graft.functions.{VectorFunctions => VF}
object IvfCalib {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings").localCheckpoint()
    val e = emb.select(col("vec_id"), col("embedding"), VF.norm2(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("nq"))
    val nn = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"), col("nrm").as("nn"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    val truth = broadcast(q).join(nn, col("q_id") =!= col("n_id"))
      .withColumn("cos", round(VF.dot(col("qv"), col("nv")) / (col("nq") * col("nn")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("q_id", "n_id").localCheckpoint()
    val total = truth.count()
    val probes = VF.collectProbes(emb.filter(col("vec_id") < 10), "vec_id", "embedding")
    for (cells <- Seq(8, 16, 32); nprobe <- Seq(2, 4, 8); iters <- Seq(2, 3)) {
      val cents = Ivf.train(emb, "embedding", dim = 64, cells = cells, iters = iters)
      val ivf = Ivf.topk(emb, "vec_id", "embedding", probes, cents, k = 5, nprobe = nprobe)
        .select("q_id", "n_id")
      val hit = ivf.join(truth, Seq("q_id", "n_id"), "left_semi").count()
      println(f"cells=$cells nprobe=$nprobe iters=$iters recall=${hit.toDouble / total}%.3f")
    }
    spark.stop()
  }
}
