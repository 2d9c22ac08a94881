package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{TextFunctions => TF}

/** Dev-only phase probe for the q_lift_pairs rewrite: times the shared
  * prefix and each formulation's tail inside ONE JVM.
  */
object LiftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        (dt, n)
      }
      println(f"PROBE $label rows=${ts.head._2} min=${ts.map(_._1).min}%.3f " +
        ts.map(t => f"${t._1}%.3f").mkString("[", ",", "]"))
    }

    def tkOf() = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
      .localCheckpoint()

    time("tk_ckpt") { tkOf().count() }

    time("n_agg") {
      val tk = tkOf()
      tk.agg(countDistinct(col("doc_id")).as("n")).count()
    }

    time("voc") {
      val tk = tkOf()
      tk.groupBy("tok").agg(count(lit(1)).as("cx"))
        .orderBy(col("cx").desc, col("tok")).limit(32).count()
    }

    time("sets_new") {
      val tk = tkOf()
      val voc = tk.groupBy("tok").agg(count(lit(1)).as("cx"))
        .orderBy(col("cx").desc, col("tok")).limit(32)
      tk.join(broadcast(voc), "tok")
        .groupBy("doc_id")
        .agg(sort_array(collect_set(struct(col("tok"), col("cx")))).as("ts"))
        .count()
    }

    time("pairs_new") {
      val tk = tkOf()
      val voc = tk.groupBy("tok").agg(count(lit(1)).as("cx"))
        .orderBy(col("cx").desc, col("tok")).limit(32)
      val sets = tk.join(broadcast(voc), "tok")
        .groupBy("doc_id")
        .agg(sort_array(collect_set(struct(col("tok"), col("cx")))).as("ts"))
      sets
        .select(explode(flatten(transform(col("ts"), (x, i) =>
          transform(slice(col("ts"), i + lit(2), size(col("ts"))),
            y => struct(x.getField("tok").as("t1"), y.getField("tok").as("t2"),
              x.getField("cx").as("cx1"), y.getField("cx").as("cx2")))))).as("pr"))
        .groupBy("pr.t1", "pr.t2")
        .agg(count(lit(1)).as("cxy"))
        .filter(col("cxy") >= 5)
        .count()
    }

    time("pairs_new2") {
      val tk = tkOf()
      val voc = tk.groupBy("tok").agg(count(lit(1)).as("cx"))
        .orderBy(col("cx").desc, col("tok")).limit(32)
      val sets = tk.join(broadcast(voc), "tok")
        .groupBy("doc_id")
        .agg(sort_array(collect_set(struct(col("tok"), col("cx")))).as("ts"))
      sets
        .select(col("ts"), posexplode(col("ts")).as(Seq("i", "x")))
        .select(col("x.tok").as("t1"), col("x.cx").as("cx1"),
          explode(slice(col("ts"), col("i") + lit(2),
            size(col("ts")) - col("i") - lit(1))).as("y"))
        .select(col("t1"), col("y.tok").as("t2"),
          col("cx1"), col("y.cx").as("cx2"))
        .groupBy("t1", "t2")
        .agg(max(col("cx1")).as("cx1"), max(col("cx2")).as("cx2"),
          count(lit(1)).as("cxy"))
        .filter(col("cxy") >= 5)
        .count()
    }

    time("pairs_old") {
      val tk = tkOf()
      val voc = tk.groupBy("tok").agg(count(lit(1)).as("cx"))
        .orderBy(col("cx").desc, col("tok")).limit(32)
      val inc = tk.join(broadcast(voc), "tok")
      val a = inc.select(col("doc_id"), col("tok").as("t1"), col("cx").as("cx1"))
      val b = inc.select(col("doc_id"), col("tok").as("t2"), col("cx").as("cx2"))
      a.join(b, Seq("doc_id"))
        .filter(col("t1") < col("t2"))
        .groupBy("t1", "t2")
        .agg(max(col("cx1")).as("cx1"), max(col("cx2")).as("cx2"),
          count(lit(1)).as("cxy"))
        .filter(col("cxy") >= 5)
        .count()
    }

    spark.stop()
  }
}
