package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.seq.{SeqPredicates, SequenceModel}

/** Dev-only phase probe for the seq-query pipeline: normText derivation,
  * diff kernel, profile distance — each timed min-of-5 in one JVM.
  */
object SeqProbe {
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
    val REF = graft.queries.SeqQueries.REF
    def seqCol = substring(
      regexp_replace(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ", ""), 1, 60)
    def base() = Tables.load(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), seqCol.as("seq"))
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }

    time("norm_only") { noop(base()) }
    time("diff_kernel") { noop(SequenceModel.diff(base(), "seq", REF)) }
    time("diff_plus_dist") {
      noop(SequenceModel.diff(base(), "seq", REF)
        .withColumn("dist",
          SeqPredicates.profileDistance(graft.queries.SeqQueries.PROFILE, REF)
            .cast("int")))
    }
    time("norm_norepart") {
      noop(Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), seqCol.as("seq")))
    }
    time("diff_norepart") {
      noop(SequenceModel.diff(
        Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), seqCol.as("seq")), "seq", REF))
    }
    spark.stop()
  }
}
