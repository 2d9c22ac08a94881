package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: time a single SparkEntry query (warm + timed run) and print
  * its formatted plan. `runMain graft.tools.OneQuery <name> <sfDir>
  * [--explain]`.
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explain = args.contains("--explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // default 3 reps: with 2, the min is a single post-JIT sample and
    // first-rep codegen noise still skews quick eyeball comparisons
    val reps = args.find(_.startsWith("--n=")).map(_.drop(4).toInt).getOrElse(3)
    val fn = graft.SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    var rows = 0L
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      rows = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // same block cleanup the bench does between queries (OUTSIDE the
      // timed window, like Bench), so repeated runs don't accumulate
      // checkpointed blocks the single bench run wouldn't
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    val ts = times.map(t => f"$t%.3f").mkString(",")
    println(f"ONEQUERY $name rows=$rows%d min=${times.min}%.3fs times=[$ts]")
    spark.stop()
  }
}
