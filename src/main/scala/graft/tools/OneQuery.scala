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
    val fn = graft.SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    val t0 = System.nanoTime()
    val n0 = fn(spark, sfDir).count()
    val warm = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n1 = fn(spark, sfDir).count()
    val hot = (System.nanoTime() - t1) / 1e9
    println(f"ONEQUERY $name rows=$n0%d warm=$warm%.3fs hot=$hot%.3fs (rows2=$n1%d)")
    spark.stop()
  }
}
