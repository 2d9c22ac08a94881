package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible audit behind the HistogramMaxEntries default (run with
  * `-Dgraft.histogramMaxEntries=N` to measure a candidate cap):
  * builds an L-layer chain whose `cat` column has ~`card` distinct
  * values per layer — just past the old 256 cap, the
  * country×day / fine-category shape — and reports, per cap:
  *  - ingest seconds (the histogram rides the one stats aggregation);
  *  - total `_stats` sidecar bytes across the chain;
  *  - whether a grouped count answers from metadata (zero footers) and
  *    its wall time — at a cap below the cardinality the histogram is
  *    absent and the same query pays a grouping scan instead;
  *  - plan time of an unrelated windowed filter over the same chain
  *    (every routed plan parses the full sidecars, so a bigger cap
  *    taxes ALL queries' plan time — this is the regression to watch).
  *
  * Round-15 numbers on this box (local[8], 10×20k rows, card 800):
  * cap 256 → 1 KB sidecars (no histogram fits), grouped count scans
  * (0.47 s), routed plan 0.061 s; cap 1024 → 325 KB sidecars, grouped
  * count from metadata (0.05 s), routed plan 0.077-0.086 s — the
  * ≤ 20 ms plan-time delta across a whole 10-layer chain is noise
  * against the 0.4 s scan the larger cap avoids.
  */
object HistogramCapAudit {
  def main(args: Array[String]): Unit = {
    val layers = args.headOption.map(_.toInt).getOrElse(10)
    val rowsPerLayer = args.lift(1).map(_.toInt).getOrElse(20000)
    val card = args.lift(2).map(_.toInt).getOrElse(800)
    // 4th arg = candidate cap: must land in the system property BEFORE
    // the first NdjsonIngest reference triggers its object init (sbt's
    // in-process run doesn't forward -D to a fresh JVM)
    args.lift(3).foreach(c => sys.props("graft.histogramMaxEntries") = c)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("histogram-cap-audit")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.NdjsonIngest
    val cap = NdjsonIngest.HistogramMaxEntries
    val dir = java.nio.file.Files.createTempDirectory("histaudit")
      .toString + "/t"
    val t0 = System.nanoTime()
    (0 until layers).foreach { li =>
      val df = spark.range(rowsPerLayer.toLong)
        .select((col("id") + li.toLong * rowsPerLayer).as("id"),
          concat(lit("cat"), (col("id") % card).cast("string")).as("cat"),
          (col("id") % 1000).cast("int").as("day"))
      if (li == 0) NdjsonIngest.appendVersion(df, dir, "id")
      else NdjsonIngest.appendDelta(df, dir, "id")
    }
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val chain = NdjsonIngest.latestLayers(dir)
    val statBytes = chain.map(l => java.nio.file.Files.size(
      java.nio.file.Paths.get(dir, l, "_stats"))).sum
    val g0 = System.nanoTime()
    val grouped = NdjsonIngest.chainGroupCount(dir, chain, "cat")
    val groupedMeta = grouped.isDefined
    // when metadata can't answer, time the scan it falls back to
    if (!groupedMeta)
      spark.read.parquet(chain.map(l => s"$dir/$l"): _*)
        .groupBy("cat").count().count()
    val groupSec = (System.nanoTime() - g0) / 1e9
    val p0 = System.nanoTime()
    // plan-only cost of an unrelated routed read: every zone lookup
    // parses the full sidecars
    NdjsonIngest.readChainRanges(spark, dir, chain,
      Seq(("id", 0.0, 100.0))).queryExecution.executedPlan
    val planSec = (System.nanoTime() - p0) / 1e9
    println(s"""{"cap":$cap,"layers":$layers,"rowsPerLayer":$rowsPerLayer,""" +
      s""""card":$card,"ingestSec":${f"$ingestSec%.3f"},""" +
      s""""statsBytes":$statBytes,"groupedFromMeta":$groupedMeta,""" +
      s""""groupSec":${f"$groupSec%.3f"},"planSec":${f"$planSec%.3f"}}""")
    spark.stop()
  }
}
