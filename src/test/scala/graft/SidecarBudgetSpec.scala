package graft

import org.apache.spark.sql.functions._
import graft.sources.NdjsonIngest
import graft.lang.Planner

/** The per-layer histogram byte budget: a wide table (hundreds of
  * columns under the per-column cap) must not write multi-MB `_stats`
  * sidecars that every plan over the chain parses — past the budget the
  * WIDEST histograms drop first, keeping the narrow group keys that
  * grouped counts actually consult. Dropping is only ever a fallback to
  * the grouping scan, never a wrong answer.
  */
class SidecarBudgetSpec extends SparkSpec {

  test("wide histograms drop past the byte budget, narrow ones survive, " +
      "and dropped columns still group-count correctly via the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_budget")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)))
    val dir = s"$tmp/t"
    // 1000 rows; 16 wide int columns with ~1000 distinct values each
    // (under the per-column cap, ~23 KB of histogram lines per column —
    // ~370 KB total, past the 256 KB budget) plus one narrow category
    val wide = (0 until 16).map(j => s"w$j")
    val df = wide.zipWithIndex.foldLeft(
      spark.range(1000).select(col("id"),
        (col("id") % 3).cast("int").as("cat"))) { case (d, (c, j)) =>
      d.withColumn(c, ((col("id") * 17 + j) % 1000).cast("int"))
    }
    NdjsonIngest.appendVersion(df, dir, "id")
    val layer = NdjsonIngest.latestLayers(dir).head
    val stats = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, layer, "_stats"))
    val histCols = stats.linesIterator.filter(_.startsWith("gh:"))
      .map(_.split(" ").head.stripPrefix("gh:")).toSeq
    assert(histCols.contains("cat"),
      "the narrow category histogram must survive the budget")
    val droppedWide = wide.filterNot(histCols.contains)
    assert(droppedWide.nonEmpty,
      s"some wide histograms must drop past the budget (kept: $histCols)")
    val histBytes = stats.linesIterator.filter(l =>
      l.startsWith("gh:") || l.startsWith("g:")).map(_.length + 1L).sum
    assert(histBytes <= NdjsonIngest.HistogramBudgetBytes,
      s"histogram lines must fit the budget: $histBytes")
    // envelopes/ledgers are never dropped — zone pruning keeps working
    // on every column, wide ones included
    assert(wide.forall(c => stats.linesIterator.exists(_.startsWith(s"$c "))))
    // the kept narrow histogram still answers zero-footer; a dropped
    // wide column falls back to the scan and stays correct
    val catalog = Planner.Catalog(
      tables = Map("t" -> NdjsonIngest.readLatest(spark, dir)),
      versionedDirs = Map("t" -> dir))
    val onCat = Planner.plan("t.groupBy({n := count()}, {cat})", catalog)
    assert(onCat.inputFiles.isEmpty,
      "the surviving histogram must keep the metadata grouped count")
    assert(onCat.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      Map(0 -> 334L, 1 -> 333L, 2 -> 333L))
    val dcol = droppedWide.head
    val onDropped = Planner.plan(s"t.groupBy({n := count()}, {$dcol})",
      catalog)
    assert(onDropped.inputFiles.nonEmpty,
      "a dropped histogram must fall back to the grouping scan")
    assert(onDropped.collect().length ===
      df.select(dcol).distinct().count())
  }
}
