package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance over a versioned table's delta-layer
  * chain ([[NdjsonIngest.appendDelta]]): each layer is summarized ONCE
  * into a per-layer partial (count + per-column sums, grouped by the key
  * columns), and a group-by over the whole table is served by merging the
  * partials — decomposable-aggregate algebra, so committing a batch costs
  * O(batch) re-aggregation and serving never rescans old layers.
  *
  * This is the aggregate-side twin of the layered posting index
  * (Planner.SeqIndex append) and of the reference's chunk-wise index
  * extension on appendData (reference: storage/table.cpp bulkInsert →
  * sequence_column.h:147-163): derived state extends with the new chunk
  * instead of rebuilding. At 100 TB a daily-append table's rollup
  * dashboard reads a few thousand partial rows instead of the table.
  *
  * Layout: `tableDir/_agg/<name>/<layer>` (parquet). Partials are named
  * by the layer dir they summarize, so compaction re-keys for free: the
  * compacted chain's new layer just gets its own partial on first serve,
  * and [[gc]] drops partials whose layer dir no longer exists.
  *
  * Partial schema: keyCols ++ `__cnt` ++ `__sum_<c>` for each sumCol
  * (sums over DECIMAL(28,2) — exact, order-independent merges) ++
  * `__hll_<c>` for each distinctCol: a Datasketches HLL sketch binary.
  * COUNT DISTINCT is not decomposable exactly, but its SKETCH is — HLL
  * union is a per-register max, associative and commutative — so
  * estimate(union of per-layer sketches) is IDENTICAL (not just close)
  * to the estimate of one sketch over the whole table. A fixed-size
  * mergeable sketch per (group, layer) buys incremental distinct users /
  * distinct tokens at O(batch) maintenance — the canonical lakehouse
  * pattern for count-distinct dashboards over append-only data.
  *
  * The `name` identifies the column spec: changing keyCols/sumCols/
  * distinctCols requires a new name (old partials lack the new columns).
  */
object IncrementalAgg {

  private def aggDir(tableDir: String, name: String) = s"$tableDir/_agg/$name"

  private def partial(df: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
      distinctCols: Seq[String]): DataFrame = {
    val aggs = (count(lit(1)).as("__cnt") +:
      sumCols.map(c => sum(col(c).cast("decimal(28,2)")).as(s"__sum_$c"))) ++
      distinctCols.map(c => hll_sketch_agg(col(c)).as(s"__hll_$c"))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Summarize every chain layer that has no partial yet; returns the
    * layers summarized this call. Idempotent; a crashed write leaves only
    * a temp dir (the rename into place is the commit point).
    */
  def maintain(spark: SparkSession, tableDir: String, name: String,
      keyCols: Seq[String], sumCols: Seq[String],
      distinctCols: Seq[String] = Nil): Seq[String] = {
    val dir = new java.io.File(aggDir(tableDir, name))
    dir.mkdirs()
    NdjsonIngest.latestLayers(tableDir).filterNot(l =>
      new java.io.File(dir, l).exists()).map { layer =>
      val tmp = new java.io.File(dir, s".tmp_$layer")
      if (tmp.exists()) { // leftover from a crashed write
        tmp.listFiles().foreach(_.delete()); tmp.delete()
      }
      // read the layer under the table's HEAD schema (NdjsonIngest
      // additive evolution): a column added after this layer was
      // committed surfaces as null, so its partial contributes 0 to the
      // new column's sum / no keys — exactly what a direct aggregate
      // over the evolved table computes for those rows
      partial(NdjsonIngest.readChain(spark, tableDir, Seq(layer), None),
          keyCols, sumCols, distinctCols)
        .coalesce(1)
        .write.parquet(tmp.toString)
      java.nio.file.Files.move(tmp.toPath, new java.io.File(dir, layer).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      layer
    }
  }

  /** The group-by served from partials: maintains missing partials first,
    * then merges ONLY the partials of the currently committed chain —
    * `cnt` plus `sum_<c>` per requested sum column. Merge-of-partials and
    * direct-over-table are equal by decomposability (count = Σ partial
    * counts, sum = Σ partial sums, exact DECIMAL).
    */
  def serve(spark: SparkSession, tableDir: String, name: String,
      keyCols: Seq[String], sumCols: Seq[String],
      distinctCols: Seq[String] = Nil): DataFrame = {
    maintain(spark, tableDir, name, keyCols, sumCols, distinctCols)
    val paths = NdjsonIngest.latestLayers(tableDir)
      .map(l => s"${aggDir(tableDir, name)}/$l")
    val merged = spark.read.parquet(paths: _*)
    val aggs = (sum(col("__cnt")).cast("bigint").as("cnt") +:
      sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c"))) ++
      distinctCols.map(c =>
        hll_sketch_estimate(hll_union_agg(col(s"__hll_$c")))
          .as(s"approx_distinct_$c"))
    merged.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Drop partials whose layer dir is gone (post-compaction + gc). */
  def gc(tableDir: String, name: String): Seq[String] = {
    val dir = new java.io.File(aggDir(tableDir, name))
    Option(dir.listFiles()).getOrElse(Array()).toSeq
      .filter(f => !f.getName.startsWith(".") &&
        !new java.io.File(tableDir, f.getName).exists())
      .map { f =>
        f.listFiles().foreach(_.delete()); f.delete(); f.getName
      }
  }
}
