package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{IncrementalAgg, NdjsonIngest}

/** Incremental aggregate maintenance over delta-layer chains: serve ==
  * direct group-by, appends summarize only the new layer, compaction
  * re-keys, gc reclaims dead partials.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, Double)*): DataFrame =
    rows.toDF("id", "k", "x")

  private def direct(tableDir: String): Map[String, (Long, BigDecimal)] =
    NdjsonIngest.readLatest(spark, tableDir)
      .groupBy("k")
      .agg(count(lit(1)).cast("bigint").as("cnt"),
        sum(col("x").cast("decimal(28,2)")).as("sum_x"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap

  private def served(tableDir: String): Map[String, (Long, BigDecimal)] =
    IncrementalAgg.serve(spark, tableDir, "by_k", Seq("k"), Seq("x"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap

  test("merge of per-layer partials equals the direct group-by; appends summarize O(batch)") {
    val root = java.nio.file.Files.createTempDirectory("incagg").toFile
    val dir = s"$root/table"
    NdjsonIngest.appendDelta(batch(("a", "k1", 1.5), ("b", "k2", 2.0)), dir, "id")
    NdjsonIngest.appendDelta(batch(("c", "k1", 3.0)), dir, "id")
    NdjsonIngest.appendDelta(batch(("d", "k3", 4.25), ("e", "k1", 0.25)), dir, "id")
    assert(served(dir) === direct(dir))
    val aggRoot = new java.io.File(s"$dir/_agg/by_k")
    assert(aggRoot.list().count(!_.startsWith(".")) === 3)

    // a fourth batch: ONLY the new layer is summarized — existing
    // partials are untouched (checked by mtime), so commit-time
    // maintenance cost is O(batch), not O(table)
    val before = aggRoot.listFiles().map(f => f.getName -> f.lastModified()).toMap
    NdjsonIngest.appendDelta(batch(("f", "k2", 10.0)), dir, "id")
    val fresh = IncrementalAgg.maintain(spark, dir, "by_k", Seq("k"), Seq("x"))
    assert(fresh.length === 1)
    before.foreach { case (name, mtime) =>
      assert(new java.io.File(aggRoot, name).lastModified() === mtime,
        s"partial $name was rewritten")
    }
    assert(served(dir) === direct(dir))

    // maintain is idempotent: nothing left to summarize
    assert(IncrementalAgg.maintain(spark, dir, "by_k", Seq("k"), Seq("x")).isEmpty)
  }

  test("incremental count-distinct: sketch-of-partials == sketch-of-table") {
    val root = java.nio.file.Files.createTempDirectory("incagg").toFile
    val dir = s"$root/table"
    // users recur ACROSS layers, so per-layer counts cannot just add up —
    // only the sketch union gets this right
    NdjsonIngest.appendDelta(
      Seq(("a", "k1", "u1"), ("b", "k1", "u2"), ("c", "k2", "u1"))
        .toDF("id", "k", "u"), dir, "id")
    NdjsonIngest.appendDelta(
      Seq(("d", "k1", "u1"), ("e", "k1", "u3"), ("f", "k2", "u9"))
        .toDF("id", "k", "u"), dir, "id")
    NdjsonIngest.appendDelta(
      Seq(("g", "k1", "u2"), ("h", "k2", "u9")).toDF("id", "k", "u"), dir, "id")
    val servedD = IncrementalAgg
      .serve(spark, dir, "du", Seq("k"), Nil, distinctCols = Seq("u"))
      .select("k", "approx_distinct_u")
      .as[(String, Long)].collect().toMap
    // HLL union is per-register max ⇒ merged-partials estimate is
    // IDENTICAL to a single sketch over the whole table...
    val directSketch = NdjsonIngest.readLatest(spark, dir)
      .groupBy("k")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("d"))
      .as[(String, Long)].collect().toMap
    assert(servedD === directSketch)
    // ...and at this cardinality the sketch is exact
    assert(servedD === Map("k1" -> 3L, "k2" -> 2L))
    // appending a layer maintains only that layer's sketch partial
    NdjsonIngest.appendDelta(
      Seq(("i", "k1", "u4")).toDF("id", "k", "u"), dir, "id")
    assert(IncrementalAgg.maintain(spark, dir, "du", Seq("k"), Nil,
      distinctCols = Seq("u")).length === 1)
    assert(IncrementalAgg
      .serve(spark, dir, "du", Seq("k"), Nil, distinctCols = Seq("u"))
      .filter(col("k") === "k1").select("approx_distinct_u")
      .as[Long].head() === 4L)
  }

  test("compaction re-keys partials; gc reclaims the dead ones") {
    val root = java.nio.file.Files.createTempDirectory("incagg2").toFile
    val dir = s"$root/table"
    (0 until 5).foreach(i =>
      NdjsonIngest.appendDelta(batch((s"id$i", s"k${i % 2}", i.toDouble)), dir, "id"))
    assert(served(dir) === direct(dir))
    assert(NdjsonIngest.compactVersions(spark, dir, maxLayers = 2))
    // the compacted chain's layer gets its own partial on first serve
    assert(served(dir) === direct(dir))
    // old layer dirs die in gc; their partials follow
    NdjsonIngest.gcVersions(dir)
    val dead = IncrementalAgg.gc(dir, "by_k")
    assert(dead.nonEmpty)
    assert(served(dir) === direct(dir))
  }

  test("partials over an evolved chain: layers from before the add-column still serve") {
    val root = java.nio.file.Files.createTempDirectory("incagg").toFile
    val dir = s"$root/table"
    NdjsonIngest.appendDelta(batch(("a", "k1", 1.5), ("b", "k2", 2.0)), dir, "id")
    // additive evolution: later batches carry a new `quality` column the
    // first layer has never heard of
    NdjsonIngest.appendDeltaEvolve(
      Seq(("c", "k1", 3.0, 10.0), ("d", "k2", 4.0, 2.5))
        .toDF("id", "k", "x", "quality"), dir, "id")
    // an aggregate over the NEW column (its own spec name): pre-evolution
    // layers read under the head schema, contribute null→0, and the
    // merged result equals the direct aggregate over the evolved table
    val servedQ = IncrementalAgg
      .serve(spark, dir, "by_k_q", Seq("k"), Seq("quality"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.getDecimal(2)))))
      .toMap
    val directQ = NdjsonIngest.readLatest(spark, dir)
      .groupBy("k")
      .agg(count(lit(1)).cast("bigint").as("cnt"),
        sum(col("quality").cast("decimal(28,2)")).as("sum_quality"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.getDecimal(2)))))
      .toMap
    assert(servedQ === directQ)
    assert(servedQ("k1")._2.map(BigDecimal(_)) === Some(BigDecimal("10.00")))
  }
}
