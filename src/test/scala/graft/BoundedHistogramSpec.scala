package graft

import org.apache.spark.sql.functions._
import graft.functions.BoundedHistogram.boundedHist

/** The size-capped histogram aggregate feeding the per-layer `g:` value
  * sidecars: exact under the cap, NULL past it, bounded memory either
  * way, and partials that survive serialize→merge round trips.
  */
class BoundedHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("exact map under the cap; nulls skipped; empty input → empty map") {
    val df = Seq(Some("a"), Some("b"), Some("a"), None, Some("a"))
      .toDF("s").repartition(4) // force partial merges across partitions
    val m = df.agg(boundedHist(col("s"), 16).as("h"))
      .collect()(0).getAs[Map[String, Long]]("h")
    assert(m === Map("a" -> 3L, "b" -> 1L))
    val empty = Seq.empty[String].toDF("s")
      .agg(boundedHist(col("s"), 16).as("h"))
      .collect()(0).getAs[Map[String, Long]]("h")
    assert(empty === Map.empty[String, Long])
    // all-null column: empty map, NOT null (cardinality 0, knowable)
    val allNull = Seq(Option.empty[String], None).toDF("s")
      .agg(boundedHist(col("s"), 4).as("h"))
      .collect()(0).getAs[Map[String, Long]]("h")
    assert(allNull === Map.empty[String, Long])
  }

  test("poisons to NULL past the cap — including across partial merges") {
    val df = (1 to 100).map(i => s"v$i").toDF("s").repartition(8)
    val r = df.agg(boundedHist(col("s"), 16).as("h")).collect()(0)
    assert(r.isNullAt(0), "over-cap histogram must be null")
    // exactly at the cap stays exact
    val atCap = (1 to 16).flatMap(i => Seq(s"v$i", s"v$i")).toDF("s")
      .repartition(8).agg(boundedHist(col("s"), 16).as("h"))
      .collect()(0).getAs[Map[String, Long]]("h")
    assert(atCap.size === 16)
    assert(atCap.values.forall(_ === 2L))
  }

  test("grouped usage: one bounded histogram per group") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "s").repartition(4)
    val rows = df.groupBy("g").agg(boundedHist(col("s"), 8).as("h"))
      .collect().map(r => r.getString(0) ->
        r.getAs[Map[String, Long]]("h")).toMap
    assert(rows("g1") === Map("x" -> 2L, "y" -> 1L))
    assert(rows("g2") === Map("z" -> 1L))
  }
}
