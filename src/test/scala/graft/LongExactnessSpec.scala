package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.NdjsonIngest
import graft.lang.Planner

/** The ±2^53 double-collapse family: every sidecar stat and range
  * literal travels as a Double, so LONG values past ±2^53 can collapse
  * (two distinct longs → one double). The metadata EXACT proofs —
  * histogram tokens, constant-column detection, containment pass
  * counts — must decline at or past the window edge; zone NARROWING
  * stays sound under rounding (monotone). Reference bar: the
  * reference's per-value bitmaps are exact at any width
  * (lineage_index.h, string_in_set.cpp) — our metadata paths must be
  * too, or decline. Boundary values per the round-15 verdict:
  * 2^53−1, 2^53, 2^53+1, 2^60, 2^60+1.
  */
class LongExactnessSpec extends SparkSpec {
  private val P53 = 1L << 53
  private val P60 = 1L << 60

  /** Build a fresh chain of (id, big, cat) layers — one layer per
    * batch; `id` is the pk, `big` carries the boundary longs.
    */
  private def chainOf(batches: Seq[(Long, Long, String)]*): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_longx")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)))
    val dir = s"$tmp/t"
    val session = spark
    import session.implicits._
    batches.zipWithIndex.foreach { case (batch, i) =>
      val df = batch.toDF("id", "big", "cat")
      if (i == 0) NdjsonIngest.appendVersion(df, dir, "id")
      else NdjsonIngest.appendDelta(df, dir, "id")
    }
    dir
  }

  private def planOn(dir: String, q: String): DataFrame = {
    val catalog = Planner.Catalog(
      tables = Map("t" -> NdjsonIngest.readLatest(spark, dir)),
      versionedDirs = Map("t" -> dir))
    Planner.plan(q, catalog)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("grouped count on a layer straddling 2^53 falls back to the scan " +
      "and keeps both groups distinct (histogram write guard is strict)") {
    // {2^53, 2^53+1} both round to 2^53: the envelope touches the edge,
    // so the histogram must be suppressed — a collapsed one would merge
    // the two groups and misreport the group value
    val dir = chainOf(
      Seq((1L, P53, "a"), (2L, P53 + 1, "a")),
      Seq((3L, 7L, "b"), (4L, 8L, "b")))
    val routed = planOn(dir, "t.groupBy({c := count()}, {big})")
    val unrouted = NdjsonIngest.readLatest(spark, dir)
      .groupBy("big").agg(count(lit(1)).as("c"))
    assert(routed.inputFiles.nonEmpty,
      "a boundary layer must NOT answer from metadata")
    assert(sortedRows(routed) == sortedRows(unrouted))
    assert(routed.collect().length == 4, "2^53 and 2^53+1 stay distinct")
  }

  test("grouped count strictly inside the window still answers from " +
      "metadata alone (no over-suppression)") {
    val dir = chainOf(
      Seq((1L, P53 - 1, "a"), (2L, P53 - 2, "a")),
      Seq((3L, 7L, "b"), (4L, 7L, "b")))
    val routed = planOn(dir, "t.groupBy({c := count()}, {big})")
    assert(routed.inputFiles.isEmpty,
      "safe long values must keep the zero-footer grouped count")
    val unrouted = NdjsonIngest.readLatest(spark, dir)
      .groupBy("big").agg(count(lit(1)).as("c"))
    assert(sortedRows(routed) == sortedRows(unrouted))
  }

  test("two-column rollup declines a collapsed long 'constant' " +
      "(constToken exactness gate)") {
    // {2^60, 2^60+1} collapse to one double: envelope lo==hi with a full
    // non-null ledger would have 'proven' big layer-constant and merged
    // two true groups into ((a, 2^60) -> 2)
    val dir = chainOf(
      Seq((1L, P60, "a"), (2L, P60 + 1, "a")),
      Seq((3L, 5L, "b"), (4L, 5L, "b")))
    val routed = planOn(dir, "t.groupBy({c := count()}, {cat, big})")
    val unrouted = NdjsonIngest.readLatest(spark, dir)
      .groupBy("cat", "big").agg(count(lit(1)).as("c"))
    assert(sortedRows(routed) == sortedRows(unrouted))
    assert(routed.collect().length == 3,
      "(a,2^60), (a,2^60+1), (b,5) — the collapsed constant must not merge")
  }

  test("filtered count declines a rounded long literal bound " +
      "(containment exactness gate)") {
    // literal 2^60+1 rounds to 2^60; the layer envelope [2^60, 2^60]
    // would read as contained in [2^60, +inf) and overcount 2 instead
    // of the true 1
    val dir = chainOf(Seq((1L, P60, "a"), (2L, P60 + 1, "a")))
    val routed = planOn(dir,
      s"t.filter(between(big, ${P60 + 1}, null)).groupBy({c := count()})")
    assert(routed.collect()(0).getLong(0) == 1L,
      "only 2^60+1 truly passes big >= 2^60+1")
  }

  test("filtered count at the 2^53 boundary is exact both ways") {
    val dir = chainOf(
      Seq((1L, P53, "a"), (2L, P53 + 1, "a")),
      Seq((3L, P53 - 1, "b")))
    // >= 2^53+1: true pass = 1 (the 2^53 row fails; rounding would have
    // proven the whole first layer contained)
    assert(planOn(dir,
      s"t.filter(between(big, ${P53 + 1}, null)).groupBy({c := count()})")
      .collect()(0).getLong(0) == 1L)
    // <= 2^53: true pass = 2 (2^53 itself and 2^53-1)
    assert(planOn(dir,
      s"t.filter(between(big, null, $P53)).groupBy({c := count()})")
      .collect()(0).getLong(0) == 2L)
    // a fully-safe window still answers exactly
    assert(planOn(dir,
      s"t.filter(between(big, null, ${P53 - 1})).groupBy({c := count()})")
      .collect()(0).getLong(0) == 1L)
  }

  test("top-k with a boundary filter routes the same rows as the " +
      "unrouted plan (failUB exactness)") {
    val dir = chainOf(
      Seq((1L, P60, "x"), (2L, P60 + 1, "x")),
      Seq((3L, 10L, "y"), (4L, 20L, "y")),
      Seq((5L, P53, "z"), (6L, P53 + 1, "z")))
    val q = s"t.filter(between(big, ${P53 + 1}, null))" +
      ".orderBy({big}).limit(2).project({id, big})"
    val routed = planOn(dir, q)
    val unrouted = NdjsonIngest.readLatest(spark, dir)
      .filter(col("big") >= (P53 + 1))
      .orderBy(col("big")).limit(2).select("id", "big")
    assert(sortedRows(routed) == sortedRows(unrouted))
  }

  test("or-group windows over boundary longs stay routed≡unrouted") {
    val dir = chainOf(
      Seq((1L, P60, "x"), (2L, P60 + 1, "x")),
      Seq((3L, 10L, "y"), (4L, 20L, "y")))
    val q = s"t.filter(between(big, null, 15) || " +
      s"between(big, ${P60 + 1}, null)).groupBy({c := count()})"
    val routed = planOn(dir, q)
    val unrouted = NdjsonIngest.readLatest(spark, dir)
      .filter(col("big") <= 15L || col("big") >= (P60 + 1))
      .agg(count(lit(1)).as("c"))
    assert(sortedRows(routed) == sortedRows(unrouted))
    assert(routed.collect()(0).getLong(0) == 2L,
      "10 and 2^60+1 pass; 20 and 2^60 fail")
  }

  test("randomized boundary property: grouped/filtered counts and top-k " +
      "agree with the unrouted plan across boundary-heavy layer mixes") {
    val pool = Seq(P53 - 1, P53, P53 + 1, P60, P60 + 1, 3L, 12L, 47L,
      -(P53 - 1), -P53, -(P53 + 1), -P60, -(P60 + 1), -5L)
    val rnd = new scala.util.Random(4242)
    (1 to 4).foreach { _ =>
      var id = 0L
      val batches = (1 to (2 + rnd.nextInt(3))).map { bi =>
        (1 to (1 + rnd.nextInt(4))).map { _ =>
          id += 1
          (id, pool(rnd.nextInt(pool.length)), s"c${bi % 2}")
        }
      }
      val dir = chainOf(batches: _*)
      val flat = NdjsonIngest.readLatest(spark, dir)
      // grouped count
      assert(sortedRows(planOn(dir, "t.groupBy({c := count()}, {big})")) ==
        sortedRows(flat.groupBy("big").agg(count(lit(1)).as("c"))))
      // filtered counts across boundary literals
      Seq(P53, P53 + 1, P60, P60 + 1, 10L).foreach { lo =>
        assert(planOn(dir,
          s"t.filter(between(big, $lo, null)).groupBy({c := count()})")
          .collect()(0).getLong(0) ==
          flat.filter(col("big") >= lo).count(), s"count for lo=$lo")
      }
      // top-k
      assert(sortedRows(planOn(dir,
          "t.orderBy({desc(big), id}).limit(3).project({id, big})")) ==
        sortedRows(flat.orderBy(col("big").desc, col("id"))
          .limit(3).select("id", "big")))
    }
  }
}
