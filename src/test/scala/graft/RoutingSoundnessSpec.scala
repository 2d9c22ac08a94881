package graft

import org.apache.spark.sql.functions._
import graft.sources.NdjsonIngest
import graft.lang.Planner
import graft.lang.Planner.QueryError

/** Routing-soundness regressions caught by adversarial review — each a
  * well-formed query over healthy data where a routed plan used to
  * diverge from the unrouted one (or silently wrap instead of erroring):
  *  - `between(c, null, null)` compiles row-wise to a vacuous TRUE
  *    (NULL rows pass), so it must NOT derive a null-REJECTING zone
  *    range — pre-fix the routed count read the non-null ledger and an
  *    all-null layer was zone-excluded from the scan;
  *  - `limit`/`offset` counts past Int.MaxValue used to silently
  *    `.toInt`-wrap (limit(2^32) → limit(0) → empty result) instead of
  *    the reference's uint32 typed error (ast_to_query.cpp
  *    extractUnsigned).
  */
class RoutingSoundnessSpec extends SparkSpec {

  private def tmpDir(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_routing")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)))
    s"$tmp/t"
  }

  private def catalogOf(dir: String): Planner.Catalog =
    Planner.Catalog(
      tables = Map("t" -> NdjsonIngest.readLatest(spark, dir)),
      versionedDirs = Map("t" -> dir))

  test("between(c, null, null) is vacuously TRUE row-wise (nulls pass) " +
      "— the routed count and scan must keep null rows and all-null " +
      "layers") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    // layer v1: 3 non-null + 2 null scores; layer v2: ALL-null scores
    // (its `c:` ledger records zero non-nulls — pre-fix zoneKeep
    // excluded it from the routed scan outright)
    NdjsonIngest.appendVersion(
      Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(30L)),
        (4L, None), (5L, None)).toDF("id", "score"), dir, "id")
    NdjsonIngest.appendDelta(
      Seq((6L, None: Option[Long]), (7L, None: Option[Long]))
        .toDF("id", "score"), dir, "id")
    val catalog = catalogOf(dir)
    // the metadata count path: 7 rows, not the 3 the non-null ledger
    // would answer
    val cnt = Planner.plan(
      "t.filter(between(score, null, null)).groupBy({c := count()})",
      catalog)
    assert(cnt.collect()(0).getLong(0) === 7L,
      "a vacuous between must count NULL rows too")
    // the scan path: every row survives, the all-null layer included
    val rows = Planner.plan(
      "t.filter(between(score, null, null)).project({id})", catalog)
    assert(rows.collect().map(_.getLong(0)).sorted.toSeq ===
      (1L to 7L).toSeq)
    // one-sided null bounds stay null-REJECTING (c >= lo drops nulls) —
    // the fix must not loosen them
    val oneSided = Planner.plan(
      "t.filter(between(score, 10, null)).groupBy({c := count()})",
      catalog)
    assert(oneSided.collect()(0).getLong(0) === 3L)
  }

  test("wide-decimal conjuncts decline the metadata proofs: a " +
      "decimal(38,18) value just under 5 records an envelope of exactly " +
      "5.0, and the containment pass proof must not count it for d = 5") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    // 4.999999999999999999 (18 nines) is exact in decimal(38,18) but
    // rounds to exactly 5.0 as a double — min == max == 5.0 in the
    // sidecar, indistinguishable from a true constant-5 layer to the
    // value-based exactness gates
    val df = Seq(
      (1L, new java.math.BigDecimal("4.999999999999999999")),
      (2L, new java.math.BigDecimal("3.500000000000000000")))
      .toDF("id", "d")
    NdjsonIngest.appendVersion(df, dir, "id")
    val catalog = catalogOf(dir)
    // row-wise: exact decimal comparison → 0 rows; the pre-fix routed
    // metadata count answered 1 from the rounded envelope containment
    val cnt = Planner.plan(
      "t.filter(between(d, 5, 5)).groupBy({c := count()})", catalog)
    assert(cnt.collect()(0).getLong(0) === 0L,
      "the rounded decimal envelope must not feed an exact pass proof")
    val eq = Planner.plan("t.filter(d = 5).project({id})", catalog)
    assert(eq.collect().isEmpty)
    // and the row a double-space probe CAN express still answers
    val half = Planner.plan(
      "t.filter(between(d, 3, 4)).project({id})", catalog)
    assert(half.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("limit/offset counts past Int.MaxValue raise the uint32 typed " +
      "error instead of silently wrapping to 0") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    NdjsonIngest.appendVersion(
      (1L to 5L).map(i => (i, i * 10)).toDF("id", "v"), dir, "id")
    val catalog = catalogOf(dir)
    // 2^32 .toInt-wraps to 0: limit used to return an EMPTY result
    val eLimit = intercept[QueryError] {
      Planner.plan("t.limit(4294967296)", catalog)
    }
    assert(eLimit.getMessage.contains("uint32"))
    // offset(2^32) used to wrap to offset(0), a silent no-op
    val eOffset = intercept[QueryError] {
      Planner.plan("t.orderBy({id}).offset(4294967296).limit(2)", catalog)
    }
    assert(eOffset.getMessage.contains("uint32"))
    // in-range still works
    assert(Planner.plan("t.orderBy({id}).offset(1).limit(2)", catalog)
      .collect().length === 2)
  }
}
