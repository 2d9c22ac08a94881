package graft

import org.apache.spark.sql.functions._
import graft.sources.NdjsonIngest
import graft.lang.Planner

/** Decline-not-crash on UNDECODABLE histogram tokens: a stale/aliased
  * `_stats` sidecar can carry a `g:` block whose tokens don't parse as
  * the doubles a ranged/grouped column expects. Every metadata reader
  * that consumes histogram tokens under a range test must DECLINE to
  * the fallback scan (correct answer, one extra scan) — never throw
  * NumberFormatException out of plan construction, and never silently
  * treat the token as failing (an undercount would be a wrong answer).
  * Covers the three historical raw-`toDouble` sites: the or-group arm
  * test (armPassesToken), the one-column grouped count's entry test,
  * and the two-column GroupPred entry test.
  */
class ForgedSidecarSpec extends SparkSpec {

  private def tmpDir(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_forged")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)))
    s"$tmp/t"
  }

  /** A 3-layer append-only chain: id (pk), g (int 0..4 — complete
    * histogram), d (date, layer-constant — the two-column const side),
    * with EVERY layer's `g:<gcol>` histogram forged: one token replaced
    * by base64("bogus") so toDouble would throw. The gh: entry count
    * stays consistent, so the histogram still parses as complete.
    */
  private def forgedChain(): String = {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    (0 until 3).foreach { b =>
      val day = java.sql.Date.valueOf(f"2024-02-${b + 1}%02d")
      val df = (0 until 25).map(i =>
        ((b * 25 + i).toLong, i % 5, day)).toDF("id", "g", "d")
      if (b == 0) NdjsonIngest.appendVersion(df, dir, "id")
      else NdjsonIngest.appendDelta(df, dir, "id")
    }
    val bogus = java.util.Base64.getEncoder.encodeToString(
      "bogus".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    NdjsonIngest.latestLayers(dir).foreach { l =>
      val p = java.nio.file.Paths.get(dir, l, "_stats")
      var replaced = false
      val lines = java.nio.file.Files.readString(p).linesIterator.map {
        case line if line.startsWith("g:g ") && !replaced =>
          replaced = true
          val parts = line.split(" ")
          s"g:g $bogus ${parts(2)}"
        case line => line
      }.mkString("\n")
      assert(replaced, s"layer $l wrote no g-histogram to forge")
      java.nio.file.Files.writeString(p, lines)
    }
    dir
  }

  private def catalogOf(dir: String): Planner.Catalog =
    Planner.Catalog(
      tables = Map("t" -> NdjsonIngest.readLatest(spark, dir)),
      versionedDirs = Map("t" -> dir))

  test("grouped count under a range on the group column: the forged " +
      "token declines the histogram path to the scan, result correct") {
    val dir = forgedChain()
    val routed = Planner.plan(
      "t.filter(between(g, 1, 3)).groupBy({c := count()}, {g}).orderBy({g})",
      catalogOf(dir))
    // would have thrown NumberFormatException at plan time pre-fix
    val rows = routed.select("g", "c").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val expect = NdjsonIngest.readLatest(spark, dir)
      .filter(col("g").between(1, 3)).groupBy("g").count().orderBy("g")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows === expect)
    assert(rows.map(_._2).sum === 45L) // 3 groups × 15 rows
  }

  test("or-window count on the forged column: armPassesToken declines, " +
      "orGroupPassCount falls back, the counting scan answers") {
    val dir = forgedChain()
    val routed = Planner.plan(
      "t.filter(g = 1 || g = 3).groupBy({c := count()})", catalogOf(dir))
    assert(routed.select("c").collect().head.getLong(0) === 30L)
  }

  test("BARE grouped count (no conjunct parses the tokens): the Planner " +
      "token DECODE declines the histogram path to the scan instead of " +
      "throwing NumberFormatException") {
    val dir = forgedChain()
    // no range conjunct → entryPasses never parses the tokens, so the
    // bogus token first meets the decoder that types the group values
    val routed = Planner.plan(
      "t.groupBy({c := count()}, {g}).orderBy({g})", catalogOf(dir))
    val rows = routed.select("g", "c").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows === (0 until 5).map(g => (g, 15L)))
  }

  test("approxGroupCount on the forged column: the bracket decode " +
      "declines to the exact grouping pass, brackets stay exact") {
    val dir = forgedChain()
    val routed = Planner.plan(
      "t.approxGroupCount(g).orderBy({g})", catalogOf(dir))
    val rows = routed.select("g", "lo", "hi").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === (0 until 5).map(g => (g, 15L, 15L)))
  }

  test("a PARSEABLE but non-integral forged token ('2.5' under an int " +
      "group column) declines like an unparseable one — truncating " +
      "would emit forged counts under a wrapped group value") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    (0 until 3).foreach { b =>
      val df = (0 until 25).map(i =>
        ((b * 25 + i).toLong, i % 5)).toDF("id", "g")
      if (b == 0) NdjsonIngest.appendVersion(df, dir, "id")
      else NdjsonIngest.appendDelta(df, dir, "id")
    }
    val frac = java.util.Base64.getEncoder.encodeToString(
      "2.5".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    NdjsonIngest.latestLayers(dir).foreach { l =>
      val p = java.nio.file.Paths.get(dir, l, "_stats")
      var replaced = false
      val lines = java.nio.file.Files.readString(p).linesIterator.map {
        case line if line.startsWith("g:g ") && !replaced =>
          replaced = true
          s"g:g $frac ${line.split(" ")(2)}"
        case line => line
      }.mkString("\n")
      assert(replaced)
      java.nio.file.Files.writeString(p, lines)
    }
    val routed = Planner.plan(
      "t.groupBy({c := count()}, {g}).orderBy({g})", catalogOf(dir))
    val rows = routed.select("g", "c").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // truncation would have folded the forged 2.5-token count into
    // group 2; the decline path re-groups from the scan instead
    assert(rows === (0 until 5).map(g => (g, 15L)))
  }

  test("two-column grouped count: GroupPred.entryPasses declines on the " +
      "forged token, the grouping scan answers") {
    val dir = forgedChain()
    val routed = Planner.plan(
      "t.filter(between(g, 0, 2)).groupBy({c := count()}, {g, d})",
      catalogOf(dir))
    val got = routed.select("g", "d", "c").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString, r.getLong(2))).toSet
    val expect = NdjsonIngest.readLatest(spark, dir)
      .filter(col("g").between(0, 2)).groupBy("g", "d").count()
      .collect()
      .map(r => (r.getInt(0), r.getDate(1).toString, r.getLong(2))).toSet
    assert(got === expect)
  }
}
