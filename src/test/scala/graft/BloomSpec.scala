package graft

import org.apache.spark.sql.functions._
import graft.sources.NdjsonIngest

/** The layer-level pk bloom (`bl:` sidecar line + BloomSketch): the
  * per-value point-lookup structure for keys whose DISTRIBUTION denies
  * the envelopes (random uuids span every layer) and whose CARDINALITY
  * denies the complete histograms (> cap distinct per layer) — the
  * reference bar is per-value StringInSet bitmaps answering point
  * predicates regardless of key distribution (string_in_set.cpp:64,
  * equals.cpp:143-148).
  */
class BloomSpec extends SparkSpec {

  private def tmpDir(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloom")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)))
    s"$tmp/t"
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** 5 layers × 1500 rows of md5-hex pks (uuid-shaped: random-looking,
    * > histogram cap per layer, every layer's lexicographic envelope
    * spans ~the whole key space).
    */
  private def uuidChain(): (String, Int => String) = {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    val key = (i: Int) => md5(s"key-$i")
    (0 until 5).foreach { b =>
      val df = (0 until 1500).map(i => (key(b * 1500 + i), b * 1500 + i))
        .toDF("pk", "n")
      if (b == 0) NdjsonIngest.appendVersion(df, dir, "pk")
      else NdjsonIngest.appendDelta(df, dir, "pk")
    }
    (dir, key)
  }

  test("string pk point lookup: the bl: line exists past the histogram " +
      "cap, a hit opens ~1 of 5 layers, a miss opens none — rows exact") {
    val (dir, key) = uuidChain()
    val chain = NdjsonIngest.latestLayers(dir)
    assert(chain.length === 5)
    chain.foreach { l =>
      val stats = java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, l, "_stats"))
      assert(stats.linesIterator.exists(_.startsWith("bl:pk ")),
        s"layer $l must carry a pk bloom line")
      assert(!stats.linesIterator.exists(_.startsWith("gh:pk ")),
        s"1500 distinct pks must poison the complete histogram in $l")
    }
    // a hit from the middle layer: only bloom-positive layers open
    val hit = key(2 * 1500 + 77)
    val routed = NdjsonIngest.readChainRanges(spark, dir, chain, Nil,
      strEquals = Seq(("pk", Seq(hit))))
    val layers = routed.inputFiles.map(_.split("/").takeRight(2).head)
      .distinct.toSeq
    assert(layers.contains(chain(2)) && layers.length <= 2,
      s"hit must prune to the holding layer (±1 false positive): $layers")
    assert(routed.filter(col("pk") === hit).count() === 1)
    // a miss: every layer's bloom excludes (allow ≤1 false positive);
    // the row-wise filter stays exact either way
    val missHits = (0 until 50).map { i =>
      val miss = md5(s"absent-$i")
      val df = NdjsonIngest.readChainRanges(spark, dir, chain, Nil,
        strEquals = Seq(("pk", Seq(miss))))
      assert(df.filter(col("pk") === miss).count() === 0,
        s"a bloom false positive must still verify row-wise: $miss")
      df.inputFiles.map(_.split("/").takeRight(2).head).distinct.length
    }
    // 50 misses × 5 layers = 250 probes at ~10 bits/key: expect ~1%
    // false positives — a run with > 10% would mean broken hashing
    assert(missHits.sum <= 25, s"false-positive layers: ${missHits.sum}/250")
    assert(missHits.count(_ == 0) >= 40,
      s"most misses must open zero layers: $missHits")
  }

  test("numeric pk point lookup: RANDOM long ids (envelopes span, " +
      "histogram poisoned) prune via the double-kind bloom") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    // deterministic random-looking ids: bit-reversal is a bijection
    // (injective → pk-unique) that scatters consecutive ints across
    // [0, 2^52) — every layer's envelope spans the space, and values
    // stay exactly double-representable
    def id(b: Int, i: Int): Long =
      java.lang.Long.reverse(b * 1500L + i + 1) >>> 12
    (0 until 5).foreach { b =>
      val df = (0 until 1500).map(i => (id(b, i), i)).toDF("id", "n")
      if (b == 0) NdjsonIngest.appendVersion(df, dir, "id")
      else NdjsonIngest.appendDelta(df, dir, "id")
    }
    val chain = NdjsonIngest.latestLayers(dir)
    val probe = id(3, 500).toDouble
    val routed = NdjsonIngest.readChainRanges(spark, dir, chain,
      Seq(("id", probe, probe)))
    val layers = routed.inputFiles.map(_.split("/").takeRight(2).head)
      .distinct.toSeq
    assert(layers.contains(chain(3)) && layers.length <= 2,
      s"numeric point probe must prune via the bloom: $layers")
    assert(routed.filter(col("id") === id(3, 500)).count() === 1)
    // a RANGE probe (lo < hi) must NOT consult the bloom — it only
    // covers point encodings
    val lo = probe - 1e12
    val hi = probe + 1e12
    val ranged = NdjsonIngest.readChainRanges(spark, dir, chain,
      Seq(("id", lo, hi)))
    assert(ranged.filter(col("id").between(lo, hi)).count() ===
      spark.read.parquet(chain.map(l => s"$dir/$l"): _*)
        .filter(col("id").between(lo, hi)).count())
  }

  test("saturation: a layer with far more keys than the written cap " +
      "serves writes NO bl: line — absence reads as conservative keep") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    val df = (0 until 60000).map(i => (md5(s"big-$i"), i)).toDF("pk", "n")
    NdjsonIngest.appendVersion(df, dir, "pk")
    val stats = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "v1", "_stats"))
    assert(!stats.linesIterator.exists(_.startsWith("bl:pk ")),
      "a saturated bloom is dead sidecar weight — must not be written")
    val chain = NdjsonIngest.latestLayers(dir)
    val probe = md5("big-123")
    val routed = NdjsonIngest.readChainRanges(spark, dir, chain, Nil,
      strEquals = Seq(("pk", Seq(probe))))
    assert(routed.filter(col("pk") === probe).count() === 1)
  }

  test("string-pk append clash check prunes through the layer blooms: " +
      "a fresh-keys batch reads no layer, an overlapping batch reads " +
      "only the holding layer, a true duplicate still aborts") {
    val session = spark
    import session.implicits._
    val (dir, key) = uuidChain()
    val chain = NdjsonIngest.latestLayers(dir)
    // all-fresh keys: every layer's bloom excludes the whole batch —
    // the dup-pk check reads ZERO layers (was: one full-chain scan per
    // commit for any non-numeric pk)
    val fresh = (0 until 50).map(i => (md5(s"new-$i"), 100000 + i))
      .toDF("pk", "n")
    val freshScan = NdjsonIngest.existingForClash(
      spark, dir, chain, fresh, "pk")
    val freshLayers = freshScan.inputFiles
      .map(_.split("/").takeRight(2).head).distinct
    assert(freshLayers.length <= 1,
      s"fresh batch must skip (almost) every layer: ${freshLayers.toSeq}")
    NdjsonIngest.appendDelta(fresh, dir, "pk") // and the commit works
    // a batch overlapping layer 1 keeps (at least) layer 1
    val overlap = Seq((key(1 * 1500 + 9), -1)).toDF("pk", "n")
    val overlapLayers = NdjsonIngest.existingForClash(
        spark, dir, chain, overlap, "pk")
      .inputFiles.map(_.split("/").takeRight(2).head).distinct
    assert(overlapLayers.contains(chain(1)) && overlapLayers.length <= 2,
      s"overlap batch must read the holding layer: ${overlapLayers.toSeq}")
    // and the pruned check still ENFORCES uniqueness
    intercept[NdjsonIngest.DuplicatePrimaryKey] {
      NdjsonIngest.appendDelta(overlap, dir, "pk")
    }
    ()
  }

  test("forged over-full bloom (all bits set): every probe is a " +
      "'maybe' — pure conservative keep, rows stay exact") {
    val (dir, key) = uuidChain()
    val chain = NdjsonIngest.latestLayers(dir)
    // forge layer 1's bloom to all-ones: everything becomes a maybe
    val p = java.nio.file.Paths.get(dir, chain(1), "_stats")
    val ones = java.util.Base64.getEncoder.encodeToString(
      Array.fill[Byte](1024)(-1))
    val forged = java.nio.file.Files.readString(p).linesIterator.map {
      case l if l.startsWith("bl:pk ") =>
        val parts = l.split(" ")
        s"${parts(0)} ${parts(1)} ${parts(2)} $ones"
      case l => l
    }.mkString("\n")
    java.nio.file.Files.writeString(p, forged)
    val hit = key(4 * 1500 + 3) // lives in layer 4
    val routed = NdjsonIngest.readChainRanges(spark, dir, chain, Nil,
      strEquals = Seq(("pk", Seq(hit))))
    val layers = routed.inputFiles.map(_.split("/").takeRight(2).head)
      .distinct.toSeq
    assert(layers.contains(chain(1)) && layers.contains(chain(4)),
      s"the forged layer must stay a maybe, the true layer must open: $layers")
    assert(routed.filter(col("pk") === hit).count() === 1)
  }
}
