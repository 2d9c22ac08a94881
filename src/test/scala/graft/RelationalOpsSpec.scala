package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("nOf counts at-least-k of n predicates") {
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b")
    val preds = Seq(col("a") > 1, col("b") > 15, col("b") > 25)
    assert(df.filter(RelationalOps.nOf(2, preds)).count() === 2)
    assert(df.filter(RelationalOps.nOf(3, preds, matchExactly = true)).count() === 1)
  }

  test("at: 1-based char; past-end is empty string; null stays null") {
    val df = Seq(Some("abc"), Some("a"), None).toDF("s")
    val out = df.select(RelationalOps.at(col("s"), 2)).as[Option[String]].collect()
    assert(out.toSeq === Seq(Some("b"), Some(""), None))
  }

  test("floatBetween is from-inclusive, to-exclusive") {
    val df = Seq(0.03, 0.05, 0.06).toDF("x")
    val n = df.filter(RelationalOps.floatBetween(col("x"), Some(0.03), Some(0.06))).count()
    assert(n === 2)
  }

  test("intBetween is inclusive on both ends, open bounds allowed") {
    val df = Seq(9L, 10L, 20L, 21L).toDF("x")
    assert(df.filter(RelationalOps.intBetween(col("x"), Some(10L), Some(20L))).count() === 2)
    assert(df.filter(RelationalOps.intBetween(col("x"), None, Some(20L))).count() === 3)
  }

  test("randomizeKey is deterministic for a given seed") {
    val df = Seq((1L, 1), (2L, 1)).toDF("k", "n")
    val a = df.select(RelationalOps.randomizeKey(42L, col("k"), col("n"))).as[String].collect()
    val b = df.select(RelationalOps.randomizeKey(42L, col("k"), col("n"))).as[String].collect()
    assert(a.toSeq === b.toSeq)
    val c = df.select(RelationalOps.randomizeKey(7L, col("k"), col("n"))).as[String].collect()
    assert(a.toSeq !== c.toSeq)
  }

  test("schemaOf reports reference type vocabulary") {
    val df = Seq((1, 1L, "x", 1.0)).toDF("i", "l", "s", "d")
    val m = RelationalOps.schemaOf(df).as[(String, String)].collect().toMap
    assert(m === Map("i" -> "INT32", "l" -> "INT64", "s" -> "STRING", "d" -> "FLOAT"))
  }

  test("asofJoin attaches the most recent right row at-or-before each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 101L), (2L, 6L, 200L))
      .toDF("k", "ts", "pay")
    val out = RelationalOps.asofJoin(left, "k", "ts", right, "k", "ts", "pay")
      .select("tag", "asof_ts", "asof_pay")
      .as[(String, Option[Long], Option[Long])].collect()
      .map { case (t, ts, p) => t -> ((ts, p)) }.toMap
    // equal ts matches (inclusive); later right wins; no-prior-right → null
    assert(out("a") === (Some(10L), Some(100L)))
    assert(out("b") === (Some(15L), Some(101L)))
    assert(out("c") === (None, None))
    assert(out("d") === (None, None))
  }

  test("asofJoin never matches null keys or null-ts right rows (SQL join semantics)") {
    val left = Seq((Option.empty[Long], Some(10L), "nullkey"), (Some(1L), Some(10L), "ok"))
      .toDF("k", "ts", "tag")
    val right = Seq((Option.empty[Long], Some(5L), 7L), (Some(1L), Option.empty[Long], 8L),
      (Some(1L), Some(4L), 9L)).toDF("k", "ts", "pay")
    val out = RelationalOps.asofJoin(left, "k", "ts", right, "k", "ts", "pay")
      .select("tag", "asof_pay").as[(String, Option[Long])].collect().toMap
    assert(out("nullkey") === None) // null-key left row: no match ever
    assert(out("ok") === Some(9L))  // null-ts right row ignored, real one matches
  }

  test("asofJoin breaks right-side (key, ts) ties by max payload, deterministically") {
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L)).toDF("k", "ts", "pay")
    val out = RelationalOps.asofJoin(left, "k", "ts", right, "k", "ts", "pay")
      .select("asof_pay").as[Long].collect()
    assert(out.toSeq === Seq(9L))
  }

  test("saltedJoin matches the plain join exactly (salting is correctness-neutral)") {
    // heavily skewed: 90 of 100 rows share key "hot"
    val big = (0 until 100).map(i => (if (i < 90) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k95", "C")).toDF("k", "label")
    val salted = RelationalOps.saltedJoin(big, small, "k", 4, xxhash64(col("v")))
      .select("k", "v", "label")
    val plain = big.join(small, "k").select("k", "v", "label")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0 && plain.except(salted).count() === 0)
    // the salt actually spreads the hot key across multiple values
    val nSalts = big.withColumn("s", pmod(xxhash64(col("v")), lit(4)))
      .filter(col("k") === "hot").select("s").distinct().count()
    assert(nSalts > 1)
  }

  test("rangeJoinBinned matches the naive inequality join on [lo, hi) intervals") {
    val points = Seq(0L, 5L, 10L, 99L, 100L, 150L, 250L, 999L).map(Tuple1(_))
      .toDF("p")
    val iv = Seq((0L, 10L, "a"), (10L, 100L, "b"), (90L, 260L, "c"),
      (300L, 300L, "empty"), (240L, 241L, "tiny")).toDF("lo", "hi", "tag")
    val binned = RelationalOps.rangeJoinBinned(points, "p", iv, "lo", "hi", 50L)
      .select("p", "tag").as[(Long, String)].collect().toSet
    val naive = points.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "tag").as[(Long, String)].collect().toSet
    assert(binned === naive)
    assert(binned.contains((99L, "c")) && binned.contains((5L, "a")))
    assert(!binned.exists(_._2 == "empty")) // zero-width interval matches nothing
    assert(!binned.exists(_._1 == 999L))    // point past every interval drops
  }
}
