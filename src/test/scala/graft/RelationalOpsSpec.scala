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
}
