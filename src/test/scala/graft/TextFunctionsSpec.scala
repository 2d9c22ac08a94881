package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace tokens of the canonical form") {
    val df = Seq("  Hello   world ", "one", "").toDF("text")
    val out = df.select(TF.tokenCount(col("text"))).as[Int].collect()
    assert(out.toSeq === Seq(2, 1, 0))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A  b\tC", "a b c"), ("x", "y")).toDF("t1", "t2")
    val eq = df.select((TF.fingerprint(col("t1")) === TF.fingerprint(col("t2"))).as("e"))
      .as[Boolean].collect()
    assert(eq.toSeq === Seq(true, false))
  }

  test("shingles: distinct word 3-grams; short docs yield none") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TF.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(out(0).map(_.toString).sorted === Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
  }

  test("punctRatio and stopwordRatio bounded in [0,1]") {
    val df = Seq("the quick, brown fox!!", "no stops here").toDF("text")
    val rows = df.select(TF.punctRatio(col("text")), TF.stopwordRatio(col("text")))
      .as[(Double, Double)].collect()
    rows.foreach { case (p, s) =>
      assert(p >= 0 && p <= 1); assert(s >= 0 && s <= 1)
    }
    assert(rows(0)._2 > 0)
    assert(rows(1)._2 === 0.0)
  }

  test("langId picks a language deterministically") {
    val df = Seq("the cat and the dog", "le chat et la mer que").toDF("text")
    val out = df.select(TF.langId(col("text"))).as[String].collect()
    assert(out(0) === "en")
    assert(out(1) === "fr")
  }

  test("qualityScoreBp in [0, 100000]") {
    val df = Seq("the quick brown fox jumps over a lazy dog", "").toDF("text")
    val out = df.select(TF.qualityScoreBp(col("text"))).as[Long].collect()
    out.foreach(q => assert(q >= 0 && q <= 100000))
  }

  test("RollingHash equals the per-window HOF re-fold on arbitrary strings") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaa", "abcdefgh", "abcdefg" /* < window → empty */, "",
      "x" * 300, (0 until 100).map(i => ('a' + i % 26).toChar).mkString)
    val df = texts.toDF("text")
    // reference form: the O(n·w) fold the SQL oracles replay
    val cs = transform(filter(split(col("text"), ""), x => x =!= ""),
      c => ascii(c))
    val ref = when(size(cs) >= 8,
      transform(sequence(lit(1), size(cs) - 7), i =>
        aggregate(slice(cs, i, lit(8)), lit(0L),
          (a, x) => (a * 257 + x) % 1000003)))
      .otherwise(array().cast("array<bigint>"))
    val rows = df.select(
      TF.rollingHashes(col("text"), 8, 257, 1000003).as("fast"),
      ref.as("slow")).as[(Seq[Long], Seq[Long])].collect()
    rows.zip(texts).foreach { case ((fast, slow), t) =>
      assert(fast === slow, s"text=${t.take(30)}")
    }
    // codegen and interpreted paths agree (eval exercised via filter)
    val n = df.filter(size(TF.rollingHashes(col("text"), 8, 257, 1000003)) > 0)
      .count()
    assert(n === texts.count(_.length >= 8))
  }

  test("RollingHash rejects params whose intermediates would overflow Long") {
    // base beyond 2^31 makes h*base wrap silently in eval AND codegen —
    // the constructor must refuse rather than hash wrong
    intercept[IllegalArgumentException] {
      TF.rollingHashes(lit("x"), 8, Int.MaxValue.toLong + 1, 1000003)
    }
    intercept[IllegalArgumentException] {
      TF.rollingHashes(lit("x"), 8, 257, Int.MaxValue.toLong + 1)
    }
    // boundary values stay legal
    TF.rollingHashes(lit("x"), 8, Int.MaxValue.toLong, Int.MaxValue.toLong)
  }
}
