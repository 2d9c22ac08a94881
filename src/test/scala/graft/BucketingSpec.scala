package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SimpleMode

import graft.core.Tables
import graft.functions.{TextFunctions => TF}
import graft.sources.BucketedTables

/** Co-located joins over bucketed tables: both sides hash-bucketed on the
  * join key at write time → SortMergeJoin with zero Exchange (the shuffle
  * was paid once at ingest, not per query).
  */
class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans with zero Exchange and matches the shuffled result") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val stats = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TF.tokenCount(col("text")).cast("long").as("n_tokens"))
    val base = Files.createTempDirectory("graft_buckets").toString
    BucketedTables.write(docs, "b_docs", s"$base/b_docs", "doc_id", 8)
    BucketedTables.write(stats, "b_stats", s"$base/b_stats", "doc_id", 8)
    // disable broadcast so the plan shape under test is the large-table
    // path (SMJ), not a small-table special case
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_docs").join(spark.table("b_stats"), "doc_id")
      val plan = j.queryExecution.explainString(SimpleMode)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"co-bucketed join still shuffles:\n$plan")
      // and the layout is not just shuffle-free but CORRECT: row-for-row
      // parity with the ordinary (shuffled) join of the source frames
      val got = j.select("doc_id", "source", "n_chars", "n_tokens")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      val want = docs.join(stats, "doc_id")
        .select("doc_id", "source", "n_chars", "n_tokens")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      assert(got.length === want.length)
      assert(got.toSeq === want.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_stats")
    }
  }

  test("group-by on the bucket key aggregates without a shuffle") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val base = Files.createTempDirectory("graft_buckets_agg").toString
    BucketedTables.write(docs, "b_docs_agg", s"$base/b_docs_agg", "doc_id", 8)
    try {
      val a = spark.table("b_docs_agg").groupBy("doc_id")
        .agg(sum("n_chars").as("s"))
      val plan = a.queryExecution.explainString(SimpleMode)
      assert(!plan.contains("Exchange"), s"bucketed group-by still shuffles:\n$plan")
      assert(a.count() === docs.select("doc_id").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS b_docs_agg")
  }
}
