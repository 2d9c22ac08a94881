package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{IncrementalJoin, NdjsonIngest}

class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft").toString

  private def docs(r: (Long, Long, String)*) = r.toDF("doc_id", "src_id", "txt")
  private def srcs(r: (Long, String)*) = r.toDF("src_id", "src_name")

  test("materialized join view refreshes O(delta) and matches the full join") {
    val (aDir, bDir, vDir) = (tmpDir() + "/a", tmpDir() + "/b", tmpDir() + "/v")
    NdjsonIngest.appendVersion(
      docs((1L, 10L, "one"), (2L, 20L, "two")), aDir, "doc_id")
    NdjsonIngest.appendVersion(srcs(10L -> "web", 20L -> "books"), bDir, "src_id")

    // bootstrap: first refresh materializes the whole join
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").nonEmpty)
    def view() = IncrementalJoin.read(spark, vDir)
      .select("doc_id", "src_name").as[(Long, String)].collect().toSet
    assert(view() === Set(1L -> "web", 2L -> "books"))

    // already fresh: no-op, no new commit
    val commitsBefore = NdjsonIngest.commits(vDir)
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").isEmpty)
    assert(NdjsonIngest.commits(vDir) === commitsBefore)

    // new docs against an existing source AND a new source with no docs
    // yet: the refresh layer holds exactly the two new pairs (O(delta)),
    // not a re-materialized view
    NdjsonIngest.appendDelta(
      docs((3L, 10L, "three"), (4L, 10L, "four")), aDir, "doc_id")
    NdjsonIngest.appendDelta(srcs(30L -> "wiki"), bDir, "src_id")
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").nonEmpty)
    val lastLayer = s"$vDir/${NdjsonIngest.latestLayers(vDir).last}"
    assert(spark.read.parquet(lastLayer).count() === 2)
    assert(view() === Set(1L -> "web", 2L -> "books", 3L -> "web", 4L -> "web"))

    // old docs × new source: the A_old ⋈ ΔB term, counted exactly once
    // even though doc 5 (ΔA) also matches the new source (ΔA ⋈ B_head)
    NdjsonIngest.appendDelta(docs((5L, 30L, "five")), aDir, "doc_id")
    NdjsonIngest.appendDelta(srcs(40L -> "code"), bDir, "src_id")
    NdjsonIngest.appendDelta(docs((6L, 40L, "six")), aDir, "doc_id")
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").nonEmpty)
    val expected = NdjsonIngest.readLatest(spark, aDir)
      .join(NdjsonIngest.readLatest(spark, bDir), "src_id")
      .select("doc_id", "src_name").as[(Long, String)].collect().toSet
    assert(view() === expected)
    assert(view().contains(5L -> "wiki") && view().contains(6L -> "code"))

    // the view is an ordinary versioned table: compaction bounds it
    (7L to 16L).foreach { i =>
      NdjsonIngest.appendDelta(docs((i, 10L, s"d$i")), aDir, "doc_id")
      IncrementalJoin.refresh(spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id")
    }
    assert(NdjsonIngest.compactVersions(spark, vDir, maxLayers = 4))
    assert(view() === NdjsonIngest.readLatest(spark, aDir)
      .join(NdjsonIngest.readLatest(spark, bDir), "src_id")
      .select("doc_id", "src_name").as[(Long, String)].collect().toSet)
    // compaction does not advance or lose the cursors: still fresh
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").isEmpty)
  }

  test("refresh is a graceful no-op while B has no commits yet") {
    val (aDir, bDir, vDir) = (tmpDir() + "/a", tmpDir() + "/b", tmpDir() + "/v")
    NdjsonIngest.appendVersion(docs((1L, 10L, "one")), aDir, "doc_id")
    // B dir exists but has no commits: no pairs can exist — must not throw
    new java.io.File(bDir).mkdirs()
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").isEmpty)
    // once B gets its first commit, the bootstrap proceeds normally
    NdjsonIngest.appendVersion(srcs(10L -> "web"), bDir, "src_id")
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").nonEmpty)
    assert(IncrementalJoin.read(spark, vDir)
      .select("doc_id", "src_name").as[(Long, String)].collect().toSet ===
      Set(1L -> "web"))
  }

  test("string keys containing ':' produce unambiguous view pks") {
    val (aDir, bDir, vDir) = (tmpDir() + "/a", tmpDir() + "/b", tmpDir() + "/v")
    // ("a:b", "c") and ("a", "b:c") would collide under a raw ':' concat
    val a = Seq(("a:b", 1L), ("a", 2L)).toDF("doc_key", "src_id")
    val b = Seq((1L, "c"), (2L, "b:c")).toDF("src_id", "src_name")
    NdjsonIngest.appendVersion(a, aDir, "doc_key")
    NdjsonIngest.appendVersion(b, bDir, "src_id")
    // view pk is (doc_key, src_name): exactly the colliding pair above
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_key", "src_name").nonEmpty)
    assert(IncrementalJoin.read(spark, vDir)
      .select("doc_key", "src_name").as[(String, String)].collect().toSet ===
      Set("a:b" -> "c", "a" -> "b:c"))
  }

  test("a view tagged under the old vid encoding refuses to refresh") {
    val (aDir, bDir, vDir) = (tmpDir() + "/a", tmpDir() + "/b", tmpDir() + "/v")
    NdjsonIngest.appendVersion(docs((1L, 10L, "one")), aDir, "doc_id")
    NdjsonIngest.appendVersion(srcs(10L -> "web"), bDir, "src_id")
    // simulate a pre-escape view: same content, old-style "ij:" tag
    NdjsonIngest.appendVersion(
      docs((1L, 10L, "one")).withColumn("__vid", lit("1:10")),
      vDir, "__vid", tag = Some("ij:1:1"))
    // the old tag means stored vids use the raw concat — refreshing would
    // silently disarm the dup-pk guard; must refuse toward rebuild()
    val e = intercept[IllegalStateException] {
      IncrementalJoin.refresh(spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id")
    }
    assert(e.getMessage.contains("rebuild"))
    // rebuild re-materializes under the new encoding and refresh resumes
    IncrementalJoin.rebuild(spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id")
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").isEmpty) // fresh
  }

  test("non-insert-only input commits abort the refresh; rebuild recovers") {
    val (aDir, bDir, vDir) = (tmpDir() + "/a", tmpDir() + "/b", tmpDir() + "/v")
    NdjsonIngest.appendVersion(docs((1L, 10L, "one")), aDir, "doc_id")
    NdjsonIngest.appendVersion(srcs(10L -> "web"), bDir, "src_id")
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").nonEmpty)

    // an upsert breaks the insert-only delta algebra: detected from the
    // commit log (metadata only), refused loudly
    NdjsonIngest.upsertDelta(docs((1L, 20L, "one-moved")), aDir, "doc_id")
    NdjsonIngest.appendDelta(srcs(20L -> "books"), bDir, "src_id")
    val e = intercept[IllegalArgumentException] {
      IncrementalJoin.refresh(spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id")
    }
    assert(e.getMessage.contains("rebuild"))

    // rebuild re-materializes from the merged truth and resets the chain
    IncrementalJoin.rebuild(spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id")
    // note: rebuild reads the PLAIN chain; for upserted inputs the caller
    // compacts the merge debt first so plain and merged reads agree
    NdjsonIngest.compactMerged(spark, aDir, "doc_id", maxLayers = 0)
    IncrementalJoin.rebuild(spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id")
    assert(IncrementalJoin.read(spark, vDir)
      .select("doc_id", "src_name").as[(Long, String)].collect().toSet ===
      Set(1L -> "books"))
    // and incremental refresh works again from the rebuilt cursors
    NdjsonIngest.appendDelta(docs((2L, 20L, "two")), aDir, "doc_id")
    assert(IncrementalJoin.refresh(
      spark, vDir, aDir, bDir, "src_id", "doc_id", "src_id").nonEmpty)
    assert(IncrementalJoin.read(spark, vDir)
      .select("doc_id", "src_name").as[(Long, String)].collect().toSet ===
      Set(1L -> "books", 2L -> "books"))
  }
}
