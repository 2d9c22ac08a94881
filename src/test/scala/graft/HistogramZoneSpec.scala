package graft

import org.apache.spark.sql.functions._
import graft.sources.NdjsonIngest
import graft.lang.Planner

/** Per-value zone pruning from the complete layer histograms — the
  * layer-granularity analog of the reference's per-value bitmaps
  * (string_in_set.cpp, lineage_index.h): a layer whose SPARSE value set
  * skips a window or in-set entirely is excluded even when its min/max
  * envelope straddles the probe.
  */
class HistogramZoneSpec extends SparkSpec {

  private def chainOf(batches: Seq[(Long, Long, String)]*): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hzone")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)))
    val dir = s"$tmp/t"
    val session = spark
    import session.implicits._
    batches.zipWithIndex.foreach { case (batch, i) =>
      val df = batch.toDF("id", "v", "c")
      if (i == 0) NdjsonIngest.appendVersion(df, dir, "id")
      else NdjsonIngest.appendDelta(df, dir, "id")
    }
    dir
  }

  private def layersRead(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.inputFiles.map(_.split("/").takeRight(2).head).distinct.sorted.toSeq

  test("a sparse value set excludes a window its envelope straddles") {
    // layer v1 holds v ∈ {0, 6} — envelope [0, 6] INTERSECTS the probe
    // window [2, 3], but no actual value does; layer v2 holds {2, 3}
    val dir = chainOf(
      Seq((1L, 0L, "a"), (2L, 6L, "a")),
      Seq((3L, 2L, "x"), (4L, 3L, "y")))
    val catalog = Planner.Catalog(
      tables = Map("t" -> NdjsonIngest.readLatest(spark, dir)),
      versionedDirs = Map("t" -> dir))
    val df = Planner.plan("t.filter(between(v, 2, 3)).project({id, v})",
      catalog)
    assert(layersRead(df) === Seq("v2"),
      s"the straddled-but-empty layer must prune: ${layersRead(df)}")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    // and the count answers exactly, zero footers (histogram pass count)
    val cnt = Planner.plan(
      "t.filter(between(v, 2, 3)).groupBy({c := count()})", catalog)
    assert(cnt.inputFiles.isEmpty)
    assert(cnt.collect()(0).getLong(0) === 2L)
  }

  test("an in-set probe excludes layers not holding any sought value " +
      "inside their lexicographic envelope") {
    // layer v1 holds c ∈ {a, z} — the envelope [a, z] contains 'x', but
    // the actual value set does not; layer v2 holds {x, y}
    val dir = chainOf(
      Seq((1L, 1L, "a"), (2L, 1L, "z")),
      Seq((3L, 1L, "x"), (4L, 1L, "y")))
    val catalog = Planner.Catalog(
      tables = Map("t" -> NdjsonIngest.readLatest(spark, dir)),
      versionedDirs = Map("t" -> dir))
    val df = Planner.plan("t.filter(in(c, {'x'})).project({id, c})",
      catalog)
    assert(layersRead(df) === Seq("v2"),
      s"the envelope-contained-but-absent layer must prune: ${layersRead(df)}")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(3L))
    // a value present NOWHERE counts 0 from metadata alone
    val cnt = Planner.plan(
      "t.filter(c = 'zz').groupBy({n := count()})", catalog)
    assert(cnt.inputFiles.isEmpty)
    assert(cnt.collect()(0).getLong(0) === 0L)
  }
}
