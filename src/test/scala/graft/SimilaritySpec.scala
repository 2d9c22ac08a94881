package graft

import org.apache.spark.sql.functions._
import graft.ann.Similarity
import graft.functions.{VectorFunctions => VF}
import graft.sources.NdjsonIngest

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.core.Tables.load(spark, sfDir, "embeddings")

  def bruteForcePairs(threshold: Double): Set[(Long, Long)] = {
    val e = emb.select(col("vec_id"), col("embedding"),
      VF.norm2(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("av"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("bv"), col("nrm").as("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", round(VF.dot(col("av"), col("bv")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
  }

  test("LSH candidates are verified (precision 1.0) with usable recall") {
    val truth = bruteForcePairs(0.4)
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, k = 4, tables = 8, threshold = 0.4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(truth), "verification must kill false positives")
    if (truth.nonEmpty) {
      val recall = lsh.size.toDouble / truth.size
      assert(recall >= 0.5, s"recall $recall too low (${lsh.size}/${truth.size})")
    }
  }

  test("clustered append range-partitions files for row-group pruning") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString + "/t"
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") * 7 % 1000).as("cov_start"))
    NdjsonIngest.appendClusteredVersion(df, dir, "id", "cov_start", 4)
    val files = new java.io.File(NdjsonIngest.latestPath(dir))
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 4)
    // each file must cover a disjoint cov_start range (the chunk-skipping
    // property: a range predicate prunes whole files via min/max stats)
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getPath)
        .agg(min("cov_start"), max("cov_start")).head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
  }
}
