package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{NdjsonIngest, ZstdStringColumn}
import graft.operators.RelationalOps

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("country", StringType),
    StructField("val", DoubleType)))

  def tmpDir(): String = Files.createTempDirectory("graft").toString

  test("ndjson read with enforced schema") {
    val d = tmpDir()
    Files.writeString(java.nio.file.Paths.get(d, "in.ndjson"),
      """{"id":1,"country":"CH","val":1.5}
        |{"id":2,"country":"DE","val":2.5}
        |""".stripMargin)
    val df = NdjsonIngest.read(spark, s"$d/in.ndjson", schema)
    assert(df.schema === schema)
    assert(df.count() === 2)
  }

  test("duplicate primary key aborts the append") {
    val df = Seq((1L, "CH", 1.0), (1L, "DE", 2.0)).toDF("id", "country", "val")
    val e = intercept[NdjsonIngest.DuplicatePrimaryKey] {
      NdjsonIngest.appendVersion(df, tmpDir() + "/t", "id")
    }
    assert(e.keys === Seq("1"))
  }

  test("versioned append flips the latest pointer atomically") {
    val dir = tmpDir() + "/t"
    val v1 = NdjsonIngest.appendVersion(
      Seq((1L, "CH", 1.0)).toDF("id", "country", "val"), dir, "id")
    assert(v1 === 1L)
    assert(spark.read.parquet(NdjsonIngest.latestPath(dir)).count() === 1)
    val v2 = NdjsonIngest.appendVersion(
      Seq((1L, "CH", 1.0), (2L, "DE", 2.0)).toDF("id", "country", "val"), dir, "id")
    assert(v2 === 2L)
    assert(spark.read.parquet(NdjsonIngest.latestPath(dir)).count() === 2)
  }

  test("updateColumn: conditional scalar rewrite") {
    val df = Seq((1L, 10), (2L, 20)).toDF("id", "x")
    val out = RelationalOps.updateColumn(df, "x", lit(0), col("id") === 1L)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 20))
  }

  test("zstd column round-trips and the dictionary helps near-ref strings") {
    val ref = "ACGTACGT" * 500
    val nearRef = ref.updated(17, 'T').updated(1033, 'C')
    val rt = ZstdStringColumn.decompressBytes(
      ZstdStringColumn.compressBytes(nearRef, ref.getBytes("UTF-8")), ref.getBytes("UTF-8"))
    assert(rt === nearRef)
    val withDict = ZstdStringColumn.compressBytes(nearRef, ref.getBytes("UTF-8")).length
    val noDict = ZstdStringColumn.compressBytes(nearRef, Array.emptyByteArray).length
    assert(withDict < noDict, s"dict $withDict vs plain $noDict")
  }

  test("zstd compress/decompress as Columns") {
    val dict = "ACGTACGT" * 10
    val df = Seq("ACGTACGAACGT", null).toDF("s")
    val out = df.select(
      ZstdStringColumn.decompress(
        ZstdStringColumn.compress(col("s"), dict), dict).as("r"))
      .as[Option[String]].collect()
    assert(out.toSeq === Seq(Some("ACGTACGAACGT"), None))
  }
}
