package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Parquet bloom filters for point-lookup pruning on versioned tables.
  *
  * The reference answers point predicates on indexed metadata columns from
  * per-value roaring bitmaps (SURVEY §2.5 IndexScan / StringInSet). The
  * Spark-native storage analog is a parquet BLOOM FILTER on the column:
  * written once per row group at commit time, consulted by the reader
  * BEFORE any data page is decoded, so a `pk = x` probe on a 100 TB table
  * skips every row group that provably lacks `x` — dictionary and min/max
  * stats only help for sorted or low-cardinality columns, the bloom works
  * for high-cardinality scattered keys (exactly what a primary key is).
  *
  * Sizing: `parquet.bloom.filter.adaptive.enabled` lets parquet-mr size
  * the filter from the row group's OBSERVED distinct count (capped by
  * `parquet.bloom.filter.max.bytes`), so a small delta layer pays bytes
  * proportional to its batch, not a fixed megabyte.
  */
object ParquetBloom {

  /** Writer options enabling an adaptively-sized bloom filter on `cols`. */
  def options(cols: Seq[String]): Map[String, String] =
    cols.map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap +
      ("parquet.bloom.filter.adaptive.enabled" -> "true")

  private def footers(spark: SparkSession, dir: String): Seq[(String, ParquetFileReader)] = {
    val conf = spark.sessionState.newHadoopConf()
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array())
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    files.toSeq.map { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getPath), conf: Configuration)
      f.getPath -> ParquetFileReader.open(in)
    }
  }

  /** True when EVERY row group of every parquet file under `dir` carries a
    * bloom filter for `col` (the guarantee point-lookup pruning relies on).
    */
  def hasBloom(spark: SparkSession, dir: String, col: String): Boolean = {
    import scala.jdk.CollectionConverters._
    val fs = footers(spark, dir)
    try fs.nonEmpty && fs.forall { case (_, r) =>
      r.getRowGroups.asScala.forall { bg =>
        bg.getColumns.asScala.find(_.getPath.toDotString == col)
          .exists(c => r.getBloomFilterDataReader(bg).readBloomFilter(c) != null)
      }
    } finally fs.foreach(_._2.close())
  }

  /** Whether any row group's bloom filter under `dir` might contain the
    * long `value` in `col` — `false` proves a reader skips EVERY row group
    * for that probe without touching a data page.
    */
  def mightContainLong(spark: SparkSession, dir: String, col: String,
      value: Long): Boolean = {
    import scala.jdk.CollectionConverters._
    val fs = footers(spark, dir)
    try fs.exists { case (_, r) =>
      r.getRowGroups.asScala.exists { bg =>
        bg.getColumns.asScala.find(_.getPath.toDotString == col).forall { c =>
          val bloom = r.getBloomFilterDataReader(bg).readBloomFilter(c)
          bloom == null || bloom.findHash(bloom.hash(value))
        }
      }
    } finally fs.foreach(_._2.close())
  }
}
