package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** NDJSON ingest → versioned parquet, the append path of the engine
  * (reference: src/silo/append/ndjson_line_reader.h, table_inserter.h,
  * documentation/incremental_preprocessing.md:1-40).
  *
  * Spark-first mapping:
  *  - simdjson streaming parse → `spark.read.schema(...).json` (schema
  *    ENFORCED, not inferred — inference would scan twice and admit drift);
  *  - `.zst`/`.xz` transparent decompress → Spark/Hadoop codec handling;
  *  - duplicate-primary-key abort → distributed groupBy-count assertion
  *    (reference validates PK uniqueness the same way, table.h:57);
  *  - atomic all-or-nothing append → write to a NEW version directory and
  *    only then update the `latest` pointer (≙ DataVersion dirs,
  *    database.h:89-96). Readers resolve the pointer per query, so a
  *    half-written version is never visible — the Spark analog of the
  *    reference's directory-watcher hot swap.
  */
object NdjsonIngest {

  final case class DuplicatePrimaryKey(keys: Seq[String])
    extends RuntimeException(s"duplicate primary keys: ${keys.mkString(", ")}")

  /** Read NDJSON with an enforced schema; malformed lines fail the job
    * (mode FAILFAST ≙ the reference's append abort-on-error).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Read an explicit file list (the incremental-index path reads ONLY the
    * files that appeared since the last committed index).
    */
  def read(spark: SparkSession, paths: Seq[String], schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(paths: _*)

  /** Validate PK uniqueness; throws DuplicatePrimaryKey listing a sample. */
  def validatePrimaryKey(df: DataFrame, pk: String): Unit = {
    val dups = df.groupBy(col(pk)).count().filter(col("count") > 1)
      .select(col(pk).cast("string")).limit(10)
      .collect().map(_.getString(0)).toSeq
    if (dups.nonEmpty) throw DuplicatePrimaryKey(dups)
  }

  /** Append a batch as a new table version. Returns the new version id.
    * Partitioned/sorted writes: callers cluster by their range column first
    * (≙ clustered ingestion buffering, table_inserter.h:28-40 — row-group
    * min/max stats then give the same chunk-skipping effect).
    *
    * `tag` rides INSIDE the atomic pointer flip (same file, one rename), so
    * a caller can stamp the commit with a replay token — streaming ingest
    * stores the micro-batch id here and skips a batch whose id is already
    * the committed tag (exactly-once across checkpoint replays without a
    * separate, non-atomic manifest write).
    *
    * An UNTAGGED commit CARRIES the previous tag forward: the replay tag
    * answers "is streaming batch N already contained in this table?", and
    * a batch append layered on top of the streaming commit still contains
    * it. Dropping the tag here would make a post-crash replay of batch N
    * unrecognizable — it would re-union rows already in the table and
    * poison the stream in a dup-PK abort loop.
    */
  def appendVersion(df: DataFrame, tableDir: String, pk: String,
      tag: Option[String] = None): Long = {
    validatePrimaryKey(df, pk)
    val fs = new java.io.File(tableDir)
    fs.mkdirs()
    val effectiveTag = tag.orElse(latestTag(tableDir))
    val existing = Option(fs.list()).getOrElse(Array())
      .filter(_.startsWith("v")).map(_.drop(1).toLong)
    val next = if (existing.isEmpty) 1L else existing.max + 1
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$tableDir/v$next")
    // atomic pointer flip: write tmp then rename
    val tmp = new java.io.File(tableDir, ".latest.tmp")
    java.nio.file.Files.writeString(tmp.toPath,
      s"v$next" + effectiveTag.map(t => s" $t").getOrElse(""))
    tmp.renameTo(new java.io.File(tableDir, "latest"))
    next
  }

  /** Range-clustered append (reference: clustered ingestion buffering,
    * append/table_inserter.h:28-40, performance/README.md:37-57): rows are
    * range-partitioned and sorted on `rangeCol` before the parquet write,
    * so row-group min/max statistics give the same chunk-skipping effect
    * the reference gets from coverage-clustered chunks — a range filter on
    * `rangeCol` then prunes whole files/row-groups at scan time.
    */
  def appendClusteredVersion(
      df: DataFrame, tableDir: String, pk: String,
      rangeCol: String, numRanges: Int): Long = {
    val clustered = df
      .repartitionByRange(numRanges, col(rangeCol))
      .sortWithinPartitions(rangeCol)
    appendVersion(clustered, tableDir, pk)
  }

  /** Resolve the current version directory for reads. */
  def latestPath(tableDir: String): String = {
    val p = java.nio.file.Paths.get(tableDir, "latest")
    s"$tableDir/${java.nio.file.Files.readString(p).trim.split("\\s+").head}"
  }

  /** True when a `latest` pointer exists (vs any other read failure, which
    * must propagate — treating e.g. an IO error as "no table yet" would
    * silently restart the table from one batch).
    */
  def hasLatest(tableDir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(tableDir, "latest"))

  /** The replay tag the current `latest` pointer was committed with. */
  def latestTag(tableDir: String): Option[String] = {
    val p = java.nio.file.Paths.get(tableDir, "latest")
    if (!java.nio.file.Files.exists(p)) None
    else java.nio.file.Files.readString(p).trim.split("\\s+").toSeq match {
      case Seq(_, tag, _*) => Some(tag)
      case _ => None
    }
  }
}
