package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.seq.SequenceModel
import graft.sources.NdjsonIngest

/** Live `rhydb append` (reference: append/append.cpp → Database::appendData,
  * SURVEY.md §3.2) driven by Structured Streaming file discovery: an NDJSON
  * drop directory is the stream source; every micro-batch diffs its aligned
  * sequences against the reference at ingest (sequences never retained raw,
  * sequence_column.h:196-203) and commits ONE new atomic table version
  * (previous version ∪ batch) through [[NdjsonIngest.appendVersion]].
  *
  * Readers resolve `latest` per query — the directory-watcher hot swap —
  * and never observe a half-written version. Exactly-once per input file
  * comes from the streaming checkpoint (replayed batches re-offer the same
  * primary keys and the dup-PK abort rejects the commit rather than
  * double-ingesting). At scale each micro-batch is an ordinary distributed
  * parquet write; state is only the file-source log.
  */
object StreamingIngest {

  def start(
      spark: SparkSession, inDir: String, schema: StructType,
      seqCol: String, ref: String,
      tableDir: String, pk: String, checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema).option("mode", "FAILFAST").json(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val diffed = SequenceModel.diff(batch.toDF(), seqCol, ref,
            missingSyms = Set("N"))
          val prev =
            try Some(spark.read.parquet(NdjsonIngest.latestPath(tableDir)))
            catch { case _: Exception => None }
          val full = prev.map(_.unionByName(diffed)).getOrElse(diffed)
          NdjsonIngest.appendVersion(full, tableDir, pk)
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
