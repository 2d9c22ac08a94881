package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
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
  * and never observe a half-written version.
  *
  * Exactly-once across checkpoint replays: each commit stamps its
  * micro-batch id into the SAME atomic `latest` pointer flip, and a
  * replayed batch whose id equals the committed tag is skipped. Because
  * foreachBatch batches commit sequentially, only the most recent batch
  * can ever replay after a crash, so the single tag suffices — and since
  * tag + version flip are one rename, there is no window where a replay
  * would re-union an already-committed batch and trip the dup-PK abort in
  * a poisoned retry loop. At scale each micro-batch is an ordinary
  * distributed parquet write; state is only the file-source log.
  */
object StreamingIngest {

  /** One micro-batch commit, visible for direct testing. No-op when
    * `batchId` already equals the committed tag (checkpoint replay).
    */
  def ingestBatch(
      spark: SparkSession, batch: Dataset[Row], batchId: Long,
      seqCol: String, ref: String, tableDir: String, pk: String): Unit = {
    val tag = s"batch$batchId"
    if (NdjsonIngest.latestTag(tableDir).contains(tag)) return // replayed
    if (batch.isEmpty) return
    val diffed = SequenceModel.diff(batch.toDF(), seqCol, ref,
      missingSyms = Set("N"))
    // ONLY a missing pointer means "no table yet"; any other failure
    // (IO error, corrupt footer) propagates and fails the micro-batch —
    // swallowing it would silently restart the table from this batch
    val prev =
      if (NdjsonIngest.hasLatest(tableDir))
        Some(spark.read.parquet(NdjsonIngest.latestPath(tableDir)))
      else None
    val full = prev.map(_.unionByName(diffed)).getOrElse(diffed)
    NdjsonIngest.appendVersion(full, tableDir, pk, tag = Some(tag))
    ()
  }

  def start(
      spark: SparkSession, inDir: String, schema: StructType,
      seqCol: String, ref: String,
      tableDir: String, pk: String, checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema).option("mode", "FAILFAST").json(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(spark, batch, batchId, seqCol, ref, tableDir, pk)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
