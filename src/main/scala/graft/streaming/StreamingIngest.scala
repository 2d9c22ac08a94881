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
  * sequence_column.h:196-203) and commits ONE new atomic DELTA layer
  * (the batch alone) through [[NdjsonIngest.appendDelta]]; readers union
  * the committed layer chain, and compaction bounds its length.
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
  *
  * The tag is NAMESPACED by the stream's persistent query id
  * (`<queryId>:batch<N>`): batch ids restart at 0 for every fresh
  * checkpoint, so a bare `batch<N>` committed by one stream would be
  * indistinguishable from a different stream's genuinely new batch N on
  * the same tableDir — and that batch would be silently dropped. The
  * query id lives in the checkpoint's `metadata` file, so a RESTART of
  * the same checkpoint keeps the namespace (replay detection works)
  * while a fresh checkpoint gets a fresh one (nothing is skipped).
  */
object StreamingIngest {

  /** The stream's persistent query id, from the checkpoint `metadata`
    * file Structured Streaming writes at stream start (before batch 0
    * commits). Stable across restarts of the same checkpoint; fresh per
    * new checkpoint.
    */
  def streamIdOf(checkpointDir: String): String = {
    val p = java.nio.file.Paths.get(checkpointDir, "metadata")
    val m = """"id"\s*:\s*"([^"]+)"""".r
    m.findFirstMatchIn(java.nio.file.Files.readString(p))
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"no query id in checkpoint metadata at $p"))
  }

  /** One micro-batch commit, visible for direct testing. No-op when
    * `<streamId>:batch<batchId>` already equals the committed tag
    * (checkpoint replay of this same stream).
    */
  def ingestBatch(
      spark: SparkSession, batch: Dataset[Row], batchId: Long,
      seqCol: String, ref: String, tableDir: String, pk: String,
      streamId: String, evolve: Boolean = false): Unit = {
    val tag = s"$streamId:batch$batchId"
    if (NdjsonIngest.latestTag(tableDir).contains(tag)) return // replayed
    if (batch.isEmpty) return
    val diffed = SequenceModel.diff(batch.toDF(), seqCol, ref,
      missingSyms = Set("N"))
    // DELTA commit: the new version dir holds only this batch — a 1-row
    // micro-batch at 100 TB writes O(batch), not a full-table rewrite.
    // Readers union the committed layer chain (NdjsonIngest.readLatest).
    // `evolve` = the restart-with-a-new-schema-version path: a stream
    // whose source gained columns keeps appending to the same table
    // through the additive-evolution commit (old layers untouched);
    // without it a drifted schema still aborts loudly at the boundary.
    if (evolve) NdjsonIngest.appendDeltaEvolve(diffed, tableDir, pk, tag = Some(tag))
    else NdjsonIngest.appendDelta(diffed, tableDir, pk, tag = Some(tag))
    // Bound the chain (union width + small files): rewrite as one
    // snapshot layer past 8 delta layers — amortized O(table/8) per
    // batch, same policy as posting-index compaction.
    NdjsonIngest.compactVersions(spark, tableDir, maxLayers = 8)
    ()
  }

  def start(
      spark: SparkSession, inDir: String, schema: StructType,
      seqCol: String, ref: String,
      tableDir: String, pk: String, checkpointDir: String,
      evolve: Boolean = false): StreamingQuery =
    spark.readStream
      .schema(schema).option("mode", "FAILFAST").json(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // resolved per batch, not at start(): the metadata file is created
        // by the query's own startup, after this builder runs
        ingestBatch(spark, batch, batchId, seqCol, ref, tableDir, pk,
          streamId = streamIdOf(checkpointDir), evolve = evolve)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
