package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental consumption of a versioned table's change feed with a
  * DURABLE CURSOR — the downstream half of [[NdjsonIngest.readChanges]].
  *
  * A consumer (derived-index maintenance, training-set refresh, replica
  * sync) calls [[process]] periodically: it reads the cursor, hands the
  * batch `readChanges(cursor, head]` to the callback, and advances the
  * cursor ATOMICALLY (tmp + rename) only after the callback returns.
  * Crash anywhere → the next call replays the same commit range:
  * at-least-once delivery, exactly-once EFFECT when the callback is
  * idempotent on `_commit` (every feed row carries the introducing commit,
  * so sinks can upsert/skip on it — the same replay-tag discipline the
  * streaming ingest path uses).
  *
  * Each call does O(changed rows) work and O(1) metadata IO; nothing
  * rescans the table. Consumers must run within the table's gc retention
  * window — a reclaimed range fails loudly in readChanges rather than
  * silently skipping commits.
  */
object ChangeFeedConsumer {

  /** The consumer's last-processed commit (0 = nothing consumed yet). */
  def cursor(stateDir: String): Long = {
    val p = java.nio.file.Paths.get(stateDir, "cursor")
    if (!java.nio.file.Files.exists(p)) 0L
    else java.nio.file.Files.readString(p).trim.toLong
  }

  /** Consume all commits past the cursor. Returns the (from, to] range
    * processed, or None when the feed had nothing new (callback not
    * invoked, cursor untouched).
    */
  def process(spark: SparkSession, tableDir: String, pk: String,
      stateDir: String)(fn: DataFrame => Unit): Option[(Long, Long)] =
    processWithRange(spark, tableDir, pk, stateDir)((df, _) => fn(df))

  /** [[process]] with the commit range handed to the callback — the
    * replay tag a consumer records on its artifacts so a crash between
    * its commit and the cursor advance is recognised on replay (the
    * exactly-once-EFFECT half of at-least-once delivery).
    */
  def processWithRange(spark: SparkSession, tableDir: String, pk: String,
      stateDir: String)(
      fn: (DataFrame, (Long, Long)) => Unit): Option[(Long, Long)] = {
    val from = cursor(stateDir)
    val head = NdjsonIngest.commits(tableDir).lastOption.getOrElse(0L)
    if (head <= from) return None
    fn(NdjsonIngest.readChanges(spark, tableDir, pk, from, head), (from, head))
    writeCursor(stateDir, head)
    Some((from, head))
  }

  /** Set the durable cursor directly (atomic tmp+rename) — a consumer's
    * bootstrap marks the feed consumed up to the state it just indexed.
    */
  def writeCursor(stateDir: String, value: Long): Unit = {
    new java.io.File(stateDir).mkdirs()
    val tmp = java.nio.file.Paths.get(stateDir, ".cursor.tmp")
    java.nio.file.Files.writeString(tmp, value.toString)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(stateDir, "cursor"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
