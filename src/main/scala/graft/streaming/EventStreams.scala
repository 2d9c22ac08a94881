package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured-Streaming operators over the events stream shape.
  *
  * The reference is batch-append only (SURVEY.md §3.2) — this is the
  * beyond-reference streaming layer: the same transformations run on a
  * static DataFrame (batch backfill) or a `readStream` source (live),
  * which is exactly Spark's unified-batch-streaming contract. Watermarks
  * bound state; at scale the groupBy shuffles on (window, key) and state
  * lives in the state store per partition.
  */
object EventStreams {

  /** Tumbling-window counts with a lateness watermark. Works on both batch
    * and streaming inputs.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))

  /** Streaming exact dedup: keep the FIRST arrival of each content
    * fingerprint across micro-batches, with state BOUNDED by the
    * watermark. `dropDuplicatesWithinWatermark` is the load-bearing
    * choice over plain `dropDuplicates`: when the dedup key does not
    * include the event-time column, plain dropDuplicates keeps every
    * key's state forever — a 100 TB stream would accumulate one state
    * row per distinct document with no eviction. The WithinWatermark
    * variant evicts a key once the watermark passes its arrival by
    * `lateness`, trading "dedup across all time" for "dedup within the
    * lateness horizon + bounded state", which is the only contract that
    * runs indefinitely. Exact global dedup belongs to the batch path
    * (q_dedup_exact) over the committed table.
    *
    * Input needs `ts` (event time) and `textCol`; emits the surviving
    * rows with their fingerprint attached.
    */
  def dedupStream(docs: DataFrame, textCol: String, lateness: String): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-stream interval join (attribution shape): each `follow` row
    * matches `base` rows of the same user that happened no more than
    * `windowSeconds` earlier. Both sides carry watermarks, so Spark can
    * bound the join state store: a base row is evictable once the follow
    * watermark passes `base.ts + window`, which is what makes this run
    * indefinitely at scale instead of accumulating unbounded state. The
    * same call works on static DataFrames (batch backfill ignores the
    * watermarks).
    */
  def joinWithin(base: DataFrame, follow: DataFrame, windowSeconds: Int): DataFrame = {
    val b = base
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("base_ts"),
        col("event_type").as("base_type"))
    val f = follow
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("f_user_id"), col("ts").as("follow_ts"),
        col("event_type").as("follow_type"))
    b.join(f,
      col("user_id") === col("f_user_id") &&
        col("follow_ts") >= col("base_ts") &&
        col("follow_ts") <= col("base_ts") + expr(s"interval $windowSeconds seconds"))
      .select("user_id", "base_ts", "base_type", "follow_ts", "follow_type")
  }

  final case class EvV(user_id: Long, event_type: String, value: Double)
  final case class Totals(n_events: Long, total_value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user totals via `transformWithState` (the Spark 4
    * StatefulProcessor API): ValueState in the RocksDB state store, with
    * an optional TTL so cold users age out instead of accumulating
    * forever — the state-boundedness contract for an unbounded key space
    * at 100 TB. Emits the UPDATED totals for every user touched by the
    * micro-batch (update output mode).
    */
  final class RunningTotalsProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, EvV, UserTotals] {
    @transient private var totals: ValueState[Totals] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))
    override def handleInputRows(key: Long, rows: Iterator[EvV],
        timers: TimerValues): Iterator[UserTotals] = {
      var cur = if (totals.exists()) totals.get() else Totals(0L, 0.0)
      rows.foreach(e => cur = Totals(cur.n_events + 1, cur.total_value + e.value))
      totals.update(cur)
      Iterator.single(UserTotals(key, cur.n_events,
        math.rint(cur.total_value * 100) / 100))
    }
  }

  /** Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). Pass `ttl = null`
    * for unbounded retention. With a TTL the query runs in
    * ProcessingTime mode, whose cleanup timers fire no-data
    * micro-batches — pair it with a real `Trigger.ProcessingTime`
    * interval, or the default as-fast-as-possible trigger busy-loops
    * empty batches.
    */
  def runningTotals(ds: Dataset[EvV], ttl: java.time.Duration): Dataset[UserTotals] =
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState[UserTotals](new RunningTotalsProcessor(ttl),
        // state TTL is clocked by processing time, so a TTL'd processor
        // must run in ProcessingTime mode
        if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Update())(Encoders.product[UserTotals])

  /** Declarative gap sessionization via the built-in `session_window`
    * aggregation — the functions-not-custom-state counterpart of
    * [[sessionize]]: Spark merges overlapping per-key windows in the
    * state store and finalizes a session once the watermark passes its
    * close (start of the last event + gap). Same unified contract: on a
    * static frame it computes the identical sessions in one pass with
    * no state store at all.
    */
  def sessionWindows(events: DataFrame, gap: String): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, n_events: Long, duration_ms: Long)

  /** Gap-based sessionization with explicit keyed state
    * (`flatMapGroupsWithState` + event-time timeout): a session closes when
    * no event arrives within `gapMs` of the last one (watermark-driven).
    */
  def sessionize(ds: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.n, s.last - s.start))
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.n, s.last - s.start)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
