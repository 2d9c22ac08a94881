package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-expressions of the reference's pipeline operators that are not 1:1
  * Spark built-ins. Everything that IS a built-in (filter, project, map,
  * groupBy+count, orderBy, limit/offset, join, unionAll) is used directly as
  * `Dataset` API — Catalyst's PushDownPredicates / ColumnPruning /
  * TakeOrderedAndProject subsume the reference's FilterPushdownPass /
  * ColumnNarrowingPass / SelectKRewritePass
  * (reference: src/silo/query_engine/planner.cpp:54-71).
  */
object RelationalOps {

  /** `nOf(count, {children}, matchExactly)` — at-least-k (or exactly-k) of n
    * predicates (reference: src/silo/query_engine/scalar_expressions/nof.cpp,
    * physical Threshold operator filter/operators/threshold.h:13-40).
    * Expressed as a codegen-friendly sum of indicator columns, so it stays
    * inside WholeStageCodegen — no UDF, no shuffle.
    */
  def nOf(k: Int, children: Seq[Column], matchExactly: Boolean = false): Column = {
    val s = children.map(c => when(c, 1).otherwise(0)).reduce(_ + _)
    if (matchExactly) s === k else s >= k
  }

  /** `randomize([seed])` — deterministic shuffle (reference:
    * src/silo/query_engine/operators/order_by_randomize.cpp:25-110: per-row
    * hash of (row ordinal, seed), then sort by it). We hash the row's primary
    * key with the seed; md5 is used (rather than xxhash64) so a SQL oracle on
    * any engine reproduces the exact ordering. Total sort = one shuffle,
    * same as any orderBy; at scale this is a range-partitioned sort on a
    * uniformly distributed key — no skew by construction.
    */
  def randomizeKey(seed: Long, keyCols: Column*): Column =
    md5(concat_ws("_", (keyCols.map(_.cast("string")) :+ lit(seed.toString)): _*))

  /** Float/double `between` reproduces the reference's asymmetric semantics:
    * from-inclusive, to-EXCLUSIVE (reference: query_documentation.md:504,
    * scalar_expressions/float_between.cpp). Int/date between are inclusive
    * on both ends. Open bounds via None.
    */
  def floatBetween(c: Column, from: Option[Double], to: Option[Double]): Column = {
    val lo = from.map(c >= _).getOrElse(lit(true))
    val hi = to.map(c < _).getOrElse(lit(true))
    lo && hi
  }

  def intBetween(c: Column, from: Option[Long], to: Option[Long]): Column = {
    val lo = from.map(c >= _).getOrElse(lit(true))
    val hi = to.map(c <= _).getOrElse(lit(true))
    lo && hi
  }

  /** `at(input, position)` — 1-based character access; past-end yields ""
    * and null stays null (reference: scalar_expressions/at.cpp:1-39). Spark's
    * `substring` has exactly these semantics.
    */
  def at(c: Column, pos: Int): Column = substring(c, pos, 1)

  /** `isoWeek(input)` — ISO-8601 week number (reference:
    * scalar_expressions/iso_week.cpp). Spark's weekofyear IS ISO week.
    */
  def isoWeek(c: Column): Column = weekofyear(c)

  /** Two-phase salted aggregation for skewed keys: counts/sums first
    * aggregate on (key, salt) — spreading a hot key over `salts` reducers —
    * then re-aggregate on the key alone. Use when one grouping key carries
    * a disproportionate share of rows (AQE's skew handling covers joins,
    * not aggregations). Supports the additive aggregates the engine uses
    * (count via sum-of-partials).
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as("cnt"))
  }

  /** Salted equi-join for skewed keys (beyond-reference): the big side gets
    * a per-ROW salt in [0, salts) — derived from `rowHash`, which must vary
    * across rows sharing a join key, NOT from the key itself — and the small
    * side is replicated once per salt value. Joining on (key, salt) spreads
    * a hot key's rows over `salts` reducers instead of funneling them into
    * one.
    *
    * When it matters at 100 TB: the small side is too big to broadcast
    * (so the join must shuffle) and the big side's key distribution is
    * skewed. AQE's skew-join split handles the sort-merge case after the
    * fact; salting bakes the spread into the plan and also covers
    * shuffle-hash joins and the partial-aggregation that follows. The
    * replication cost is |small| × salts — keep `salts` at the skew factor,
    * not the parallelism.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      salts: Int, rowHash: Column): DataFrame = {
    val b = big.withColumn("__salt", pmod(rowHash, lit(salts)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Interval (range) join re-expressed as an equi-join (beyond-reference):
    * attach to every point row the interval rows with `lo <= point < hi`.
    * A naive `p >= lo && p < hi` join has no equi-key, so Spark plans a
    * nested loop — quadratic at scale. Instead each interval is exploded
    * into the fixed-width bins it overlaps, points are tagged with their
    * bin, and the join becomes `bin = bin` plus a residual range filter.
    *
    * Scale shape: one equi-join shuffle (or a broadcast hash join when the
    * exploded interval side is small); interval fan-out is bounded by
    * span/binWidth + 1, so `binWidth` should be chosen near the TYPICAL
    * interval span — fan-out stays O(1) per interval and the bin key is
    * uniformly distributed when points are.
    *
    * Both sides' range columns must be integral (cast timestamps to
    * epoch micros first). Output: all point columns + all interval columns.
    */
  def rangeJoinBinned(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val iv = intervals
      // [lo, hi): the last covered unit is hi-1, so empty intervals vanish
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bin",
        explode(sequence(floor(col(loCol) / binWidth).cast("long"),
          floor((col(hiCol) - 1) / binWidth).cast("long"))))
    points
      .withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** As-of join (beyond-reference; a training-data/event-pipeline staple the
    * reference's single hash-join surface cannot express): for every left
    * row, attach the right row with the greatest `rTs ≤` the left row's
    * `lTs` within the same key — "most recent prior fact".
    *
    * Scale shape: the classic union + running-max formulation — ONE shuffle
    * on the key (the window sort), never a per-row range probe or an
    * inequality join (which Spark would plan as a nested loop). Right rows
    * ride the same partition-and-sort as left rows; a running `max(struct
    * (ts, payload))` over the time-ordered window carries the latest right
    * payload forward to each left row. Right rows are pre-aggregated to one
    * per (key, ts) (max payload — deterministic tie-break), so window-frame
    * tie order cannot affect results.
    *
    * Output: all left columns + `asof_ts` + `asof_<payload>` (null when no
    * right row precedes the left row).
    */
  def asofJoin(
      left: DataFrame, lKey: String, lTs: String,
      right: DataFrame, rKey: String, rTs: String, rPayload: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lCols = left.columns.toSeq
    val payT = right.schema(rPayload).dataType
    // null-key/null-ts right rows can never satisfy `rKey = lKey AND
    // rTs <= lTs` (SQL join semantics) — drop them BEFORE the union, or the
    // window (which groups nulls together) would hand them to left rows
    val r = right
      .filter(col(rKey).isNotNull && col(rTs).isNotNull)
      .groupBy(col(rKey).as("__key"), col(rTs).as("__ts"))
      .agg(max(col(rPayload)).as("__pay"))
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__key", col(lKey)).withColumn("__ts", col(lTs))
      .withColumn("__pay", lit(null).cast(payT))
      .withColumn("__side", lit(1))
    val rAligned = lCols.foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val ordered = Seq("__key", "__ts", "__pay", "__side") ++ lCols
    val u = l.select(ordered.map(col): _*)
      .unionByName(rAligned.select(ordered.map(col): _*))
    // rights sort before lefts at equal ts (side 0 < 1) → "≤" semantics
    val w = Window.partitionBy("__key").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("__asof",
        max(when(col("__side") === 0,
          struct(col("__ts").as("ts"), col("__pay").as("pay")))).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++ Seq(
        col("__asof.ts").as("asof_ts"),
        col("__asof.pay").as(s"asof_$rPayload")): _*)
  }

  /** `updateColumn(table, column, literal, filter)` — scalar column update
    * (reference: database.h:77-88, query_engine/scalar_column_update.cpp;
    * restricted there to INT32/FLOAT/DATE32/BOOL). Spark-first this is a
    * conditional projection followed by a versioned rewrite
    * (graft.sources.NdjsonIngest.appendVersion) — MERGE semantics without
    * mutating files in place.
    */
  def updateColumn(df: DataFrame, column: String, value: Column, where: Column): DataFrame =
    df.withColumn(column, when(where, value).otherwise(col(column)))

  /** `schema(input)` pipeline-breaker (reference:
    * operators/schema_node.cpp): rows of {fieldName, type} using the
    * reference's type vocabulary (database_schema.h:20-31).
    */
  def schemaOf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    schemaRows(df).toDF("field_name", "field_type")
  }

  /** The {fieldName, type} rows of a frame's schema, in column order. */
  def schemaRows(df: DataFrame): Seq[(String, String)] = {
    import org.apache.spark.sql.types._
    df.schema.fields.toSeq.map { f =>
      val t = f.dataType match {
        case StringType              => "STRING"
        case IntegerType             => "INT32"
        case LongType                => "INT64"
        case DoubleType | FloatType  => "FLOAT"
        case BooleanType             => "BOOL"
        case DateType                => "DATE32"
        case TimestampType           => "DATE32"
        case TimestampNTZType        => "DATE32"
        case other                   => other.simpleString.toUpperCase
      }
      (f.name, t)
    }
  }
}
