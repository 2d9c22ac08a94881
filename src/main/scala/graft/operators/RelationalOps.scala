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
