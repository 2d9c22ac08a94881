package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark DataFrame builder plus (usually)
  * an equivalent ANSI SQL text the driver runs in DuckDB on the same parquet
  * tables. Column names and row order must match exactly — every query
  * carries a total ORDER BY so both engines emit identical, deterministic
  * results.
  */
final case class QDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QDef =
    QDef(name, build, Some(oracle))

  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): QDef =
    QDef(name, build, None)
}
