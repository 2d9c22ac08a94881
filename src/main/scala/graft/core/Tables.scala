package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over a test-data directory of parquet files.
  *
  * Mirrors the reference's `DatabaseSchema { map<TableName, TableSchema> }`
  * (reference: src/silo/schema/database_schema.h:171-177) — one immutable
  * parquet-backed DataFrame per named table. At scale this is a parquet
  * dataset per table (partitioned + versioned directories); locally it is a
  * single file per table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    // raw long (spark.sql.legacy.parquet.nanosAsLong=true, set by our
    // session builders). Normalize to a proper timestamp column here; the
    // `div` keeps the ns→µs conversion in exact integer arithmetic.
    if (df.schema.fields.exists(f =>
        f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
