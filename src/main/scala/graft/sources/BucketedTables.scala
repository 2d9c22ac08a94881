package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed parquet layout for co-located joins — the storage-side answer
  * to repeated same-key joins at 100 TB.
  *
  * The reference never shuffles for a join: every column of a row lives in
  * the same single-node column store, so "join by primary key" is pointer
  * arithmetic (SURVEY.md §1.1 — one table partition owns a row's scalars,
  * sequences and bitmaps together). On a cluster the same workloads —
  * documents ⋈ per-doc features, sequences ⋈ posting hits, any
  * star-schema PK⋈FK — pay a full shuffle of BOTH sides on every query
  * unless the layout already agrees with the join key.
  *
  * Bucketing is Spark's serialized hash-partitioning: `bucketBy(n, key)`
  * hashes rows into `n` files per partition at WRITE time and records the
  * layout in the catalog, so any later join/aggregation on `key` between
  * tables bucketed with the same `n` reads aligned buckets directly —
  * SortMergeJoin with ZERO Exchange on either side (verified in
  * `BucketingSpec`). Pay one shuffle once, at ingest; every downstream
  * query of the fact table skips it. `sortBy(key)` additionally makes each
  * bucket file key-sorted so the merge side needs no per-query sort.
  *
  * This complements, not replaces, the version-directory layout of
  * `NdjsonIngest`: bucketed tables are for hot fact tables with a dominant
  * join key; plain version dirs remain the default for scan-shaped access.
  */
object BucketedTables {

  /** Write `df` as a bucketed, bucket-sorted external parquet table
    * registered under `name` at `path`. `buckets` should be sized so one
    * bucket of the LARGEST co-bucketed table fits an executor's memory
    * comfortably (at 100 TB that means thousands of buckets; both join
    * sides must use the same count).
    */
  def write(df: DataFrame, name: String, path: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)
}
