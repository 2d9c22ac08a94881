package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (`Array[Float]` columns) built from
  * higher-order functions (`zip_with`/`aggregate`) — codegen'd, no UDFs.
  * Arithmetic is done in Double with a strict left-to-right fold so any SQL
  * oracle computing `list_sum(list_transform(...))` sequentially reproduces
  * the exact same IEEE result.
  */
object VectorFunctions {

  /** Codegen'd strict left-fold dot product (see [[VecDot]]). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(VecDot(GraftShims.expression(a), GraftShims.expression(b)))
  }

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine rounded to 6 dp — the canonical comparison/threshold form (keeps
    * cross-engine float drift out of threshold decisions).
    */
  def cosineR(a: Column, b: Column): Column = round(cosine(a, b), 6)

  /** Random-hyperplane LSH bucket id: sign bits of dot products against
    * `planes` (a deterministic pseudo-random matrix derived from md5 — see
    * Similarity.hyperplanes), packed into a long. Vectors in the same bucket
    * are ANN candidates; cross-bucket pairs are pruned before any shuffle-
    * heavy pairwise join. This is the scale path: at 100 TB the pairwise
    * join only happens within buckets.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Collect a BOUNDED probe set as (id, vector-of-doubles), sorted by id,
    * regardless of the stored element type — float elements widen exactly,
    * so downstream double arithmetic (LUTs, probe-cell ranking, typed
    * literals) is bit-identical whether the parquet writer produced
    * `array<float>` (today's layout) or `array<double>`. The round-8
    * lesson (the harness regenerating testdata with a different physical
    * type) applied to the embeddings table.
    */
  def collectProbes(df: DataFrame, idCol: String, vecCol: String): Seq[(Long, Array[Double])] =
    df.select(col(idCol), col(vecCol)).collect().toSeq
      .map(r => (r.getLong(0),
        r.getSeq[Number](1).map(_.doubleValue()).toArray))
      .sortBy(_._1)
}
