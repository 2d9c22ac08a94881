package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a MATERIALIZED JOIN VIEW over two
  * versioned append-only tables: `V = A ⋈_key B`, kept fresh commit-by-
  * commit from the tables' change feeds instead of re-joining the world.
  *
  * Delta-join algebra (insert-only inputs): with A = A_old ∪ ΔA and
  * B = B_old ∪ ΔB,
  *
  *   ΔV = (ΔA ⋈ B_head) ∪ (A_old ⋈ ΔB)
  *
  * covers every new pair exactly once — new×old and new×new ride the
  * first term, old×new the second, and the two terms are disjoint
  * because their left inputs are. Each refresh therefore joins only the
  * DELTAS against one full side; the delta side is broadcast, so the
  * full side is ONE linear pruned scan with no shuffle — at 100 TB a
  * daily 0.1% append costs 0.1%-sized broadcasts, never a fact×fact
  * shuffle. This is the join-side twin of [[IncrementalAgg]] (both are
  * the incremental-view-maintenance counterpart of the reference's
  * chunk-wise derived-state extension on appendData,
  * storage/table.cpp bulkInsert → sequence_column.h:147-163).
  *
  * The view is itself a versioned table ([[NdjsonIngest]] layer chain),
  * so downstream consumers time-travel/compact/gc it like any other.
  * Refresh CURSORS (the input commit seqs the view reflects) ride in the
  * view's commit TAG (`ij2:<aSeq>:<bSeq>`) — tag and layer list flip in
  * the same pointer rename, so the view content and its cursor are
  * atomic: a crash either commits both or neither, and a replayed
  * refresh sees up-to-date cursors and no-ops. View rows get the
  * synthetic pk `<aPk>:<bPk>` (unique for a keyed inner join), letting
  * the normal dup-pk guard catch a double-applied delta loudly.
  *
  * Inputs must be INSERT-ONLY over the refreshed range (append/compact
  * commits; a snapshot only as the table's very first commit). Upserts,
  * deletes, or a mid-life snapshot reset make the delta algebra above
  * unsound — refresh detects them from the commit log (metadata only)
  * and aborts with instructions to [[rebuild]].
  */
object IncrementalJoin {

  // tag prefix doubles as the __vid ENCODING version: "ij2" = escaped
  // separators. A view committed under the old raw-concat encoding must
  // not keep refreshing — its stored vids would no longer match the
  // guard's, silently disarming the dup-pk check for ':'-bearing keys.
  private val TagPrefix = "ij2"

  private def cursors(viewDir: String): (Long, Long) =
    NdjsonIngest.latestTag(viewDir) match {
      case Some(t) if t.startsWith(s"$TagPrefix:") =>
        val parts = t.split(":")
        (parts(1).toLong, parts(2).toLong)
      case Some(t) if t.startsWith("ij:") =>
        throw new IllegalStateException(
          s"view at $viewDir predates the vid-encoding change (tag '$t'); " +
            "rebuild() it before refreshing")
      case _ => (0L, 0L)
    }

  private def head(tableDir: String): Long =
    NdjsonIngest.commits(tableDir).lastOption.getOrElse(0L)

  /** Abort unless every commit in `(from, to]` keeps the insert-only
    * delta algebra sound. Metadata-only: reads log entries, no data.
    */
  private def checkInsertOnly(tableDir: String, from: Long, to: Long): Unit =
    ((from + 1) to to).foreach { seq =>
      val kind = NdjsonIngest.logEntry(tableDir, seq)._2
      val ok = kind == "append" || kind == "compact" ||
        (kind == "snapshot" && seq == 1L)
      require(ok,
        s"incremental join: commit $seq of $tableDir is '$kind' — the " +
          "insert-only delta algebra can't absorb it; rebuild() the view")
    }

  private def strip(changes: DataFrame): DataFrame =
    changes.drop("_change_type", "_commit")

  // '\'-escape both separators inside the key values so ("a:b","c") and
  // ("a","b:c") encode to distinct vids — a raw concat collides on string
  // keys containing ':' and trips the dup-pk guard on a legitimate delta
  private def escVid(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "([\\\\:])", "\\\\$1")

  private def withVid(df: DataFrame, aPk: String, bPk: String): DataFrame =
    df.withColumn("__vid",
      concat_ws(":", escVid(col(aPk).cast("string")),
        escVid(col(bPk).cast("string"))))

  /** Advance the view to the inputs' current heads. Returns the view
    * commit, or None when the view is already fresh. The first refresh
    * (no cursors yet) bootstraps the view as ΔA = all of A. Requires the
    * cursor commits to still be within both inputs' gc retention
    * windows (the change feed refuses a gc'd range loudly).
    *
    * Shared column names other than `key` would collide in the view —
    * callers rename before materializing, same contract as the SaneQL
    * join (reference: disjoint-column join check).
    */
  def refresh(spark: SparkSession, viewDir: String, aDir: String,
      bDir: String, key: String, aPk: String, bPk: String): Option[Long] = {
    val (headA, headB) = (head(aDir), head(bDir))
    val (lastA, lastB) = cursors(viewDir)
    require(lastA <= headA && lastB <= headB,
      s"incremental join: view cursors ($lastA,$lastB) are ahead of the " +
        s"input heads ($headA,$headB) — inputs were reset; rebuild() the view")
    if (headA == lastA && headB == lastB) return None
    // B has no commits yet: no pairs can exist, and readCommit(bDir, 0)
    // below would throw on the missing log entry — wait for B's first commit
    if (headB == 0L) return None
    checkInsertOnly(aDir, lastA, headA)
    checkInsertOnly(bDir, lastB, headB)

    val bHead = NdjsonIngest.readCommit(spark, bDir, headB)
    val newFromA =
      if (headA == lastA) None
      else {
        val dA = strip(NdjsonIngest.readChanges(spark, aDir, aPk, lastA, headA))
        Some(bHead.join(broadcast(dA), key).select(
          viewColumns(dA, bHead, key).map(col): _*))
      }
    val newFromB =
      if (headB == lastB || lastA == 0L) None
      else {
        val dB = strip(NdjsonIngest.readChanges(spark, bDir, bPk, lastB, headB))
        val aOld = NdjsonIngest.readCommit(spark, aDir, lastA)
        Some(aOld.join(broadcast(dB), key).select(
          viewColumns(aOld, dB, key).map(col): _*))
      }
    val terms = newFromA.toSeq ++ newFromB.toSeq
    if (terms.isEmpty) return None // only an empty input moved: nothing to join
    val delta = terms.reduce(_.unionByName(_))
    val tagged = Some(s"$TagPrefix:$headA:$headB")
    val commit =
      if (!NdjsonIngest.hasLatest(viewDir))
        NdjsonIngest.appendVersion(withVid(delta, aPk, bPk), viewDir, "__vid",
          tag = tagged)
      else
        NdjsonIngest.appendDelta(withVid(delta, aPk, bPk), viewDir, "__vid",
          tag = tagged)
    Some(commit)
  }

  /** The view's column order: all of A, then B's non-key columns —
    * stable regardless of which side was the delta in a given term.
    */
  private def viewColumns(a: DataFrame, b: DataFrame, key: String): Seq[String] =
    (Seq(key) ++ a.columns.filterNot(_ == key) ++
      b.columns.filterNot(_ == key)).toSeq

  /** Re-materialize the view from scratch as a snapshot commit (chain
    * resets; old layers stay readable until gc). The escape hatch for
    * inputs that broke the insert-only contract.
    */
  def rebuild(spark: SparkSession, viewDir: String, aDir: String,
      bDir: String, key: String, aPk: String, bPk: String): Long = {
    val (headA, headB) = (head(aDir), head(bDir))
    val a = NdjsonIngest.readCommit(spark, aDir, headA)
    val b = NdjsonIngest.readCommit(spark, bDir, headB)
    val full = a.join(b, key).select(viewColumns(a, b, key).map(col): _*)
    NdjsonIngest.appendVersion(withVid(full, aPk, bPk), viewDir, "__vid",
      tag = Some(s"$TagPrefix:$headA:$headB"))
  }

  /** The materialized view as of its last refresh (minus bookkeeping). */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    NdjsonIngest.readLatest(spark, viewDir).drop("__vid")
}
