package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.NdjsonIngest

/** CROSS-TABLE consistent snapshots: pin every versioned table of a
  * dataset at its current commit under ONE named, immutable snapshot
  * entry — the multi-table generalization of the reference's first-class
  * data version (database.h:89-96; its directory watcher swaps the WHOLE
  * database state, never one table at a time).
  *
  * Why it exists: a training run reading `documents` at commit 7 and
  * `embeddings` at commit 9 silently trains on rows whose embedding was
  * recomputed after the text changed. [[commit]] records the per-table
  * commit seqs in one atomically-renamed file; [[read]] reproduces
  * exactly that world-state months later (per-table time travel under a
  * single name), and [[pins]] feeds `NdjsonIngest.gcVersions(pinned=…)`
  * so retention can advance without eating a frozen run's data.
  *
  * Snapshot files are O(#tables) text — the data is never copied; layers
  * stay shared with the live table until every pinning snapshot is
  * [[drop]]ped and gc runs.
  */
object Snapshot {

  private def snapDir(dbDir: String) = java.nio.file.Paths.get(dbDir, "_snapshots")

  /** Record the CURRENT commit of every listed table (name → tableDir)
    * as one snapshot; returns its id.
    */
  def commit(dbDir: String, tables: Map[String, String]): Long = {
    val entries = tables.toSeq.sortBy(_._1).map { case (name, tdir) =>
      val seq = NdjsonIngest.commits(tdir).lastOption.getOrElse(
        throw new IllegalStateException(s"table $name at $tdir has no commits"))
      s"$name\t$tdir\t$seq"
    }
    java.nio.file.Files.createDirectories(snapDir(dbDir))
    val id = list(dbDir).lastOption.getOrElse(0L) + 1
    val tmp = snapDir(dbDir).resolve(s".$id.tmp")
    java.nio.file.Files.writeString(tmp, entries.mkString("\n"))
    java.nio.file.Files.move(tmp, snapDir(dbDir).resolve(id.toString),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    id
  }

  /** Snapshot ids, oldest first. */
  def list(dbDir: String): Seq[Long] = {
    val d = snapDir(dbDir).toFile
    Option(d.list()).getOrElse(Array())
      .flatMap(n => scala.util.Try(n.toLong).toOption).sorted.toSeq
  }

  private def entries(dbDir: String, id: Long): Seq[(String, String, Long)] = {
    val p = snapDir(dbDir).resolve(id.toString)
    require(java.nio.file.Files.exists(p), s"no snapshot $id under $dbDir")
    java.nio.file.Files.readString(p).linesIterator.filter(_.nonEmpty).map { l =>
      val Array(name, tdir, seq) = l.split("\t")
      (name, tdir, seq.toLong)
    }.toSeq
  }

  /** Every table of snapshot `id`, each at its pinned commit. Tables
    * maintained with merge-on-read upserts/deletes must appear in `pks`
    * (name → primary key) so their pinned chain resolves through
    * [[NdjsonIngest.readCommitMerged]] — the plain union reader would
    * resurrect overridden rows; append-only tables read as-is.
    */
  def read(spark: SparkSession, dbDir: String, id: Long,
      pks: Map[String, String] = Map.empty): Map[String, DataFrame] =
    entries(dbDir, id).map { case (name, tdir, seq) =>
      name -> (pks.get(name) match {
        case Some(pk) => NdjsonIngest.readCommitMerged(spark, tdir, pk, seq)
        case None => NdjsonIngest.readCommit(spark, tdir, seq)
      })
    }.toMap

  /** The commits every live snapshot pins for `tableDir` — pass to
    * `NdjsonIngest.gcVersions(tableDir, pinned = …)`.
    */
  def pins(dbDir: String, tableDir: String): Seq[Long] =
    list(dbDir).flatMap(id => entries(dbDir, id).collect {
      case (_, tdir, seq) if tdir == tableDir => seq
    }).distinct.sorted

  /** Delete snapshot `id`; its pins vanish from [[pins]] and the next gc
    * may reclaim the layers it froze.
    */
  def drop(dbDir: String, id: Long): Unit = {
    java.nio.file.Files.deleteIfExists(snapDir(dbDir).resolve(id.toString))
    ()
  }
}
