package graft.operators

/** The crash-safe LAYER-CHAIN protocol shared by the persisted band
  * indexes ([[DedupIndex]], [[SimHashIndex]]): a `meta` pointer file
  * (format marker + committed layer list, written tmp+rename so the
  * commit is atomic) over append-only `bands/layer=N` parquet dirs.
  * Centralised so a fix to the commit protocol, the format guard, or the
  * orphan-aware numbering applies to every chain at once.
  */
private[operators] final class BandChain(kind: String, format: Int,
    legacyFormat: Int) {

  private def metaPath(dir: String) = java.nio.file.Paths.get(dir, "meta")

  /** Commit the layer ENTRY list (format marker first, pointer flip
    * LAST). An entry is `layerName` or `layerName\ttag1[,tag2…]` — the
    * tags record which change-feed commit ranges a layer covers, so a
    * replayed tick (crash between this commit and the consumer's cursor
    * advance) can be recognised and skipped instead of re-appending the
    * same batch as a duplicate layer.
    */
  def commitMeta(dir: String, layers: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(dir, ".meta.tmp")
    java.nio.file.Files.writeString(tmp,
      (s"format=$format" +: layers).mkString("\n"))
    java.nio.file.Files.move(tmp, metaPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Committed layer entries (name + optional tag suffix), exactly as
    * written — what a re-commit must carry forward so tags survive.
    * Empty when no meta exists. A meta written under a DIFFERENT
    * signature format throws — its layers can never equi-join correctly,
    * and a silent empty result would read as "no duplicates".
    */
  def entries(dir: String): Seq[String] =
    if (!java.nio.file.Files.exists(metaPath(dir))) Seq.empty
    else {
      val lines = java.nio.file.Files.readString(metaPath(dir))
        .split("\n").toSeq.filter(_.nonEmpty)
      val fmt = lines.headOption.filter(_.startsWith("format="))
        .map(_.stripPrefix("format=").toInt).getOrElse(legacyFormat)
      if (fmt != format)
        throw new IllegalStateException(
          s"$kind index at $dir uses signature format $fmt, engine expects " +
            s"$format — its band sigs can never match; delete and rebuild it")
      lines.drop(1)
    }

  /** Committed layer NAMES (tags stripped) — the `bands/layer=N` dirs. */
  def layers(dir: String): Seq[String] = entries(dir).map(nameOf)

  /** Every tag committed on any layer. */
  def tags(dir: String): Set[String] =
    entries(dir).flatMap(tagsOf).toSet

  def nameOf(entry: String): String = BandChain.nameOf(entry)

  def tagsOf(entry: String): Seq[String] = BandChain.tagsOf(entry)

  /** An entry line carrying `tags` (empty → bare name). */
  def entryOf(name: String, tags: Seq[String]): String =
    BandChain.entryOf(name, tags)

  /** Next layer number = 1 + max over BOTH committed meta and any orphan
    * on-disk `bands/layer=N` dir (a crash between the layer write and the
    * meta commit leaves one; numbering past it keeps the ErrorIfExists
    * write from failing every subsequent append).
    */
  def nextLayer(dir: String, committed: Seq[String]): String =
    BandChain.nextLayerIn(s"$dir/bands", committed)

  /** Delete on-disk `bands/layer=N` dirs NOT in the committed list — the
    * PHYSICAL cleanup half of a purge-compact. After the meta pointer
    * flip the superseded layers (still carrying tombstoned documents'
    * signatures) are unreachable by any NEW reader, but leaving them on
    * disk would grow storage unboundedly across compactions and keep
    * deleted-document data around indefinitely. Drain contract (same as
    * `NdjsonIngest.gcVersions`): a reader that resolved `meta` before
    * the flip may still be lazily scanning the old dirs, so callers run
    * this once those have drained — the corpus consumer runs it at the
    * start of every POLL (a one-poll drain window, even when the feed is
    * idle). Returns the deleted dir names.
    */
  def gcLayers(dir: String, committed: Seq[String]): Seq[String] =
    BandChain.gcLayerDirs(s"$dir/bands", committed)
}

private[graft] object BandChain {

  def nameOf(entry: String): String = entry.split('\t').head

  def tagsOf(entry: String): Seq[String] =
    entry.split('\t').drop(1).headOption
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)

  /** An entry line carrying `tags` (empty → bare name). */
  def entryOf(name: String, tags: Seq[String]): String =
    if (tags.isEmpty) name else name + "\t" + tags.mkString(",")

  /** The chain's covered feed watermark: the max `to` over `feed:a-b`
    * tags, floored at `floor` (the consumer's durable cursor — completed
    * non-insert ticks are covered by the cursor even though their
    * rebuild appends carry no tag).
    */
  def coveredTo(tags: Set[String], floor: Long): Long =
    tags.collect {
      case t if t.startsWith("feed:") =>
        t.stripPrefix("feed:").split("-")(1).toLong
    }.foldLeft(floor)(math.max)

  /** Tags a FOLDED layer should carry: feed coverage is monotone, so
    * only the newest feed tag matters — carrying the whole history would
    * grow the meta line unboundedly with tick count. Non-feed tags pass
    * through.
    */
  def pruneFeedTags(tags: Seq[String]): Seq[String] = {
    val (feeds, others) = tags.partition(_.startsWith("feed:"))
    others ++ feeds.sortBy(_.stripPrefix("feed:").split("-")(1).toLong)
      .lastOption
  }

  /** Next layer number = 1 + max over BOTH the committed list and any
    * orphan on-disk `layer=N` child of `parent` (a crash between the
    * layer write and the meta commit leaves one; numbering past it keeps
    * the ErrorIfExists write from failing every subsequent append).
    * Shared with the ANN codes chain (`codes/` parent).
    */
  def nextLayerIn(parent: String, committed: Seq[String]): String = {
    val onDisk = Option(new java.io.File(parent).listFiles())
      .getOrElse(Array.empty)
      .flatMap(f => Option(f.getName).filter(_.startsWith("layer="))
        .flatMap(n => n.stripPrefix("layer=").toLongOption))
    ((committed.map(_.toLong) ++ onDisk).foldLeft(0L)(math.max) + 1).toString
  }

  /** Delete `layer=N` children of `parent` whose N is not in `committed`
    * (shared with the ANN codes chain, whose layers live under `codes/`).
    */
  def gcLayerDirs(parent: String, committed: Seq[String]): Seq[String] = {
    val keep = committed.map(l => s"layer=$l").toSet
    val dead = Option(new java.io.File(parent).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("layer=") && !keep(f.getName))
      .toSeq
    dead.foreach { d =>
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    dead.map(_.getName)
  }
}
