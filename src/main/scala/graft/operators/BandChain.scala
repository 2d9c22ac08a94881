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

  /** Commit the layer list (format marker first, pointer flip LAST). */
  def commitMeta(dir: String, layers: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(dir, ".meta.tmp")
    java.nio.file.Files.writeString(tmp,
      (s"format=$format" +: layers).mkString("\n"))
    java.nio.file.Files.move(tmp, metaPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Committed layers; empty when no meta exists. A meta written under a
    * DIFFERENT signature format throws — its layers can never equi-join
    * correctly, and a silent empty result would read as "no duplicates".
    */
  def layers(dir: String): Seq[String] =
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

  /** Next layer number = 1 + max over BOTH committed meta and any orphan
    * on-disk `bands/layer=N` dir (a crash between the layer write and the
    * meta commit leaves one; numbering past it keeps the ErrorIfExists
    * write from failing every subsequent append).
    */
  def nextLayer(dir: String, committed: Seq[String]): String = {
    val bands = new java.io.File(s"$dir/bands")
    val onDisk = Option(bands.listFiles()).getOrElse(Array.empty)
      .flatMap(f => Option(f.getName).filter(_.startsWith("layer="))
        .flatMap(n => n.stripPrefix("layer=").toLongOption))
    ((committed.map(_.toLong) ++ onDisk).foldLeft(0L)(math.max) + 1).toString
  }
}
