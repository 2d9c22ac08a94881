package graft.trees

import scala.collection.mutable

/** Lineage DAG with recombinant (multi-parent) nodes — broadcast-sized
  * auxiliary structure, not a relation (reference:
  * src/silo/common/lineage_tree.h, storage/column/lineage_index.h:14-45,
  * documentation/lineage_definitions.md). The `lineage(column, value,
  * includeSublineages, recombinantFollowingMode)` filter becomes a
  * plan-time closure set + `isin`/broadcast semi-join — the Spark analog of
  * the reference's per-lineage Roaring bitmaps.
  */
final case class LineageTree(parents: Map[String, Seq[String]]) {

  /** All node names (parents and children). */
  val nodes: Set[String] = parents.keySet ++ parents.values.flatten

  val children: Map[String, Seq[String]] = {
    val m = mutable.Map.empty[String, mutable.ListBuffer[String]]
    for ((c, ps) <- parents.toSeq.sortBy(_._1); p <- ps)
      m.getOrElseUpdate(p, mutable.ListBuffer.empty) += c
    m.view.mapValues(_.toList).toMap
  }

  def isRecombinant(n: String): Boolean = parents.getOrElse(n, Nil).size > 1

  validateAcyclic()

  private def validateAcyclic(): Unit = {
    val state = mutable.Map.empty[String, Int] // 0 unseen, 1 in-stack, 2 done
    def visit(n: String): Unit = state.getOrElse(n, 0) match {
      case 1 => throw new IllegalArgumentException(s"lineage cycle at $n")
      case 2 =>
      case _ =>
        state(n) = 1
        children.getOrElse(n, Nil).foreach(visit)
        state(n) = 2
    }
    nodes.foreach(n => if (state.getOrElse(n, 0) == 0) visit(n))
  }

  import LineageTree._

  /** The clade of `root` (root included), honoring the recombinant edge
    * mode (reference: lineage_tree.h:33-37, query_documentation.md:550-567):
    *  - DoNotFollow: never enter a node through a recombinant edge
    *  - AlwaysFollow: include recombinants with ≥1 parent in the clade
    *  - FollowIfFullyContained: include recombinants only when ALL parents
    *    are already in the clade (fixpoint iteration — the clade can grow
    *    and unlock further recombinants)
    */
  def descendants(root: String, mode: RecombinantMode = DoNotFollow): Set[String] = {
    val clade = mutable.Set(root)
    var changed = true
    while (changed) {
      changed = false
      for (n <- clade.toSeq; c <- children.getOrElse(n, Nil) if !clade(c)) {
        val admit =
          if (!isRecombinant(c)) true
          else mode match {
            case DoNotFollow            => false
            case AlwaysFollow           => true
            case FollowIfFullyContained => parents(c).forall(clade)
          }
        if (admit) { clade += c; changed = true }
      }
    }
    clade.toSet
  }
}

object LineageTree {

  /** A parsed lineage definition: the tree plus alias → canonical-name map
    * (reference: documentation/lineage_definitions.md — aliases standardize
    * alternative names; queries may use either form).
    */
  final case class Definition(tree: LineageTree, aliases: Map[String, String]) {
    def canonical(name: String): String = aliases.getOrElse(name, name)
  }

  /** Parse the reference's lineage_definition.yaml shape:
    * ```
    * NAME: {}            # root
    * NAME:
    *   parents:
    *   - P1
    *   aliases:
    *   - ALT
    * ```
    * Only `parents` feed the tree; `aliases` map alternate names.
    */
  def fromYaml(lines: Seq[String]): Definition = {
    val parents = scala.collection.mutable.LinkedHashMap.empty[String, List[String]]
    val aliases = scala.collection.mutable.Map.empty[String, String]
    var current: String = null
    var section: String = null
    lines.foreach { raw =>
      val line = raw.replaceAll("#.*", "").stripTrailing()
      if (line.nonEmpty) {
        if (!line.startsWith(" ") && line.contains(":")) {
          current = line.takeWhile(_ != ':').trim
          parents.getOrElseUpdate(current, Nil)
          section = null
        } else if (line.trim == "parents:" || line.trim == "aliases:") {
          section = line.trim.stripSuffix(":")
        } else if (line.trim.startsWith("- ") && current != null) {
          val v = line.trim.drop(2).trim
          section match {
            case "parents" => parents(current) = parents(current) :+ v
            case "aliases" => aliases(v) = current
            case _ =>
          }
        }
      }
    }
    Definition(LineageTree(parents.toMap), aliases.toMap)
  }

  def fromYamlFile(path: String): Definition =
    fromYaml(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray(Array.empty[String]).toSeq)

  sealed trait RecombinantMode
  case object DoNotFollow extends RecombinantMode
  case object AlwaysFollow extends RecombinantMode
  case object FollowIfFullyContained extends RecombinantMode

  /** Build from a lineage-relation edge table: rows (lineage, parentOrNull)
    * (reference: lineage_definitions.md relation-table schema — one row per
    * lineage per direct parent).
    */
  def fromEdges(edges: Seq[(String, Option[String])]): LineageTree = {
    val m = edges.groupBy(_._1).map { case (c, es) =>
      c -> es.flatMap(_._2)
    }
    LineageTree(m)
  }
}
