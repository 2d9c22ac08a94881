package graft.trees

import scala.collection.mutable

/** Rooted phylogenetic tree attached to a string column — broadcast-sized
  * (reference: src/silo/common/phylo_tree.h, string_column.h:37,
  * documentation/phylogenetic_queries.md). Drives `phyloDescendantOf`
  * (filter), `mostRecentCommonAncestor` and `phyloSubtree`
  * (pipeline-breakers; operators/most_recent_common_ancestor_node.cpp,
  * phylo_subtree_node.cpp).
  *
  * Tree operations run on the driver over the broadcast structure; only
  * the (small, distinct) filtered key set is collected — the row scan
  * itself stays distributed.
  */
final case class PhyloTree(parent: Map[String, String], root: String) {

  val children: Map[String, Seq[String]] = {
    val m = mutable.Map.empty[String, mutable.ListBuffer[String]]
    for ((c, p) <- parent.toSeq.sortBy(_._1)) m.getOrElseUpdate(p, mutable.ListBuffer.empty) += c
    m.view.mapValues(_.toList.sorted).toMap
  }

  def contains(n: String): Boolean = n == root || parent.contains(n)

  def pathToRoot(n: String): List[String] = {
    val b = mutable.ListBuffer(n)
    var cur = n
    while (cur != root) { cur = parent(cur); b += cur }
    b.toList
  }

  def depth(n: String): Int = pathToRoot(n).length - 1

  def descendants(n: String): Set[String] = {
    val out = mutable.Set(n)
    val stack = mutable.Stack(n)
    while (stack.nonEmpty)
      children.getOrElse(stack.pop(), Nil).foreach { c => out += c; stack.push(c) }
    out.toSet
  }

  /** MRCA of the in-tree subset of `names`; None if none are in the tree.
    * Returns (mrca, missingCount) (reference MRCA node output fields:
    * mrcaNode, missingNodeCount).
    */
  def mrca(names: Set[String]): (Option[String], Int) = {
    val inTree = names.filter(contains)
    val missing = names.size - inTree.size
    if (inTree.isEmpty) return (None, missing)
    val paths = inTree.map(pathToRoot(_).reverse) // root-first
    val minLen = paths.map(_.length).min
    var i = 0
    var last = root
    var stop = false
    while (i < minLen && !stop) {
      val heads = paths.map(_(i))
      if (heads.size == 1) { last = heads.head; i += 1 } else stop = true
    }
    (Some(last), missing)
  }

  /** Newick string of the induced subtree of `names` rooted at the tree
    * root. `contractUnary` splices out internal pass-through nodes (a
    * non-selected internal node with exactly one child in the induced
    * subtree); the root is never contracted (reference:
    * phylo_subtree_node.cpp, contractUnaryNodes option). Children are
    * emitted in sorted label order for determinism.
    */
  def subtreeNewick(names: Set[String], contractUnary: Boolean = true): String = {
    val keep = names.filter(contains).flatMap(pathToRoot(_)).toSet + root
    def emit(n: String, isRoot: Boolean): Option[String] = {
      val kids = children.getOrElse(n, Nil).filter(keep)
        .flatMap(c => emit(c, isRoot = false))
      kids match {
        case Nil => Some(n)
        case one :: Nil if contractUnary && !isRoot && !names.contains(n) => Some(one)
        case ks  => Some(ks.sorted.mkString("(", ",", s")$n"))
      }
    }
    emit(root, isRoot = true).getOrElse(root) + ";"
  }
}

object PhyloTree {
  /** Build from (child, parent) edges; the unique parentless node is root. */
  def fromEdges(edges: Seq[(String, String)]): PhyloTree = {
    val parent = edges.toMap
    val roots = (parent.values.toSet -- parent.keySet).toSeq
    require(roots.size == 1, s"expected a single root, got $roots")
    PhyloTree(parent, roots.head)
  }

  /** Parse a Newick tree string: `subtree := leaf | '(' subtree (','
    * subtree)* ')' [label]`, each optionally followed by `:length` (branch
    * lengths are parsed and discarded — topology queries don't use them).
    * Unlabeled internal nodes get synthetic `@k` names; an unlabeled root
    * becomes "root" (reference trees: documentation/phylogenetic_queries.md,
    * Newick/Auspice inputs).
    */
  def fromNewick(newick: String): PhyloTree = {
    val s = newick.trim.stripSuffix(";")
    var i = 0
    var anon = 0
    def readLabel(): String = {
      val start = i
      while (i < s.length && !",():;".contains(s(i))) i += 1
      s.substring(start, i).trim
    }
    def skipLength(): Unit =
      if (i < s.length && s(i) == ':') { i += 1; readLabel(); () }
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    val edges = Seq.newBuilder[(String, String)]
    def node(): String = {
      ws()
      if (i < s.length && s(i) == '(') {
        i += 1
        val kids = Seq.newBuilder[String]
        kids += node()
        ws()
        while (i < s.length && s(i) == ',') { i += 1; kids += node(); ws() }
        require(i < s.length && s(i) == ')', s"unbalanced newick at $i")
        i += 1
        var label = readLabel()
        if (label.isEmpty) { label = s"@$anon"; anon += 1 }
        skipLength()
        kids.result().foreach(k => edges += (k -> label))
        label
      } else {
        val label = readLabel()
        require(label.nonEmpty, s"empty leaf label at $i")
        skipLength()
        label
      }
    }
    val top = node()
    require(i >= s.length, s"trailing newick input at offset $i")
    val root = if (top.startsWith("@")) "root" else top
    val built = edges.result().map { case (c, p) =>
      (c, if (p == top && top.startsWith("@")) root else p)
    }
    fromEdges(built)
  }
}
