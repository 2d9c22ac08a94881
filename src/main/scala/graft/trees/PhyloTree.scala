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
  *
  * `children` preserves DECLARATION order (parse order of the Newick/
  * Auspice source) and `branchLen` the parsed branch lengths, because the
  * reference's subtree serialization is sensitive to both: newickJoin
  * walks children in reverse declaration order and re-emits `:length`
  * suffixes (phylo_tree.cpp:508-536).
  */
final case class PhyloTree(
    parent: Map[String, String], root: String,
    children: Map[String, Seq[String]],
    branchLen: Map[String, Float] = Map.empty) {

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

  /** C++ `oss << float` formatting: %g-style, 6 significant digits,
    * trailing zeros stripped (the reference streams branch lengths through
    * a default-precision ostringstream, phylo_tree.cpp:524-527).
    */
  private def fmtLen(v: Float): String = {
    val s = String.format(java.util.Locale.ROOT, "%.6g", Double.box(v.toDouble))
    def stripZeros(m: String): String =
      if (m.contains('.')) {
        val t = m.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t.dropRight(1) else t
      } else m
    val eIdx = s.indexWhere(c => c == 'e' || c == 'E')
    if (eIdx >= 0) stripZeros(s.substring(0, eIdx)) + s.substring(eIdx)
    else stripZeros(s)
  }

  /** Newick string of the induced subtree of the IN-TREE subset of
    * `names`, rooted at their MRCA — reference-exact
    * (phylo_tree.cpp:552-633 toNewickString/partialNewickString):
    *  - empty in-tree selection → "", single value → "name;";
    *  - otherwise the MRCA labels the outermost group, children emit in
    *    REVERSE declaration order, each with its `:branchLength` suffix;
    *  - `contractUnary` splices out pass-through internal nodes, ADDING
    *    their branch lengths (addBranchLengths); with it off they stay as
    *    `(child)self`;
    *  - only LEAF nodes are matched against the selection (internal-node
    *    values influence the MRCA but never emit as fragments).
    */
  def subtreeNewick(names: Set[String], contractUnary: Boolean = true): String = {
    val inTree = names.filter(contains)
    if (inTree.isEmpty) return ""
    if (inTree.size == 1) return inTree.head + ";"
    val m = mrca(inTree)._1.get
    partial(m, inTree, contractUnary) match {
      case Some((frag, _)) => frag + ";"
      case None => ""
    }
  }

  private def addLen(a: Option[Float], b: Option[Float]): Option[Float] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(x + y)
      case (x, y) => x.orElse(y)
    }

  /** (fragment, branch length) of `n`'s induced subtree, None if no
    * selected leaf survives below (≙ partialNewickString).
    */
  private def partial(n: String, filter: Set[String],
      contract: Boolean): Option[(String, Option[Float])] = {
    val kids = children.getOrElse(n, Nil)
    if (kids.isEmpty) {
      if (filter(n)) Some((n, branchLen.get(n))) else None
    } else {
      val rs = kids.flatMap(partial(_, filter, contract))
      if (rs.isEmpty) None
      else if (rs.size == 1 && contract)
        Some((rs.head._1, addLen(rs.head._2, branchLen.get(n))))
      else Some((join(rs, n), branchLen.get(n)))
    }
  }

  private def join(rs: Seq[(String, Option[Float])], self: String): String =
    rs.reverse.map { case (f, bl) =>
      f + bl.map(l => ":" + fmtLen(l)).getOrElse("")
    }.mkString("(", ",", ")" + self)
}

object PhyloTree {
  /** Build from (child, parent) edges; the unique parentless node is root.
    * Child order under a parent = edge declaration order.
    */
  def fromEdges(edges: Seq[(String, String)],
      lengths: Map[String, Float] = Map.empty): PhyloTree = {
    // dedup, keeping first occurrence: `edges.toMap` would silently hide a
    // duplicated (child, parent) pair while the declaration-order children
    // list repeated the child — subtreeNewick would emit it twice
    val uniq = edges.distinct
    val parent = uniq.toMap
    require(parent.size == uniq.size,
      s"node with multiple parents in phylo edges")
    val roots = (parent.values.toSet -- parent.keySet).toSeq
    require(roots.size == 1, s"expected a single root, got $roots")
    val order = mutable.LinkedHashMap.empty[String, mutable.ListBuffer[String]]
    for ((c, p) <- uniq) order.getOrElseUpdate(p, mutable.ListBuffer.empty) += c
    PhyloTree(parent, roots.head,
      order.view.mapValues(_.toList).toMap, lengths)
  }

  /** Parse a Newick tree string: `subtree := leaf | '(' subtree (','
    * subtree)* ')' [label]`, each optionally followed by `:length`
    * (branch lengths are kept — the subtree serialization re-emits them).
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
    def readLength(): Option[Float] =
      if (i < s.length && s(i) == ':') { i += 1; Some(readLabel().toFloat) }
      else None
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    val edges = Seq.newBuilder[(String, String)]
    val lens = Map.newBuilder[String, Float]
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
        readLength().foreach(l => lens += label -> l)
        kids.result().foreach(k => edges += (k -> label))
        label
      } else {
        val label = readLabel()
        require(label.nonEmpty, s"empty leaf label at $i")
        readLength().foreach(l => lens += label -> l)
        label
      }
    }
    val top = node()
    require(i >= s.length, s"trailing newick input at offset $i")
    val root = if (top.startsWith("@")) "root" else top
    val rename = (n: String) => if (n == top && top.startsWith("@")) root else n
    val built = edges.result().map { case (c, p) => (rename(c), rename(p)) }
    val lengths = lens.result().map { case (n, l) => rename(n) -> l }
    fromEdges(built, lengths)
  }

  /** Parse an Auspice JSON (v2) phylogenetic tree — the Nextstrain
    * ecosystem's tree format, the reference's second accepted input
    * (phylo_tree.cpp fromAuspiceJSONString:275, parseAuspiceTree:71-108;
    * documentation/phylogenetic_queries.md:11). Reference-exact contract:
    * the document must carry a `tree` entry; every node a `name` (which
    * becomes the node id); `node_attrs.div`, when present, is stored
    * VERBATIM as the node's branch length — note real Auspice `div` is
    * cumulative divergence from the root, and the reference makes the
    * same verbatim read (`node->branch_length = json["node_attrs"]
    * ["div"]`, phylo_tree.cpp:87-89), so we mirror it exactly rather
    * than differencing parent/child div; `children` parse in
    * declaration order; a
    * DUPLICATE node name anywhere in the tree is an error (unique-label
    * validation — MRCA/subtree would silently misroute otherwise).
    * Jackson (on Spark's classpath) does the JSON lexing; the walk is
    * ours.
    */
  def fromAuspiceJson(json: String): PhyloTree = {
    import com.fasterxml.jackson.databind.JsonNode
    val doc =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(
            s"Invalid File: not parseable JSON: ${e.getOriginalMessage}")
      }
    val tree = Option(doc).map(_.get("tree")).orNull
    require(tree != null,
      "Invalid File: Auspice JSON does not contain a 'tree' entry")
    val edges = Seq.newBuilder[(String, String)]
    val lens = Map.newBuilder[String, Float]
    val seen = mutable.Set.empty[String]
    def walk(node: JsonNode, parentName: Option[String]): String = {
      val nameNode = node.get("name")
      require(nameNode != null && nameNode.isTextual,
        "Invalid File: Auspice JSON node does not contain a 'name' entry")
      val name = nameNode.asText()
      require(seen.add(name),
        s"Duplicate node ID found in Auspice JSON string: '$name'")
      Option(node.get("node_attrs")).flatMap(a => Option(a.get("div")))
        .filter(_.isNumber).foreach(d => lens += name -> d.floatValue())
      parentName.foreach(p => edges += (name -> p))
      Option(node.get("children")).foreach { cs =>
        require(cs.isArray, "Invalid File: Auspice 'children' must be an array")
        cs.forEach(c => { walk(c, Some(name)); () })
      }
      name
    }
    val root = walk(tree, None)
    val built = edges.result()
    if (built.isEmpty) PhyloTree(Map.empty, root, Map.empty, lens.result())
    else fromEdges(built, lens.result())
  }

  /** Extension-dispatched load, mirroring the reference's fromFile
    * (phylo_tree.cpp:378-394): `.nwk` → Newick, `.json` → Auspice v2,
    * anything else is a typed error.
    */
  def fromFile(path: java.nio.file.Path): PhyloTree = {
    val name = path.getFileName.toString.toLowerCase(java.util.Locale.ROOT)
    val text = java.nio.file.Files.readString(path)
    if (name.endsWith(".nwk")) fromNewick(text)
    else if (name.endsWith(".json")) fromAuspiceJson(text)
    else throw new IllegalArgumentException(
      s"Error when parsing tree file: '$path'. Path must end with .nwk or .json")
  }
}
