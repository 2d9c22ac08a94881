package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.trees._
import graft.trees.LineageTree._

class TreesSpec extends AnyFunSuite {

  //        root
  //       /    \
  //      A      B
  //     / \    /
  //    A1  A2 B1
  //         \ /
  //          X (recombinant: parents A2, B1)
  //          |
  //          X1
  val tree = LineageTree(Map(
    "A" -> Seq("root"), "B" -> Seq("root"),
    "A1" -> Seq("A"), "A2" -> Seq("A"), "B1" -> Seq("B"),
    "X" -> Seq("A2", "B1"), "X1" -> Seq("X")))

  test("descendants excluding recombinants (doNotFollow)") {
    assert(tree.descendants("A", DoNotFollow) === Set("A", "A1", "A2"))
  }

  test("alwaysFollow admits recombinants with one parent in clade") {
    assert(tree.descendants("A", AlwaysFollow) === Set("A", "A1", "A2", "X", "X1"))
  }

  test("followIfFullyContained requires all parents in clade") {
    assert(tree.descendants("A", FollowIfFullyContained) === Set("A", "A1", "A2"))
    // from root, both parents of X are eventually in the clade → X admitted
    assert(tree.descendants("root", FollowIfFullyContained)
      === Set("root", "A", "B", "A1", "A2", "B1", "X", "X1"))
  }

  test("cycle detection") {
    intercept[IllegalArgumentException] {
      LineageTree(Map("a" -> Seq("b"), "b" -> Seq("a")))
    }
  }

  val phylo = PhyloTree.fromEdges(Seq(
    "r1" -> "root", "r2" -> "root",
    "n1" -> "r1", "n2" -> "r1", "n3" -> "r2"))

  test("mrca: same subtree, cross subtree, single node, missing nodes") {
    assert(phylo.mrca(Set("n1", "n2")) === (Some("r1"), 0))
    assert(phylo.mrca(Set("n1", "n3")) === (Some("root"), 0))
    assert(phylo.mrca(Set("n2")) === (Some("n2"), 0))
    assert(phylo.mrca(Set("n1", "ghost")) === (Some("n1"), 1))
    assert(phylo.mrca(Set("ghost")) === (None, 1))
  }

  test("subtreeNewick with and without unary contraction") {
    // reference semantics (phylo_tree.cpp toNewickString): rooted at the
    // MRCA, children emitted in REVERSE declaration order
    assert(phylo.subtreeNewick(Set("n1", "n2", "n3")) ===
      "(n3,(n2,n1)r1)root;")
    assert(phylo.subtreeNewick(Set("n1", "n3")) === "(n3,n1)root;")
    assert(phylo.subtreeNewick(Set("n1", "n3"), contractUnary = false) ===
      "((n3)r2,(n1)r1)root;")
    // empty / single-value shapes (toNewickString early returns)
    assert(phylo.subtreeNewick(Set("ghost")) === "")
    assert(phylo.subtreeNewick(Set("n2", "ghost")) === "n2;")
    // selecting only nodes under one subtree roots the newick at THAT
    // subtree's MRCA, not the global root
    assert(phylo.subtreeNewick(Set("n1", "n2")) === "(n2,n1)r1;")
  }

  test("subtreeNewick branch lengths: emitted, summed under contraction") {
    val t = PhyloTree.fromNewick(
      "((a:0.1,b:0.25)ab:0.5,(c:0.0001)cc:0.125)root;")
    assert(t.branchLen("a") === 0.1f)
    // a,b: MRCA=ab; lengths re-emitted, reverse declaration order
    assert(t.subtreeNewick(Set("a", "b")) === "(b:0.25,a:0.1)ab;")
    // a,c with contraction: ab and cc are pass-throughs — the surviving
    // child's length ADDS the contracted node's (addBranchLengths):
    // c: 0.0001+0.125=0.1251, a: 0.1+0.5=0.6
    assert(t.subtreeNewick(Set("a", "c")) === "(c:0.1251,a:0.6)root;")
    // without contraction cc stays with its own length
    assert(t.subtreeNewick(Set("a", "c"), contractUnary = false) ===
      "((c:0.0001)cc:0.125,(a:0.1)ab:0.5)root;")
  }

  test("MrcaAggregator agrees with the driver-side walk") {
    val spark = SparkSpec.session
    import spark.implicits._
    val cases = Seq(
      Seq("n1", "n2"), Seq("n1", "n3"), Seq("n2"),
      Seq("n1", "ghost"), Seq("ghost"), Seq[String](),
      Seq("n1", null, "ghost", null))
    cases.foreach { names =>
      // null rows ride through as the sentinel (typed Aggregators never
      // see null inputs) — same coalesce the planner applies
      val out = names.map(n => if (n == null) MrcaAggregator.NullSentinel else n)
        .toDS()
        .select(new MrcaAggregator(phylo).toColumn).head()
      val (refM, refMissing) = phylo.mrca(names.filter(_ != null).toSet)
      assert(Option(out.mrca) === refM, s"names=$names")
      assert(out.missing.size === refMissing, s"names=$names")
      // null rows are counted separately (→ missingNodeCount), never named
      assert(out.nulls === names.count(_ == null).toLong, s"names=$names")
    }
  }

  test("Auspice JSON v2 tree equals its Newick equivalent structurally") {
    // the same tree as `phylo` + branch lengths, in both input formats
    // (reference parses either, phylo_tree.cpp:378-394). The fixture's
    // div values equal the Newick branch lengths because the reference
    // stores node_attrs.div VERBATIM as branch_length (phylo_tree.cpp:
    // 87-89 — real Auspice div is cumulative; we mirror the reference's
    // read exactly, so equality here is the parity contract)
    val newick = PhyloTree.fromNewick("((n1:0.5,n2:1.5)r1:2,(n3:3)r2)root;")
    val auspice = PhyloTree.fromAuspiceJson("""
      {"version": "v2",
       "meta": {"title": "fixture"},
       "tree": {
         "name": "root",
         "children": [
           {"name": "r1", "node_attrs": {"div": 2.0},
            "children": [
              {"name": "n1", "node_attrs": {"div": 0.5}},
              {"name": "n2", "node_attrs": {"div": 1.5}}]},
           {"name": "r2",
            "children": [{"name": "n3", "node_attrs": {"div": 3.0}}]}]}}""")
    assert(auspice.root === newick.root)
    assert(auspice.parent === newick.parent)
    assert(auspice.children === newick.children)
    assert(auspice.branchLen === newick.branchLen)
    // the tree operators agree across formats
    assert(auspice.mrca(Set("n1", "n3")) === newick.mrca(Set("n1", "n3")))
    assert(auspice.descendants("r1") === newick.descendants("r1"))
    assert(auspice.subtreeNewick(Set("n1", "n2", "n3")) ===
      newick.subtreeNewick(Set("n1", "n2", "n3")))
  }

  test("Auspice parser: typed errors and edge shapes") {
    // duplicate node names rejected (unique-label validation,
    // parseAuspiceTree:100-105)
    val dup = intercept[IllegalArgumentException] {
      PhyloTree.fromAuspiceJson(
        """{"tree":{"name":"a","children":[{"name":"a"}]}}""")
    }
    assert(dup.getMessage.contains("Duplicate node ID"))
    // missing 'tree' entry
    assert(intercept[IllegalArgumentException] {
      PhyloTree.fromAuspiceJson("""{"meta":{}}""")
    }.getMessage.contains("'tree' entry"))
    // node without a 'name'
    assert(intercept[IllegalArgumentException] {
      PhyloTree.fromAuspiceJson("""{"tree":{"node_attrs":{}}}""")
    }.getMessage.contains("'name' entry"))
    // malformed JSON
    assert(intercept[IllegalArgumentException] {
      PhyloTree.fromAuspiceJson("""{"tree": [[[""")
    }.getMessage.contains("not parseable"))
    // a single-node tree is valid (no edges)
    val single = PhyloTree.fromAuspiceJson("""{"tree":{"name":"only"}}""")
    assert(single.root === "only")
    assert(single.contains("only") && !single.contains("other"))
    assert(single.mrca(Set("only")) === (Some("only"), 0))
  }

  test("fromFile dispatches on extension like the reference") {
    val dir = java.nio.file.Files.createTempDirectory("phylo")
    val nwk = dir.resolve("t.nwk")
    java.nio.file.Files.writeString(nwk, "((n1,n2)r1,(n3)r2)root;")
    val json = dir.resolve("t.json")
    java.nio.file.Files.writeString(json,
      """{"tree":{"name":"root","children":[
        {"name":"r1","children":[{"name":"n1"},{"name":"n2"}]},
        {"name":"r2","children":[{"name":"n3"}]}]}}""")
    val a = PhyloTree.fromFile(nwk)
    val b = PhyloTree.fromFile(json)
    assert(a.parent === b.parent && a.root === b.root)
    val bad = dir.resolve("t.txt")
    java.nio.file.Files.writeString(bad, "whatever")
    assert(intercept[IllegalArgumentException] { PhyloTree.fromFile(bad) }
      .getMessage.contains("must end with .nwk or .json"))
  }

  test("phyloDescendantOf-style membership") {
    assert(phylo.descendants("r1") === Set("r1", "n1", "n2"))
  }
}
