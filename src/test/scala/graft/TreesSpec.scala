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
    assert(phylo.subtreeNewick(Set("n1", "n2", "n3")) ===
      "((n1,n2)r1,n3)root;")
    assert(phylo.subtreeNewick(Set("n1", "n3")) === "(n1,n3)root;")
    assert(phylo.subtreeNewick(Set("n1", "n3"), contractUnary = false) ===
      "((n1)r1,(n3)r2)root;")
  }

  test("MrcaAggregator agrees with the driver-side walk") {
    val spark = SparkSpec.session
    import spark.implicits._
    val cases = Seq(
      Seq("n1", "n2"), Seq("n1", "n3"), Seq("n2"),
      Seq("n1", "ghost"), Seq("ghost"), Seq[String]())
    cases.foreach { names =>
      val (aggM, missing) = names.toDS()
        .select(new MrcaAggregator(phylo).toColumn).head()
      val (refM, refMissing) = phylo.mrca(names.toSet)
      assert(Option(aggM) === refM, s"names=$names")
      assert(missing.size === refMissing, s"names=$names")
    }
  }

  test("phyloDescendantOf-style membership") {
    assert(phylo.descendants("r1") === Set("r1", "n1", "n2"))
  }
}
