package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** ConnectedComponents: transitive closure semantics, isolated nodes,
  * convergence on chains (worst-case diameter) and cliques.
  */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val e = edges.toDF("a", "b")
    val n = nodes.toDF("id")
    ConnectedComponents.components(e, "a", "b", n, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitivity: (1,2)+(2,3) puts 1,2,3 in one component") {
    val got = comps(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L, 4L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("a long chain converges to the minimum label") {
    // path 10-11-12-...-30: diameter 20, well under maxIter via the
    // per-round min propagation doubling through the running min
    val edges = (10L until 30L).map(i => (i, i + 1))
    val nodes = (10L to 30L)
    val got = comps(edges, nodes)
    assert(got.values.toSet === Set(10L))
  }

  test("edge direction does not matter and self-loops are harmless") {
    val got = comps(Seq((5L, 2L), (2L, 5L), (7L, 7L)), Seq(2L, 5L, 7L))
    assert(got === Map(2L -> 2L, 5L -> 2L, 7L -> 7L))
  }

  test("two disjoint cliques stay separate") {
    val c1 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c2 = for (a <- 20L to 23L; b <- (a + 1) to 23L) yield (a, b)
    val got = comps(c1 ++ c2, (1L to 4L) ++ (20L to 23L))
    assert(got.filter(_._1 <= 4).values.toSet === Set(1L))
    assert(got.filter(_._1 >= 20).values.toSet === Set(20L))
  }

  test("isolated nodes become singleton components") {
    val got = comps(Seq((1L, 2L)), Seq(1L, 2L, 9L))
    assert(got(9L) === 9L)
  }
}
