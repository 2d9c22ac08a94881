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

  private def refreshed(old: Map[Long, Long], newEdges: Seq[(Long, Long)],
      newNodes: Seq[Long]): Map[Long, Long] =
    ConnectedComponents.refresh(
      old.toSeq.toDF("node", "comp"),
      newEdges.toDF("a", "b"), "a", "b",
      newNodes.toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("refresh: a new node bridging two old components merges them to the global min") {
    // old world: {1,2,3} comp 1, {5,6} comp 5, singleton 9
    val old = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L)
    // new doc 100 pairs with 2 (comp 1) and 6 (comp 5)
    val got = refreshed(old, Seq((100L, 2L), (100L, 6L)), Seq(100L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L,
      9L -> 9L, 100L -> 1L))
  }

  test("refresh: edge-free new nodes become singletons; untouched comps unchanged") {
    val old = Map(1L -> 1L, 2L -> 1L, 7L -> 7L)
    val got = refreshed(old, Seq.empty, Seq(50L, 51L))
    assert(got === old ++ Map(50L -> 50L, 51L -> 51L))
  }

  test("refresh equals from-scratch components on a random-ish growing graph") {
    // deterministic pseudo-random graph in two batches
    def edgesOf(ids: Seq[Long]): Seq[(Long, Long)] =
      ids.flatMap(i => if (i % 3 == 0) Seq((i, (i * 7 + 11) % 40)) else Nil)
        .map { case (a, b) => (a, b) }
    val batch1 = (0L until 40L)
    val e1 = edgesOf(batch1)
    val old = comps(e1, batch1)
    val batch2 = (40L until 70L)
    // new edges: new-new AND new-old pairs
    val e2 = batch2.flatMap(i =>
      Seq((i, i % 40), (i, 40L + (i * 13) % 30)))
    val got = refreshed(old, e2, batch2)
    val scratch = comps(e1 ++ e2, batch1 ++ batch2)
    assert(got === scratch)
  }

  test("refresh with a cross-layer SimHashIndex probe: the end-to-end dedup tick") {
    import graft.operators.SimHashIndex
    val base = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away across the wide green field toward the old stone bridge"
    val other = "completely different words about spark shuffles parquet " +
      "row groups executors stages tasks codegen whole stage compilation"
    val dir = java.nio.file.Files.createTempDirectory("ccshidx").toString + "/idx"
    val v1 = Seq((1L, "s", base), (3L, "s", other)).toDF("doc_id", "source", "text")
    SimHashIndex.build(spark, v1, "doc_id", "source", "text", dir)
    val labels1 = ConnectedComponents.components(
      SimHashIndex.candidates(spark, v1, "doc_id", "source", "text", dir)
        .select("a_id", "b_id"), "a_id", "b_id",
      v1.select("doc_id"), "doc_id")
    // tick: a near-dup of doc 1 arrives; index appends O(batch), the
    // batch's cross-layer candidates are the refresh edges
    val batch = Seq((42L, "s", base.replace("jumps", "leaps")))
      .toDF("doc_id", "source", "text")
    SimHashIndex.append(spark, batch, "doc_id", "source", "text", dir)
    val newEdges = SimHashIndex
      .candidates(spark, batch, "doc_id", "source", "text", dir)
      .select("a_id", "b_id")
    val got = ConnectedComponents.refresh(labels1, newEdges, "a_id", "b_id",
      batch.select("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 3L -> 3L, 42L -> 1L))
  }
}
