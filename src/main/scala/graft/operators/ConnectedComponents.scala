package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering step
  * of large-scale deduplication (near-dup PAIRS are only half the job; the
  * keep-one decision needs the transitive closure: pair (a,b) + pair (b,c)
  * must put a,b,c in ONE group even though (a,c) was never emitted).
  *
  * Algorithm: iterative min-label propagation over the EDGE-INDUCED
  * subgraph only — nodes that touch no edge are singleton components by
  * definition and are unioned in after the fixpoint, so per-iteration cost
  * scales with the (typically tiny) near-dup graph, not the corpus. Each
  * round every endpoint takes the minimum label over itself and its
  * neighbors; convergence is detected by an aggregate over the label sum
  * (strictly decreasing until fixpoint). Per round: one equi-join on the
  * edge list + one groupBy — both shuffle on node id, no all-pairs
  * anywhere. Rounds needed = component diameter, which for near-dup graphs
  * is small (components are quasi-cliques around a shared template);
  * lineage is truncated per round so plans stay O(1) deep.
  */
object ConnectedComponents {

  /** @param edges undirected edge list (each pair once, either direction)
    * @param nodes one row per node (superset of edge endpoints; isolated
    *              nodes become singleton components)
    * @param maxIter iteration bound; if the fixpoint is NOT reached within
    *                it (graph diameter > maxIter) the result would be
    *                silently wrong, so this THROWS instead — raise maxIter
    *                for pathological chain-shaped graphs
    * @return (node, comp) where comp = min node id reachable
    */
  def components(
      edges: DataFrame, eaCol: String, ebCol: String,
      nodes: DataFrame, nodeCol: String,
      maxIter: Int = 25): DataFrame = {
    // materialize the (possibly expensive) edge derivation ONCE before the
    // both-directions union — unioning two selects over the raw plan would
    // execute it twice
    val e0 = edges.select(col(eaCol).as("src"), col(ebCol).as("dst"))
      .localCheckpoint()
    val e = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    // only edge endpoints participate in propagation
    var labels = e.select(col("src").as("node"))
      .distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    // labels only ever decrease, so an unchanged label sum means fixpoint;
    // decimal(38) so huge id spaces cannot overflow-wrap into a false stop
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var lastSum = labelSum(labels)
    var it = 0
    var converged = false
    // maxIter bounds the PROPAGATION rounds; the +1 grants the confirming
    // unchanged-sum round, so a graph whose diameter is exactly maxIter
    // still converges instead of being rejected one round early
    while (it < maxIter + 1 && !converged) {
      // neighbor labels flow along edges; keep own label in the running min
      val viaEdge = e.join(labels, e("dst") === labels("node"))
        .select(col("src").as("node"), col("comp"))
      val next = viaEdge.union(labels.select(col("node"), col("comp")))
        .groupBy("node").agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(lastSum) == 0
      lastSum = s
      labels = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within maxIter=$maxIter " +
          "propagation rounds (graph diameter > maxIter); a partial result " +
          "would silently split components incorrectly — raise maxIter")
    // isolated nodes (no incident edge) are their own component
    val isolated = nodes.select(col(nodeCol).as("node")).distinct()
      .join(labels.select("node"), Seq("node"), "left_anti")
      .withColumn("comp", col("node"))
    labels.unionByName(isolated)
  }
}
