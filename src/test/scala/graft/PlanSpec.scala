package graft

/** Physical-plan regression guards: the perf-critical plan shapes must not
  * silently degrade (pushdown reaching parquet, dims broadcast, top-k not
  * full-sorting). These assert on explain output at sf0.001.
  */
class PlanSpec extends SparkSpec {

  def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)

  test("filters are pushed into the parquet scan") {
    val p = planOf("q_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)"), p.take(500))
    assert(p.contains("EqualTo(l_returnflag,A)"))
    assert(p.contains("LessThan(l_quantity,10.0)"))
  }

  test("column pruning reaches the scan (ReadSchema is narrow)") {
    val p = planOf("q_scan_project")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_orderdate"))
    assert(!p.contains("o_totalprice"))
  }

  test("dimension joins broadcast") {
    val p = planOf("q_join_inner")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = planOf("q_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("the codegen vector kernel appears in the ANN plan") {
    val p = planOf("q_ann_pairs")
    assert(p.toLowerCase.contains("vecdot"))
  }

  test("no unbounded pairwise plans anywhere: CartesianProduct never, " +
    "BroadcastNestedLoopJoin only with a bounded-by-construction side") {
    // whitelist: queries whose BNLJ side is bounded regardless of data
    // scale — a fixed probe set (q_ann_topk/q_ivf_recall), a fixed-size
    // sample (q_ann_recall), or a 1-row aggregate dim (q_tfidf_topk)
    val boundedBnlj = Set("q_ann_topk", "q_ann_recall", "q_ivf_recall", "q_tfidf_topk")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — unbounded at scale")
      if (!boundedBnlj(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the bounded whitelist")
    }
  }
}
