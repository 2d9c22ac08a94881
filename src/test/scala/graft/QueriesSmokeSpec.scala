package graft

/** Smoke: every declared query builds and runs at sf0.001, and the flagship
  * entry returns rows. Value-level correctness is covered by the DuckDB
  * oracle gate (tools/check.py / driver CORRECTNESS).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
  }

  SparkEntry.allDefs.foreach { d =>
    test(s"query ${d.name} runs at sf0.001") {
      val n = d.build(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
