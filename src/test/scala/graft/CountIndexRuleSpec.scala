package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{CountIndexRegistry, CountIndexRule, GraftExtensions}

class CountIndexRuleSpec extends SparkSpec {
  import spark.implicits._

  val factPath = s"$sfDir/lineitem.parquet"

  override def afterAll(): Unit = {
    CountIndexRegistry.clear()
    spark.experimental.extraOptimizations = Nil
    super.afterAll()
  }

  test("count-only groupBy is rewritten to the pre-aggregated index table") {
    val fact = spark.read.parquet(factPath)
    val expected = fact.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap

    // build + register the index (≙ the vertical value index)
    val idx = fact.groupBy(col("l_returnflag").as("value"))
      .agg(count(lit(1)).as("cnt"))
    val idxPath = java.nio.file.Files.createTempDirectory("idx").toString + "/idx"
    idx.write.parquet(idxPath)
    CountIndexRegistry.register(factPath, "l_returnflag",
      spark.read.parquet(idxPath))
    spark.experimental.extraOptimizations = Seq(new CountIndexRule)

    val q = spark.read.parquet(factPath).groupBy("l_returnflag").count()
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("value#"), s"not rewritten:\n$optimized")
    assert(!optimized.contains("Aggregate"), "aggregate should be gone")
    assert(q.as[(String, Long)].collect().toMap === expected)
  }

  test("filters or other aggregates leave the plan untouched") {
    spark.experimental.extraOptimizations = Seq(new CountIndexRule)
    val q1 = spark.read.parquet(factPath)
      .filter(col("l_quantity") > 10).groupBy("l_returnflag").count()
    assert(q1.queryExecution.optimizedPlan.toString.contains("Aggregate"))
    val q2 = spark.read.parquet(factPath)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    assert(q2.queryExecution.optimizedPlan.toString.contains("Aggregate"))
    // ungrouped count over a different column also untouched
    val q3 = spark.read.parquet(factPath).groupBy("l_linestatus").count()
    assert(q3.queryExecution.optimizedPlan.toString.contains("Aggregate"))
  }

  test("vecdot is callable from plain SQL once the extension registers it") {
    GraftExtensions.registerFunctions(spark)
    val v = spark.sql(
      "SELECT vecdot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(v === 32.0)
    // same kernel the Column API uses: identical on a float column
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vv")
    val sqlV = spark.sql("SELECT vecdot(a, b) AS d FROM vv").as[Double].head()
    val colV = df.select(graft.functions.VectorFunctions.dot(col("a"), col("b")))
      .as[Double].head()
    assert(sqlV === colV)
  }
}
