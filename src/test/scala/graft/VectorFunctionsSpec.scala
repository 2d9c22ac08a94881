package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm / cosine on known vectors") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val (d, na, c) = df.select(
      VF.dot(col("a"), col("b")),
      VF.norm2(col("a")),
      VF.cosineR(col("a"), col("b"))).as[(Double, Double, Double)].head()
    assert(d === 32.0)
    assert(math.abs(na - math.sqrt(14)) < 1e-12)
    assert(math.abs(c - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-6)
  }

  test("cosine of identical vectors is 1") {
    val df = Seq(Tuple1(Seq(0.5f, -0.25f, 8f))).toDF("a")
    val c = df.select(VF.cosineR(col("a"), col("a"))).as[Double].head()
    assert(c === 1.0)
  }
}
