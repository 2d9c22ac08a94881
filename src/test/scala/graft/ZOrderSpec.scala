package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def morton(a: Int, b: Int): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= (((a >> i) & 1).toLong << (2 * i + 1)) |
        (((b >> i) & 1).toLong << (2 * i))
    z
  }

  test("zValue matches naive bit interleaving (incl. >16-bit truncation)") {
    val rows = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (70000, 3), (255, 256))
    val got = rows.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z")).as[Long].collect()
    rows.zip(got).foreach { case ((a, b), z) =>
      assert(z === morton(a & 0xffff, b & 0xffff), s"($a,$b)")
    }
  }

  test("z-sorted layout confines a 2-D quadrant to few files; filter pushes down") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // 64x64 grid; the (u<16, i<16) quadrant is exactly z < 256
    val df = (for (u <- 0 until 64; i <- 0 until 64) yield (u.toLong, i.toLong))
      .toDF("user_id", "item_id")
      .withColumn("z", ZOrder.zValue(col("user_id"), col("item_id")))
    df.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val all = table.select(input_file_name()).distinct().count()
    assert(all >= 12, s"layout should spread over ~16 files, got $all")
    // both-dimension range = contiguous z-range = a couple of files
    val files = table.filter(col("z") < 256)
      .select(input_file_name()).distinct().count()
    assert(files <= 2, s"quadrant touched $files of $all files")
    assert(table.filter(col("z") < 256).count() === 256)
    // the key predicate reaches the parquet scan (row-group pruning)
    val plan = table.filter(col("z") < 256).queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(z,256)"), "z filter must be pushed")
  }
}
