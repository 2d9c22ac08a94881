package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate ConnectedComponents per-round cost on synthetic graphs. */
object CCBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for (s <- si.submissionTime; e <- si.completionTime) yield e - s
        val m = si.taskMetrics
        if (dur.exists(_ > 300))
          System.err.println(s"STAGE id=${si.stageId} tasks=${si.numTasks} " +
            s"dur=${dur.getOrElse(-1L)}ms run=${m.executorRunTime}ms " +
            s"deser=${m.executorDeserializeTime}ms gc=${m.jvmGCTime}ms " +
            s"cpu=${m.executorCpuTime / 1000000}ms " +
            s"name=${si.name.takeWhile(_ != '\n').take(60)}")
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
    })
    import spark.implicits._
    // chain of 60 nodes (diameter 59 / pointer distance) + 5 cliques of 10
    val chain = (0L until 59L).map(i => (i, i + 1))
    val cliques = (0 until 5).flatMap { c =>
      val base = 1000L + c * 10
      for (i <- 0 until 10; j <- i + 1 until 10) yield (base + i, base + j)
    }
    val edges = (chain ++ cliques).toDF("a", "b")
    val nodes = ((0L until 60L) ++ (1000L until 1050L)).toDF("id")
    for (run <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.operators.ConnectedComponents
        .components(edges, "a", "b", nodes, "id", maxIter = 80).count()
      println(f"CCBENCH run=$run rows=$n dt=${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
