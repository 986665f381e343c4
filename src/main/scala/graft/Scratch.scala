package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    Seq("dd10_blocked_embedding", "dd03_minhash_lsh").foreach { q =>
      val df = SparkEntry.queries(q)(spark, d)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      println(s"${q}_REUSED=" + plan.split("\n").count(s =>
        s.contains("ReusedExchange") || s.contains("ReusedQueryStage") || s.contains("StageReuse")))
    }
    spark.stop()
  }
}
