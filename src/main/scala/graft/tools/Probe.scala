package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for ad-hoc plan/behavior probes during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val d = "/root/testdata/sf0.001"
      val q = graft.SparkEntry.queries("q_tpch6")(spark, d)
      q.collect()
      println("=== tpch6 executed plan ===")
      println(q.queryExecution.executedPlan.toString().take(4000))
    } finally spark.stop()
  }
}
