package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for ad-hoc plan/behavior probes during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val d = "/root/testdata/sf0.1"
      // warm
      spark.range(1000).selectExpr("sum(id)").collect()
      val names = if (args.isEmpty) Seq("q_salted_join") else args.toSeq
      names.foreach { n =>
        val df = graft.SparkEntry.queries(n)(spark, d)
        val t0 = System.nanoTime()
        df.count()
        val t1 = System.nanoTime()
        println(s"[probe] $n first=${(t1 - t0) / 1e9}")
        val t2 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, d).count()
        println(s"[probe] $n second=${(System.nanoTime() - t2) / 1e9}")
        if (sys.env.contains("PROBE_EXPLAIN"))
          graft.SparkEntry.queries(n)(spark, d).explain("formatted")
      }
    } finally spark.stop()
  }
}
