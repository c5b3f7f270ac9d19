package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.TextAnalysis

/** Times the H16 audit relation both ways — column battery vs the r9
  * struct-returning kernel (gopherRules(useKernel = true)) — on the
  * given corpus. Usage: runMain graft.tools.GopherAuditProbe [sfDir] [reps]
  */
object GopherAuditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = graft.Tables.documents(spark, sfDir)
      docs.count() // warm the scan
      def time(tag: String, useKernel: Boolean): Double = {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          TextAnalysis.gopherRules(docs, "doc_id", "text",
            useKernel = useKernel)
            .selectExpr("count(*)", "sum(cast(pass as int))",
              "sum(n_words)", "sum(n_stop)")
            .collect()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = ts(ts.length / 2)
        println(f"[gopheraudit] $tag median=$med%.3f s (reps=$reps)")
        med
      }
      val battery = time("battery", useKernel = false)
      val kernel = time("kernel", useKernel = true)
      println(f"[gopheraudit] speedup=${battery / kernel}%.2fx")
    } finally spark.stop()
  }
}
