package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for ad-hoc plan/behavior probes during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val d = "/root/testdata/sf0.001"
      val docs = graft.Tables.documents(spark, d)
      val sigs = graft.operators.Dedup.minhashSignature(docs, "doc_id", "text")
      val cands = graft.operators.Dedup.minhashCandidates(sigs)
      val plan = cands.queryExecution.optimizedPlan.toString()
      val n = "minhash_sig".r.findAllIn(plan).length
      println(s"[probe] minhash_sig occurrences in optimized plan: $n")
    } finally spark.stop()
  }
}
