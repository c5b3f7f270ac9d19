package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for ad-hoc plan/behavior probes during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val d = "/root/testdata/sf0.1"
      spark.read.parquet(s"$d/region.parquet").count()
      val docs = graft.Tables.documents(spark, d)
      def t(tag: String)(f: => Any): Unit = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] $tag%-20s ${(System.nanoTime()-t0)/1e9}%.2f s  ($r)")
      }
      t("shingles only") {
        docs.select(graft.operators.Dedup.shingles(col("text")).as("sh"))
          .select(max(size(col("sh")))).collect()(0)(0)
      }
      val sigs = graft.operators.Dedup.minhashSignature(docs, "doc_id", "text")
      t("sig forced") {
        sigs.select(max(element_at(col("sig"), 1))).collect()(0)(0)
      }
      val cands = graft.operators.Dedup.minhashCandidates(sigs)
      t("candidates") { cands.count() }
      t("neardups full") {
        graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text", 0.8).count()
      }
    } finally spark.stop()
  }
}
