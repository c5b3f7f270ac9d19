package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.functions.BpeRuntime
import graft.operators.TextAnalysis

/** Measures the r9 incremental BPE trainer against the r8 rescan form
  * on the real sf0.1 vocabulary at a production-shaped merge count
  * (default 5000), asserting the merge sequences are identical while
  * timing both. Usage: runMain graft.tools.BpeProbe [sfDir] [merges]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val merges = if (args.length > 1) args(1).toInt else 5000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      def race(tag: String, vocab: Seq[(String, Long)], n: Int): Unit = {
        println(s"[bpeprobe] $tag vocab=${vocab.size} merges=$n")
        // incremental first (the shipped path), then the rescan form
        val t0 = System.nanoTime()
        val inc = BpeRuntime.train(vocab, n)
        val tInc = (System.nanoTime() - t0) / 1e9
        println(f"[bpeprobe] $tag incremental=$tInc%.2f s (${inc.size} merges)")
        val t1 = System.nanoTime()
        val res = BpeRuntime.trainRescan(vocab, n)
        val tRes = (System.nanoTime() - t1) / 1e9
        println(f"[bpeprobe] $tag rescan=$tRes%.2f s")
        require(inc == res, s"$tag merge sequences diverged")
        println(f"[bpeprobe] $tag identical sequences; speedup=${tRes / tInc}%.1fx")
      }
      // the real sf corpus vocabulary (the synthetic documents table is
      // template text — 31 distinct words, exhausting after ~89
      // merges; still the honest corpus-path identity check)
      val docs = graft.Tables.documents(spark, sfDir)
      race("corpus", TextAnalysis.termFrequencies(docs, "text")
        .orderBy(col("cnt").desc, col("term"))
        .limit(65536)
        .collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq, merges)
      // a production-shaped vocabulary: 50k distinct syllable words,
      // Zipf frequencies, deterministic seed — deep enough to sustain
      // the full 5k-merge count
      val syl = Array("ba", "co", "din", "er", "fu", "gra", "hi", "jo",
        "kle", "lum", "mi", "nor", "pa", "qui", "ro", "sta", "tu", "ve",
        "wo", "xan", "yel", "zo", "ch", "th", "sh", "ing", "ed", "ly")
      val rnd = new scala.util.Random(42)
      val synth = (0 until 50000).map { i =>
        val w = (0 to rnd.nextInt(3))
          .map(_ => syl(rnd.nextInt(syl.length))).mkString
        (w + i.toString.takeRight(1 + rnd.nextInt(2)),
          (100000L / (i + 1) + 1L))
      }.distinct
      race("synth50k", synth, merges)
    } finally spark.stop()
  }
}
