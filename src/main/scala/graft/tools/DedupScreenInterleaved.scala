package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.DedupIndex

/** Interleaved same-JVM screen A/B over two EXISTING dedup indexes
  * (r15, the close of VERDICT r14 item 1): the band-leg and
  * stage-cumulative probes both measured every nB-dependent stage
  * STRICTLY FASTER at 4096 than 1024 on the 15M store (store-candidate
  * join 1.1 vs 3.3 s, pruned reads equal, verify config-independent),
  * yet end-to-end screenBatch medians flipped SIGN between JVM
  * launches (1024: 8.7 → 15.4 s; 4096: 10.3 → 5.4 s across two
  * same-day launches). The remaining confound is launch-level JVM
  * state (heap layout, JIT fate of the verify join's generated code,
  * cached-relation pressure) — exactly what config-blocked
  * measurement cannot separate. This tool alternates single screens
  * A,B,A,B,… in ONE JVM so both configs share every launch artifact,
  * and reports per-config medians plus the per-rep trace.
  *
  * Usage: DedupScreenInterleaved <sfDir> <mult> <dirA> <dirB> [reps]
  */
object DedupScreenInterleaved {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = args(1).toInt
    val dirA = args(2)
    val dirB = args(3)
    val reps = if (args.length > 4) args(4).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val batch = base.where(col("doc_id") < 10)
      .withColumn("text",
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"),
            lit(" zzsalt"), col("doc_id").cast("string"))))
      .withColumn("doc_id", col("doc_id") + lit(mult * span))
      .cache()
    batch.count()

    val ixA = DedupIndex.open(spark, dirA)
    val ixB = DedupIndex.open(spark, dirB)
    def nowS = System.nanoTime() / 1e9
    def screen(ix: DedupIndex.Index): (Double, Long) = {
      val t = nowS
      val r = DedupIndex.screenBatch(ix, batch, "doc_id", "text")
      val n = try r.dropped.count() finally r.release()
      (nowS - t, n)
    }
    // one untimed warm screen per config (plan/codegen warmup shared)
    screen(ixA); screen(ixB)
    val trace = (1 to reps).map { _ =>
      val (ta, na) = screen(ixA)
      val (tb, nb) = screen(ixB)
      // GC nudge (the Bm25GenServe sliced-build lesson): each screen
      // leaves ~GBs of shuffle files that free only when their
      // ShuffleDependency is collected — 2·reps screens over a 15M
      // store otherwise fill the disk mid-run
      System.gc(); Thread.sleep(1500)
      (ta, tb, na, nb)
    }
    require(trace.map(_._3).distinct.size == 1 &&
      trace.map(_._4).distinct.size == 1 &&
      trace.head._3 == trace.head._4,
      "identity gate: both configs must drop the same pair count on every rep")
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val loadavg = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
        .split(" ").take(3).mkString(",")).getOrElse("")
    val trA = trace.map(t => f"${t._1}%.2f").mkString("[", ",", "]")
    val trB = trace.map(t => f"${t._2}%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"dedup_screen_interleaved","mult":$mult,"cfg_a":"${ixA.nBuckets}/${ixA.nSigBuckets}","cfg_b":"${ixB.nBuckets}/${ixB.nSigBuckets}","med_a":${med(trace.map(_._1))}%.3f,"med_b":${med(trace.map(_._2))}%.3f,"trace_a":$trA,"trace_b":$trB,"n_dropped":${trace.head._3},"reps":$reps,"loadavg":"$loadavg"}""")
    spark.stop()
  }
}
