package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, DedupIndex}

/** Leg-level attribution of the DedupIndex serve cost at the 5M
  * middle decade (VERDICT r13 item 5): the match-footprint-sized
  * config (4096 band / 65536 sig buckets) loses to the fixed 1024/256
  * there — 4.26 vs 3.63 s re-measured this round on unchanged code,
  * so the r13 row was real, not load noise. The probe splits the
  * suspect leg out of the screen per config:
  *
  *   t_newsigs   — batch minhash compute (config-independent baseline)
  *   t_sigs_plan — PLAN time of the pruned sigs read (the ~10k-literal
  *                 isin hypothesis: Catalyst analysis of giant In
  *                 lists) — MEASURED MINOR: 0.23 s at 65536
  *   t_sigs_read — EXECUTION of the pruned sigs read — MEASURED
  *                 DOMINANT: 65536 buckets read 7× FEWER rows (713k
  *                 vs 5M) yet took 17× LONGER (3.38 vs 0.19 s) — 9258
  *                 tiny files at ~0.36 ms/open vs 5M rows streaming
  *                 through 256 files. Files cost, rows are nearly
  *                 free; pruning pays only when rows-saved-per-file
  *                 (storeDocs/matches) beats ~8k — the constant now
  *                 encoded in DedupIndex.autoSize(storeDocs, ...).
  *   t_screen    — the full screen (the smoke's timed unit)
  *
  * Round 15 (VERDICT r14 item 1) adds the BAND-side legs — the r14
  * 15M smoke had auto (nB 4096, the unchanged r10 band rule) losing
  * 14.2 vs 5.8 s with the sig read ≤ 0.34 s in every config, under
  * loadavg 17–30, reversing at 5M; these legs localize that residue
  * on a quiet box before anyone touches the band rule:
  *
  *   t_bands_plan — PLAN time of the bucket-pruned band read
  *   t_bands_read — EXECUTION of the pruned band read, with
  *                  rows_bands_read and n_band_files (input_file_name
  *                  distinct — the file-open cost axis)
  *   t_cand       — the store-candidate join (pruned bands ⋈ batch
  *                  band keys on (band, bh)), the screen's band-side
  *                  consumer
  *
  * Usage: DedupServeProbe <sfDir> [mult] [reps] [nB1:nS1,nB2:nS2,...]
  */
object DedupServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 1000
    val reps = if (args.length > 2) args(2).toInt else 3
    val configs: Seq[(Int, Int)] =
      if (args.length > 3)
        args(3).split(",").toSeq.map { c =>
          val Array(b, s) = c.split(":"); (b.toInt, s.toInt)
        }
      else Seq((1024, 256), (4096, 65536))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE: the BM25_SERVE_r13 sizing rule — at 15M
    // docs the minhash build's per-partition token rows outgrow the
    // default heap at 32 partitions; 256 keeps each partition small
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val store = (0 until mult).map(k =>
        base.withColumn("doc_id", col("doc_id") + lit(k * span)))
      .reduce(_ unionAll _)
    val batch = base.where(col("doc_id") < 10)
      .withColumn("text",
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"),
            lit(" zzsalt"), col("doc_id").cast("string"))))
      .withColumn("doc_id", col("doc_id") + lit(mult * span))
      .cache()
    batch.count()

    def nowS = System.nanoTime() / 1e9
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)

    for ((nB, nS) <- configs) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-dsp-$nB-$nS").toString
      val tb = nowS
      val index = DedupIndex.write(store, "doc_id", "text", dir,
        nBuckets = nB, nSigBuckets = nS)
      val buildWall = nowS - tb

      // one untimed screen to learn the candidate footprint
      val warm = DedupIndex.screenBatch(index, batch, "doc_id", "text")
      val matchedIds = warm.dropped.select("matched_id").distinct()
        .collect().map(_.getLong(0))
      warm.release()
      val sbuckets = matchedIds
        .map(id => math.floorMod(
          org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            id, org.apache.spark.sql.types.LongType, 42L), nS.toLong))
        .distinct.sorted

      // leg A: newSigs minhash (config-independent baseline)
      val tSigs = med((1 to reps).map { _ =>
        val t = nowS
        Dedup.minhashSignature(batch, "doc_id", "text", 64).count()
        nowS - t
      })
      // leg B: pruned sigs read — PLAN vs EXEC, the isin-literal test
      def prunedSigs = index.sigRows
        .where(col("sbucket").isin(sbuckets.map(_.asInstanceOf[Any]): _*))
      val tPlan = med((1 to reps).map { _ =>
        val t = nowS; prunedSigs.queryExecution.executedPlan; nowS - t
      })
      val nRead = prunedSigs.count()
      val nSigFiles = prunedSigs.select(input_file_name()).distinct().count()
      val tRead = med((1 to reps).map { _ =>
        val t = nowS; prunedSigs.count(); nowS - t
      })
      // leg D (r15): the band side — batch band keys (screenBatch's nb)
      // against the bucket-pruned band store, then the candidate join
      import graft.functions.{exprs, LshBandKeys}
      val batchSigs = Dedup.minhashSignature(batch, "doc_id", "text",
          index.numPerm)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nbKeys = batchSigs.select(col("doc_id"),
          posexplode(exprs.toColumn(
            LshBandKeys(exprs.toExpr(col("sig")), index.bands)))
            .as(Seq("band", "bh")))
        .withColumn("bucket",
          pmod(xxhash64(col("band"), col("bh")), lit(nB.toLong))
            .cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val buckets = nbKeys.select("bucket").distinct()
        .collect().map(_.getLong(0)).sorted
      def prunedBands = index.bandRows
        .where(col("bucket").isin(buckets.map(_.asInstanceOf[Any]): _*))
      val tBandsPlan = med((1 to reps).map { _ =>
        val t = nowS; prunedBands.queryExecution.executedPlan; nowS - t
      })
      val nBandRows = prunedBands.count()
      val nBandFiles = prunedBands.select(input_file_name())
        .distinct().count()
      val tBandsRead = med((1 to reps).map { _ =>
        val t = nowS; prunedBands.count(); nowS - t
      })
      def storeCand = nbKeys.as("n").join(prunedBands.as("o"),
        col("n.band") === col("o.band") && col("n.bh") === col("o.bh") &&
          col("n.doc_id") =!= col("o.doc_id"))
      val tCand = med((1 to reps).map { _ =>
        val t = nowS; storeCand.count(); nowS - t
      })
      batchSigs.unpersist(); nbKeys.unpersist()
      // leg C: the full screen (the smoke's timed unit)
      val tScreen = med((1 to reps).map { _ =>
        val t = nowS
        val r = DedupIndex.screenBatch(index, batch, "doc_id", "text")
        try r.dropped.count() finally r.release()
        nowS - t
      })
      val loadavg = scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg"))).trim
          .split(" ").take(3).mkString(",")).getOrElse("")
      println(f"""{"metric":"dedup_serve_probe","mult":$mult,"n_buckets":$nB,"n_sig_buckets":$nS,"build_wall":$buildWall%.3f,"n_matched":${matchedIds.length},"n_sbuckets":${sbuckets.length},"rows_pruned_read":$nRead,"n_sig_files":$nSigFiles,"t_newsigs":$tSigs%.3f,"t_sigs_plan":$tPlan%.3f,"t_sigs_read":$tRead%.3f,"n_bkt_hit":${buckets.length},"rows_bands_read":$nBandRows,"n_band_files":$nBandFiles,"t_bands_plan":$tBandsPlan%.3f,"t_bands_read":$tBandsRead%.3f,"t_cand":$tCand%.3f,"t_screen":$tScreen%.3f,"reps":$reps,"loadavg":"$loadavg"}""")
    }
    spark.stop()
  }
}
