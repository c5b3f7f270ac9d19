package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, DedupIndex}

/** Stage-cumulative attribution of the DedupIndex SCREEN cost against
  * an EXISTING index (r15, VERDICT r14 item 1 follow-through): the
  * quiet-box band-leg probe showed the isolated band reads and the
  * store-candidate join STRICTLY FASTER at nB 4096 than 1024 at 15M
  * (t_cand 0.69 vs 3.00 s), yet the full screen still lost (10.3 vs
  * 8.7 s) — so the residue lives in a screen stage the read/join legs
  * don't isolate. This probe replays screenBatch's exact stage
  * expressions cumulatively (each stage's count() re-executes its
  * prefix — identical across configs, so stage DIFFS attribute the
  * delta):
  *
  *   t_nb             — batch band keys (minhash + explode + bucket)
  *   t_storecands     — + bucket-pruned store join
  *   t_cands_distinct — + batch self-join union + DISTINCT (the
  *                      candidate shuffle)
  *   t_matched        — the pruned sig read of the candidates' buckets
  *   t_dropped        — the full verify (joins + jaccard + threshold +
  *                      distinct)
  *   t_screen         — DedupIndex.screenBatch end-to-end (reference)
  *
  * Usage: DedupScreenStages <sfDir> <mult> <indexDir> [reps]
  * (indexDir = a dir previously built by DedupServeProbe/Smoke; the
  * batch fixture is reconstructed exactly as those tools build it)
  */
object DedupScreenStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = args(1).toInt
    val indexDir = args(2)
    val reps = if (args.length > 3) args(3).toInt else 5
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

    val index = DedupIndex.open(spark, indexDir)
    def nowS = System.nanoTime() / 1e9
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = med((1 to reps).map { _ =>
      val t = nowS; f; nowS - t
    })

    import graft.functions.{exprs, LshBandKeys}
    def newSigs = Dedup.minhashSignature(batch, "doc_id", "text",
      index.numPerm)
    def nb = newSigs.select(col("doc_id"),
        posexplode(exprs.toColumn(
          LshBandKeys(exprs.toExpr(col("sig")), index.bands)))
          .as(Seq("band", "bh")))
      .withColumn("bucket",
        pmod(xxhash64(col("band"), col("bh")), lit(index.nBuckets.toLong))
          .cast("long"))
    val buckets = nb.select("bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    def store = index.bandRows
      .where(col("bucket").isin(buckets.map(_.asInstanceOf[Any]): _*))
    def storeCands = nb.as("n").join(store.as("o"),
        col("n.band") === col("o.band") && col("n.bh") === col("o.bh") &&
          col("n.doc_id") =!= col("o.doc_id"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("matched_id"))
    def batchCands = nb.as("n").join(nb.as("o"),
        col("n.band") === col("o.band") && col("n.bh") === col("o.bh") &&
          col("o.doc_id") < col("n.doc_id"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("matched_id"))
    def cands = storeCands.withColumn("from_store", lit(true))
      .unionByName(batchCands.withColumn("from_store", lit(false)))
      .distinct()
    val sbuckets = cands.where(col("from_store"))
      .select(pmod(xxhash64(col("matched_id")),
        lit(index.nSigBuckets.toLong)).cast("long").as("sb"))
      .distinct().collect().map(_.getLong(0))
    def matchedSigs = index.sigRows
      .where(col("sbucket").isin(sbuckets.map(_.asInstanceOf[Any]): _*))
      .select(col("doc_id").as("matched_id"), col("sig").as("sig_o"))
    def allMatched = matchedSigs.unionByName(
      newSigs.select(col("doc_id").as("matched_id"), col("sig").as("sig_o")))
    def dropped = cands.drop("from_store")
      .join(newSigs.select(col("doc_id").as("new_id"), col("sig").as("sig_n")),
        "new_id")
      .join(allMatched, "matched_id")
      .withColumn("est_jaccard",
        round(Dedup.signatureJaccard(col("sig_n"), col("sig_o")), 6))
      .where(col("est_jaccard") >= 0.8)
      .select(col("new_id"), col("matched_id"), col("est_jaccard"))
      .distinct()

    val tNb = time(nb.count())
    val tStoreCands = time(storeCands.count())
    val tCandsDistinct = time(cands.count())
    val tMatched = time(matchedSigs.count())
    val tDropped = time(dropped.count())
    val tScreen = time {
      val r = DedupIndex.screenBatch(index, batch, "doc_id", "text")
      try r.dropped.count() finally r.release()
    }
    val loadavg = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
        .split(" ").take(3).mkString(",")).getOrElse("")
    println(f"""{"metric":"dedup_screen_stages","mult":$mult,"n_buckets":${index.nBuckets},"n_sig_buckets":${index.nSigBuckets},"n_bkt_hit":${buckets.length},"n_sbuckets":${sbuckets.length},"t_nb":$tNb%.3f,"t_storecands":$tStoreCands%.3f,"t_cands_distinct":$tCandsDistinct%.3f,"t_matched":$tMatched%.3f,"t_dropped":$tDropped%.3f,"t_screen":$tScreen%.3f,"reps":$reps,"loadavg":"$loadavg"}""")
    spark.stop()
  }
}
