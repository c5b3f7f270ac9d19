package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 optimization decomposition probe (guide §1): attribute the wall
  * time of the heaviest bench queries to their stages empirically —
  * pair-scan vs kernel vs rank-aggregate — with the noop sink as the
  * timed action, interleaved A/B, medians over reps. Writes one JSON
  * line per leg to stdout and target/optprobe_r15.json.
  *
  * Usage: runMain graft.tools.OptProbe <sfDir> <leg1,leg2,...|all> [reps]
  */
object OptProbe {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which: String => Boolean =
      if (args.length < 2 || args(1) == "all") _ => true
      else args(1).split(",").toSet
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val emb = graft.Tables.embeddings(spark, sfDir)
    def fannedNrm: DataFrame = emb
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("nrm", sqrt(Similarity.dot(col("embedding"), col("embedding"))))

    // ---- legs -----------------------------------------------------
    val legs = scala.collection.mutable.LinkedHashMap.empty[String, () => Unit]

    // embed_neardup decomposition: full query vs pair scan with the
    // cheap id conjunct FIRST in the join condition
    legs("embed_full") = () => noop(
      Similarity.cosineNearDups(emb, threshold = 0.4, dim = 64, planes = 0)
        .select("id_a", "id_b"))
    legs("embed_swapped") = () => {
      val f = fannedNrm
      val a = f.as("a"); val x = f.as("x")
      val cos = Similarity.dot(col("a.embedding"), col("x.embedding")) /
        (col("a.nrm") * col("x.nrm"))
      noop(a.join(x, col("a.vec_id") < col("x.vec_id") && cos >= 0.4)
        .select(col("a.vec_id").as("id_a"), col("x.vec_id").as("id_b")))
    }

    // mmr decomposition: pair scan+dot only / +rank aggregate / full
    val q37 = emb.where(col("vec_id") % 37 === 0)
    legs("mmr_pairs_only") = () => {
      val c = fannedNrm
      val q = q37.withColumn("nrm", sqrt(Similarity.dot(col("embedding"), col("embedding"))))
      val cosE = round(Similarity.dot(col("q.embedding"), col("c.embedding")) /
        (col("q.nrm") * col("c.nrm")), 6)
      noop(c.as("c").join(broadcast(q.as("q")), col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"), cosE.as("cos"))
        .where(col("cos") > 2.0))  // never true: isolates scan+dot cost
    }
    legs("mmr_topk") = () => noop(
      Similarity.bruteForceTopK(emb, q37, k = 8, roundCosTo = 6))
    legs("mmr_full") = () => noop(
      Similarity.mmrRerank(emb, q37, k = 3, n = 8, lambda = 0.5))

    // source_overlap decomposition: the gram→collect_set(source)
    // aggregate alone vs the full operator (pair expansion + per-source
    // denominators). If full ≈ bysrc the dual consumption is collapsed
    // (or cheap); if ~2× the second consumer re-runs the shingle pass.
    legs("so_bysrc") = () => {
      val docs = graft.Tables.documents(spark, sfDir)
      noop(docs.select(col("source"),
          explode(graft.operators.Dedup.shingles(col("text"), 3)).as("gram"))
        .groupBy("gram").agg(collect_set(col("source")).as("srcs")))
    }
    legs("so_full") = () => noop(graft.operators.Curation.sourceOverlap(
      graft.Tables.documents(spark, sfDir), "source", "text", n = 3))
    legs("dsir_full") = () => noop(graft.operators.Curation.dsirWeights(
      graft.Tables.documents(spark, sfDir), "doc_id", "text",
      col("lang") === "en", buckets = 4096, exactHash = true))

    // executed-plan reuse check: does ReuseExchange collapse the
    // dual-consumer subtrees at runtime? (initial-plan dumps cannot
    // show AQE-time reuse)
    legs("peek_reuse") = () => {
      val docs = graft.Tables.documents(spark, sfDir)
      Seq(
        "source_overlap" -> graft.operators.Curation
          .sourceOverlap(docs, "source", "text", n = 3),
        "dsir_weights" -> graft.operators.Curation.dsirWeights(docs,
          "doc_id", "text", col("lang") === "en", buckets = 4096,
          exactHash = true)
      ).foreach { case (name, df) =>
        df.collect()
        val p = df.queryExecution.executedPlan.toString()
        val reused = p.linesIterator.count(_.contains("ReusedExchange"))
        val scans = p.linesIterator.count(_.contains("Scan parquet"))
        println(s"[optprobe] peek $name: ReusedExchange=$reused scans=$scans")
      }
    }

    // ---- run ------------------------------------------------------
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Array[Double]]
    for (r <- 0 until reps; (name, fn) <- legs if which(name)) {
      spark.sparkContext.setJobDescription(s"optprobe:$name:rep$r")
      val t0 = System.nanoTime()
      fn()
      val dt = (System.nanoTime() - t0) / 1e9
      results.getOrElseUpdate(name, Array.fill(reps)(Double.NaN))(r) = dt
      println(f"[optprobe] $name rep$r $dt%.2f s")
    }
    def med(a: Array[Double]): Double = {
      val s = a.filterNot(_.isNaN).sorted
      if (s.isEmpty) -1 else s(s.length / 2)
    }
    val loadavg = scala.util.Try(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim.split(" ").take(3)
      .mkString(",")).getOrElse("")
    val line = results.map { case (k, v) =>
      "\"" + k + "\":{\"median\":" + f"${med(v)}%.3f" + ",\"reps\":[" +
        v.filterNot(_.isNaN).map(x => f"$x%.2f").mkString(",") + "]}"
    }.mkString("{", ",", s""","_load":"$loadavg","_sf":"$sfDir"}""")
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/optprobe_r15.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
