package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 optimization decomposition probe (guide §1): attribute the wall
  * time of this round's targets — q_hybrid_rrf retriever legs vs
  * fusion, q_tpch21 branch duplication, the tokenize-twice family —
  * empirically, with the noop sink as the timed action and medians
  * over reps. `peek` legs run the CURRENT query bodies to completion
  * and report executed-plan scan / ReusedExchange counts, which the
  * initial-plan dumps in plans/ cannot show (AQE-time stage reuse).
  *
  * Usage: runMain graft.tools.OptProbeR16 <sfDir> <leg1,...|all> [reps]
  */
object OptProbeR16 {
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
    import graft.operators.{Similarity, TextAnalysis}

    val legs = scala.collection.mutable.LinkedHashMap.empty[String, () => Unit]

    // ---- q_hybrid_rrf decomposition (VERDICT r15 #4) ---------------
    def docs = graft.Tables.documents(spark, sfDir)
    def emb = graft.Tables.embeddings(spark, sfDir)
    def cosLeg = Similarity.bruteForceTopK(
      emb, emb.where(col("vec_id") < 3), k = 20, roundCosTo = 6)
      .select("qid", "nid", "rank")
    def lexLeg = TextAnalysis.bm25Retrieve(
      docs, docs.where(col("doc_id") < 3), "doc_id", "text", topK = 20)
      .select("qid", "nid", "rank")
    legs("hy_cos") = () => noop(cosLeg)
    legs("hy_lex") = () => noop(lexLeg)
    legs("hy_full") = () => noop(
      Similarity.rrfFuse(Seq(cosLeg, lexLeg), k = 60, topK = 10))

    // ---- q_bigram_lm decomposition ---------------------------------
    def tok = org.apache.spark.sql.functions.split(
      trim(lower(col("text"))), "\\s+")
    legs("blm_tokens") = () => noop(docs.select(tok.as("t")))
    legs("blm_pairs") = () => {
      val t = tok
      noop(docs.select(zip_with(
          slice(t, lit(1), greatest(size(t) - 1, lit(0))),
          slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2"))).as("ps"))
        .select(explode(col("ps")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2")))
    }
    legs("blm_counts") = () => {
      val t = tok
      noop(docs.select(zip_with(
          slice(t, lit(1), greatest(size(t) - 1, lit(0))),
          slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2"))).as("ps"))
        .select(explode(col("ps")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("cnt")))
    }
    legs("blm_full") = () => noop(TextAnalysis.bigramNextTokens(
      docs, "text", k = 3, minHeadCount = 20L))

    // ---- q_surprisal decomposition ----------------------------------
    legs("sur_dt") = () => noop(docs
      .select(col("doc_id"), explode(tok).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf_dt")))
    legs("sur_full") = () => noop(TextAnalysis.unigramSurprisal(
      docs, "doc_id", "text"))

    // ---- q_bigram_perplexity: score pass alone (stats pre-built) ----
    legs("bpx_stats") = () => noop(TextAnalysis.bigramStats(
      docs, "doc_id", "text"))
    legs("bpx_score") = () => {
      val st = TextAnalysis.bigramStats(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      st.count()
      val t0 = System.nanoTime()
      noop(TextAnalysis.bigramDocScore(docs, "doc_id", "text",
        stats = Some(st)))
      println(f"[r16probe]   bpx_score-inner ${(System.nanoTime() - t0) / 1e9}%.2f s")
      st.unpersist()
    }

    // ---- q_dedup_simhash decomposition ------------------------------
    legs("sh_sigs") = () => noop(graft.operators.Dedup.simhash(
      docs, "doc_id", "text"))
    legs("sh_found") = () => noop(graft.operators.Dedup.simhashNearDupsFromSigs(
      graft.operators.Dedup.simhash(docs, "doc_id", "text"), maxHamming = 3))

    // ---- q_media_neardup decomposition ------------------------------
    legs("mn_sigs") = () => {
      import graft.operators.Multimodal
      val base = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      noop(base.select(col("doc_id"),
        array_sort(array_distinct(Multimodal.byteWindowHashes(
          col("blob"), 64, 32))).as("hs")))
    }
    legs("mn_pairs") = () => {
      import graft.operators.Multimodal
      val base = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      noop(Multimodal.mediaNearDups(base, "doc_id", "blob",
        threshold = 0.5, verifyB = 0))
    }

    // ---- hardNegatives at a query count where the pair scan is the
    // cost (the 8-query gate shape is constants-bound): 512 queries ×
    // corpus — the second baseline pass the r16 rewrite removes is a
    // full extra |q|×|corpus| cosine scan here -----------------------
    legs("hn_wide") = () => {
      val q = emb.where(col("vec_id") % 117 === 0)
      val pos = q.select(col("vec_id").as("qid"), col("label"))
        .join(emb.where(col("vec_id") % 7 === 0)
          .select(col("vec_id").as("nid"), col("label")), "label")
        .select("qid", "nid")
      noop(Similarity.hardNegatives(emb, q, pos, k = 10,
        minMargin = Some(0.05), dropAbovePos = true))
    }

    // ---- ObjectHashAggregate fallback probe: TopKAgg groups (qids)
    // exceed the 128-key default, so partial aggregation degenerates
    // to an external SORT of the full pair stream ------------------
    val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    legs("mmr_topk_fb128") = () => {
      spark.conf.set(fbKey, "128")
      noop(Similarity.bruteForceTopK(
        emb, emb.where(col("vec_id") % 37 === 0), k = 8, roundCosTo = 6))
      spark.conf.unset(fbKey)
    }
    legs("mmr_topk_fb1m") = () => {
      spark.conf.set(fbKey, (1 << 20).toString)
      noop(Similarity.bruteForceTopK(
        emb, emb.where(col("vec_id") % 37 === 0), k = 8, roundCosTo = 6))
      spark.conf.unset(fbKey)
    }

    // ---- executed-plan scan/reuse census over the slow set ---------
    legs("peek") = () => {
      Seq("q_tpch21", "q_source_overlap", "q_surprisal", "q_tfidf_top",
        "q_repetition", "q_bigram_perplexity", "q_bigram_lm",
        "q_salted_join", "q_dedup_simhash", "q_media_neardup",
        "q_tpch18", "q_hybrid_rrf").foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        val p = df.queryExecution.executedPlan.toString()
        def n(pat: String) = p.linesIterator.count(_.contains(pat))
        println(s"[r16peek] $name scans=${n("Scan parquet")} " +
          s"reused=${n("ReusedExchange") + n("ReusedQueryStage")} " +
          s"exch=${n("Exchange")} smj=${n("SortMergeJoin")} " +
          s"bnlj=${n("BroadcastNestedLoopJoin")} window=${n("Window")}")
      }
    }

    // ---- run --------------------------------------------------------
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Array[Double]]
    for (r <- 0 until reps; (name, fn) <- legs if which(name)) {
      spark.sparkContext.setJobDescription(s"optprobe16:$name:rep$r")
      val t0 = System.nanoTime()
      fn()
      val dt = (System.nanoTime() - t0) / 1e9
      results.getOrElseUpdate(name, Array.fill(reps)(Double.NaN))(r) = dt
      println(f"[r16probe] $name rep$r $dt%.2f s")
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
      java.nio.file.Paths.get("target/optprobe_r16.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
