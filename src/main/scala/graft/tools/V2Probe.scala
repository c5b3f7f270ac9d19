package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Curation, QualityClassifier, TextAnalysis}

/** Stage-attribution probe for pipeline v2: times each round-8 stage
  * in isolation over the same corpus so the composed-job wall can be
  * decomposed. Usage: V2Probe <sfDir>
  */
object V2Probe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)
    spark.range(1000).selectExpr("sum(id)").collect() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"[v2probe] $name wall=${(System.nanoTime() - t0) / 1e9} rows=$n")
    }

    time("scan_count")(docs.count())
    time("gopher_filter")(docs
      .where(TextAnalysis.gopherPass(col("text"), minStop = 0L)).count())
    // per-rule attribution
    val tc = col("text")
    // whitespace CLASS, matching gopherStatCols' H16 split (r8 ADVICE:
    // a single-space split no longer reflects the shipped filter)
    val words = filter(split(tc, "[ \\t\\n\\x0B\\f\\r]+"), w => w =!= lit(""))
    time("g_words_band")(docs.where(size(words) >= 50).count())
    time("g_mean_len")(docs.where(
      aggregate(words, lit(0L), (a2, w) => a2 + length(w)).cast("double")
        / size(words) >= 3.0).count())
    time("g_alpha")(docs.where(
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double")
        / size(words) >= 0.8).count())
    time("g_symbol")(docs.where(
      (length(tc) - length(replace(tc, lit("#"), lit("")))) <= 5).count())
    time("g_lines")(docs.where(
      size(filter(split(tc, "\n"), l => l =!= lit(""))) >= 1).count())
    time("v1_pipeline")(Curation.curationPipeline(docs, "doc_id", "text")
      .count())
    time("dsir_weights")(Curation.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en").count())

    // decomposition of the DSIR stages
    val t = TextAnalysis.tokens(col("text"))
    val grams0 = docs
      .select(col("doc_id"), (col("lang") === "en").as("is_target"), t.as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), col("is_target"),
        explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => concat_ws(" ", element_at(col("t"), i + 1),
            element_at(col("t"), i + 2)))).as("gram"))
    time("dsir_explode_only")(grams0.count())
    val cdb0 = grams0
      .select(col("doc_id"), col("is_target"),
        (conv(substring(md5(col("gram")), 1, 4), 16, 10).cast("long")
          % 4096).as("bucket"))
      .groupBy("doc_id", "is_target", "bucket")
      .agg(count(lit(1)).as("c"))
    time("dsir_cdb_agg")(cdb0.count())

    // r10 kernel-path decomposition: histogram aggregate vs map-only
    // scoring (the two passes of the rebuilt fast path)
    val tok = TextAnalysis.tokens(col("text"))
    val kbase = docs.select(col("doc_id"),
      coalesce(col("lang") === "en", lit(false)).as("is_target"),
      tok.as("t")).where(size(col("t")) >= 2)
    import graft.functions.{exprs => gex, DsirHistAgg}
    time("dsir_hist_agg") {
      kbase.agg(gex.toColumn(DsirHistAgg(gex.toExpr(col("t")),
          gex.toExpr(col("is_target")), 4096).toAggregateExpression())
          .as("h"))
        .head().getSeq[Long](0).length.toLong
    }
    time("dsir_score_only") {
      val lrz = new Array[Long](4096) // zeros: timing the hash walk
      import graft.functions.{exprs, DsirScore}
      kbase.select(col("doc_id"), exprs.toColumn(
        DsirScore(exprs.toExpr(col("t")), lrz.toSeq, 4096)).as("s"))
        .agg(sum("s")).head()
      docs.count()
    }

    val sample = Curation.hashSample(docs, "doc_id", 26)
    val medLen = sample.agg(expr("percentile(length(text), 0.5)"))
      .collect()(0).getDouble(0)
    val model = QualityClassifier.train(sample, "text",
      length(col("text")) > medLen, buckets = 4096, maxIter = 30)
    val merges = TextAnalysis.bpeTrain(sample, "text", numMerges = 200)

    time("classifier_score")(
      QualityClassifier.score(docs, model, "doc_id", "text").count())
    time("bpe_encode")(docs.select(
      size(TextAnalysis.bpeEncode(col("text"), merges)).as("n"))
      .agg(sum("n")).count())
    spark.stop()
  }
}
