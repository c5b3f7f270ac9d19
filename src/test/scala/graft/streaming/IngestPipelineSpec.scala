package graft.streaming

import graft.SparkSpec
import graft.operators.{AnnIndex, Bm25Index, Dedup, DedupIndex, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IngestPipelineSpec extends SparkSpec {
  import sqlImplicits._

  test("composed ingest: gate → indexed dedup screen → ANN upsert " +
      "survives a kill + crashed-attempt replay with exactly-once accounting") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ingest")
    val dedupDir = s"$root/dedup"
    val annDir = s"$root/ann"
    val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(i => math.sin(seed * 17 + i * 3).toFloat)
    val t1 = "the quick brown fox jumps over the lazy dog and naps in the warm sun"
    val t2 = "a completely different second seed document with many plain english words"
    val t4 = "novel streaming document number four carries enough ordinary words to pass the gate"
    val t6 = "batch two ships an unrelated report about harvest yields across the northern valley"

    // seed all three indexes (batch_id 0 is the dedup seed build)
    val bm25Dir = s"$root/bm25"
    DedupIndex.write(Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"),
      "doc_id", "text", dedupDir, numPerm = 64, bands = 16,
      nBuckets = 64, nSigBuckets = 16, filesPerBucket = 1)
    AnnIndex.write(Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding"),
      annDir, dim = 8, nCells = 2, stride = 1, m = 2, ncodes = 2)
    Bm25Index.write(Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"),
      "doc_id", "text", bm25Dir, nBuckets = 8)

    val input = MemoryStream[(Long, String, Array[Float])]
    val gate: DataFrame => DataFrame =
      df => df.where(TextAnalysis.gopherPass(col("text"),
        minWords = 5L, minStop = 1L))
    def startQ() = IngestPipeline.start(
      input.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", gate, dedupDir, annDir, outDir,
      threshold = 0.8, checkpointDir = ckpt,
      bm25IndexDir = Some(bm25Dir))

    // ---- batch 0: doc 3 = exact copy of seed t1 (dedup-dropped),
    // doc 4 novel (passes everything), doc 5 gate-fail (2 words)
    val q1 = startQ()
    try {
      input.addData((3L, t1, vec(3)), (4L, t4, vec(4)), (5L, "zz zz", vec(5)))
      q1.processAllAvailable()
    } finally q1.stop() // the KILL
    assert(spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().toSet == Set(4L), "batch 0 accounting")

    // ---- forge a CRASHED ATTEMPT of batch 1: every side effect
    // landed, the checkpoint commit did not —
    //  (a) a partial clean-sink partition holding a bogus row,
    Seq((999L, "forged partial row", vec(99)))
      .toDF("doc_id", "text", "embedding")
      .write.parquet(s"$outDir/batch_id=1")
    //  (b) the crashed ANN upsert of doc 6 (its rows are live), and
    AnnIndex.upsert(AnnIndex.open(spark, annDir),
      Seq((6L, vec(6))).toDF("vec_id", "embedding"))
    //  (c) the crashed dedup append claiming doc 6 at stream batch 1
    //      (index batch_id 2 = batchId + 1)
    DedupIndex.appendBatch(DedupIndex.open(spark, dedupDir),
      Dedup.minhashSignature(Seq((6L, t6)).toDF("doc_id", "text"),
        "doc_id", "text"), 2L)
    //  (d) the crashed BM25 append of doc 6 at stream batch 1 — the
    //      replay must REPLACE these partitions, not double them
    Bm25Index.appendDocsBatch(Bm25Index.open(spark, bm25Dir),
      Seq((6L, t6)).toDF("doc_id", "text"), "doc_id", "text", 1L)

    // ---- restart from the checkpoint: batch 1 = doc 6 (novel — it
    // must SURVIVE its own crashed append, beforeBatch excludes it)
    // + doc 7 = exact copy of STREAMED doc 4 (prior appends visible)
    val q2 = startQ()
    try {
      input.addData((6L, t6, vec(6)), (7L, t4, vec(7)))
      q2.processAllAvailable()
    } finally q2.stop()

    // exactly-once accounting: the forged partial partition was
    // REPLACED (dynamic overwrite), never appended beside
    val byBatch = spark.read.parquet(outDir)
      .groupBy("batch_id").agg(collect_set("doc_id").as("ids"))
      .collect()
      // discovered partition columns infer as int
      .map(r => r.getAs[Number]("batch_id").longValue() ->
        r.getSeq[Long](1).toSet).toMap
    assert(byBatch == Map(0L -> Set(4L), 1L -> Set(6L)),
      s"clean-sink accounting diverged: $byBatch")

    // ANN leg: the replayed upsert tombstoned the crashed attempt's
    // copy — an exhaustive search serves every live id EXACTLY once
    val q0 = Seq((100L, vec(1))).toDF("vec_id", "embedding")
    val served = AnnIndex.searchExact(AnnIndex.open(spark, annDir), q0,
        k = 50, nprobe = 2)
      .select("nid").as[Long].collect().toSeq
    assert(served.toSet == Set(1L, 2L, 4L, 6L),
      s"live corpus diverged: ${served.toSet}")
    assert(served.size == served.distinct.size,
      s"a replayed upsert double-served: $served")

    // dedup leg: the forged batch-2 partition was overwritten by the
    // replay (exactly doc 6's signature, once)
    val idx = DedupIndex.open(spark, dedupDir)
    val b2 = idx.sigRows.where(col("batch_id") === 2L)
      .select("doc_id").as[Long].collect().toSeq
    assert(b2 == Seq(6L), s"replayed append must replace the forged " +
      s"partition with exactly doc 6: $b2")

    // lexical leg (r13): the maintained BM25 index serves EXACTLY as
    // an index built whole over the final clean corpus {1, 2, 4, 6} —
    // the crashed batch-1 append was replaced, never double-counted
    // (postings, df deltas, AND the meta scalar deltas all replayed
    // exactly once; a doubled copy would shift tf, df, and idf)
    val maintained = Bm25Index.open(spark, bm25Dir)
    val wholeDir = s"$root/bm25_whole"
    val whole = Bm25Index.write(
      Seq((1L, t1), (2L, t2), (4L, t4), (6L, t6)).toDF("doc_id", "text"),
      "doc_id", "text", wholeDir, nBuckets = 8)
    val qdocs = Seq(
      (100L, "harvest report across the northern valley"),
      (101L, "ordinary streaming document words")).toDF("doc_id", "text")
    def sig(ix: Bm25Index.Index) =
      Bm25Index.search(ix, qdocs, "doc_id", "text", topK = 10)
        .collect().map(_.toString).sorted.toSeq
    val servedBm25 = sig(maintained)
    assert(servedBm25.nonEmpty, "bm25 leg must serve the streamed docs")
    assert(servedBm25 == sig(whole),
      "search-after-restart must equal an index built whole")
  }
}
