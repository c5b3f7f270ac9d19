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

  test("composed ingest with the F10 mined-line screen: boilerplate " +
      "stripped before the dedup/sink/index legs, all-boilerplate docs " +
      "vanish, replay identity preserved (r14)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-f10")
    val dedupDir = s"$root/dedup"; val annDir = s"$root/ann"
    val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    val bm25Dir = s"$root/bm25"; val minedDir = s"$root/mined"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(i => math.sin(seed * 17 + i * 3).toFloat)
    val bp1 = "subscribe to our newsletter and get the app today"
    val bp2 = "copyright twenty twenty six example corp all rights reserved"
    val c1 = "the quick brown fox jumps over the lazy dog and naps in the warm sun"
    val c2 = "a completely different second seed document with many plain english words"
    val c4 = "novel streaming document number four carries enough ordinary words to pass the gate"
    val c6 = "batch two ships an unrelated report about harvest yields across the northern valley"

    // mine the boilerplate table once from a pilot corpus (both
    // banner lines appear in >= 2 docs; the pilot bodies do not)
    Dedup.frequentLines(Seq(
        (900L, s"$bp1\npilot content first row"),
        (901L, s"$bp1\n$bp2\nanother pilot body"),
        (902L, s"$bp2\nthird pilot body text")).toDF("doc_id", "text"),
      "doc_id", "text", minDocs = 2)
      .write.parquet(minedDir)

    // seed all three indexes with CLEAN content (batch_id 0 = seed)
    DedupIndex.write(Seq((1L, c1), (2L, c2)).toDF("doc_id", "text"),
      "doc_id", "text", dedupDir, numPerm = 64, bands = 16,
      nBuckets = 64, nSigBuckets = 16, filesPerBucket = 1)
    AnnIndex.write(Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding"),
      annDir, dim = 8, nCells = 2, stride = 1, m = 2, ncodes = 2)
    Bm25Index.write(Seq((1L, c1), (2L, c2)).toDF("doc_id", "text"),
      "doc_id", "text", bm25Dir, nBuckets = 8)

    val input = MemoryStream[(Long, String, Array[Float])]
    val gate: DataFrame => DataFrame =
      df => df.where(TextAnalysis.gopherPass(col("text"),
        minWords = 5L, minStop = 1L))
    def startQ() = IngestPipeline.start(
      input.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", gate, dedupDir, annDir, outDir,
      threshold = 0.8, checkpointDir = ckpt,
      bm25IndexDir = Some(bm25Dir), frequentLinesDir = Some(minedDir))

    // batch 0: doc 3 = boilerplate-wrapped copy of seed c1 — the
    // screen strips the banner, the dedup screen then drops it vs the
    // STORE (proof the signatures are computed on clean_text); doc 4 =
    // banner + novel content + banner — kept, sink must carry the
    // STRIPPED text; doc 5 = banners only — vanishes at the screen
    val q1 = startQ()
    try {
      input.addData((3L, s"$bp1\n$c1", vec(3)),
        (4L, s"$bp1\n$c4\n$bp2", vec(4)), (5L, s"$bp1\n$bp2", vec(5)))
      q1.processAllAvailable()
    } finally q1.stop() // the KILL
    val sink0 = spark.read.parquet(outDir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(sink0.keySet == Set(4L), s"batch 0 accounting: ${sink0.keySet}")
    assert(sink0(4L) == c4, s"sink must carry clean_text: '${sink0(4L)}'")

    // forge a crashed batch-1 sink partition (the index legs' crash
    // replay is pinned by the r13 test above; this pins the screen's
    // determinism across the replay)
    Seq((999L, "forged partial row", vec(99)))
      .toDF("doc_id", "text", "embedding")
      .write.parquet(s"$outDir/batch_id=1")

    // batch 1 after restart: doc 6 = novel content under a banner;
    // doc 7 duplicates doc 4's CLEAN text under a DIFFERENT banner —
    // it must dedup-drop against the appended clean signatures
    val q2 = startQ()
    try {
      input.addData((6L, s"$c6\n$bp2", vec(6)), (7L, s"$bp2\n$c4", vec(7)))
      q2.processAllAvailable()
    } finally q2.stop()

    val byBatch = spark.read.parquet(outDir)
      .groupBy("batch_id").agg(collect_set("doc_id").as("ids"))
      .collect()
      .map(r => r.getAs[Number]("batch_id").longValue() ->
        r.getSeq[Long](1).toSet).toMap
    assert(byBatch == Map(0L -> Set(4L), 1L -> Set(6L)),
      s"clean-sink accounting diverged: $byBatch")
    val texts = spark.read.parquet(outDir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(texts == Map(4L -> c4, 6L -> c6),
      s"sink must hold exactly the stripped texts: $texts")

    // the lexical leg consumed clean_text: the maintained index equals
    // one built whole over the final CLEAN corpus, and a banner-word
    // query matches nothing (boilerplate never reached the postings)
    val maintained = Bm25Index.open(spark, bm25Dir)
    val whole = Bm25Index.write(
      Seq((1L, c1), (2L, c2), (4L, c4), (6L, c6)).toDF("doc_id", "text"),
      "doc_id", "text", s"$root/bm25_whole", nBuckets = 8)
    val qdocs = Seq(
      (100L, "harvest report across the northern valley"),
      (101L, "ordinary streaming document words")).toDF("doc_id", "text")
    def sig(ix: Bm25Index.Index) =
      Bm25Index.search(ix, qdocs, "doc_id", "text", topK = 10)
        .collect().map(_.toString).sorted.toSeq
    assert(sig(maintained).nonEmpty && sig(maintained) == sig(whole),
      "maintained index must equal an index built whole over clean text")
    val bq = Seq((102L, "newsletter subscribe copyright"))
      .toDF("doc_id", "text")
    assert(Bm25Index.search(maintained, bq, "doc_id", "text", topK = 10)
      .isEmpty, "banner vocabulary must not reach the postings")
  }

  test("composed ingest with the K37 eval-span scrub: leaked benchmark " +
      "spans excised before the dedup/sink/index legs, pure-leak docs " +
      "vanish, replay identity preserved (r15, VERDICT r14 item 5)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-k37")
    val dedupDir = s"$root/dedup"; val annDir = s"$root/ann"
    val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    val bm25Dir = s"$root/bm25"; val evalDir = s"$root/eval"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(i => math.sin(seed * 17 + i * 3).toFloat)
    val leak =
      "the benchmark answer is forty two exactly as printed right here"
    val c1 = "the quick brown fox jumps over the lazy dog and naps in the warm sun"
    val c2 = "a completely different second seed document with many plain english words"
    val c4 = "novel streaming document number four carries enough ordinary words to pass the gate"
    val c6 = "batch two ships an unrelated report about harvest yields across the northern valley"

    // the immutable eval table (the benchmark suite)
    Seq((800L, leak)).toDF("doc_id", "text").write.parquet(evalDir)

    // seed all three indexes with CLEAN content (batch_id 0 = seed)
    DedupIndex.write(Seq((1L, c1), (2L, c2)).toDF("doc_id", "text"),
      "doc_id", "text", dedupDir, numPerm = 64, bands = 16,
      nBuckets = 64, nSigBuckets = 16, filesPerBucket = 1)
    AnnIndex.write(Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding"),
      annDir, dim = 8, nCells = 2, stride = 1, m = 2, ncodes = 2)
    Bm25Index.write(Seq((1L, c1), (2L, c2)).toDF("doc_id", "text"),
      "doc_id", "text", bm25Dir, nBuckets = 8)

    val input = MemoryStream[(Long, String, Array[Float])]
    val gate: DataFrame => DataFrame =
      df => df.where(TextAnalysis.gopherPass(col("text"),
        minWords = 5L, minStop = 1L))
    def startQ() = IngestPipeline.start(
      input.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", gate, dedupDir, annDir, outDir,
      threshold = 0.8, checkpointDir = ckpt,
      bm25IndexDir = Some(bm25Dir), evalScrubDir = Some(evalDir))

    // batch 0: doc 3 = novel content with the leaked benchmark
    // sentence appended — kept, sink must carry the EXCISED rebuild;
    // doc 5 = the leak verbatim and nothing else — passes the gate,
    // then vanishes at the scrub (pure contamination)
    val q1 = startQ()
    try {
      input.addData((3L, s"$c4 $leak", vec(3)), (5L, leak, vec(5)))
      q1.processAllAvailable()
    } finally q1.stop() // the KILL
    val sink0 = spark.read.parquet(outDir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(sink0.keySet == Set(3L), s"batch 0 accounting: ${sink0.keySet}")
    assert(sink0(3L) == c4, s"sink must carry the scrubbed text: " +
      s"'${sink0(3L)}'")

    // forge a crashed batch-1 sink partition: the replay must REPLACE
    // it, proving the scrub is deterministic across the restart
    Seq((999L, "forged partial row", vec(99)))
      .toDF("doc_id", "text", "embedding")
      .write.parquet(s"$outDir/batch_id=1")

    // batch 1 after restart: doc 6 = novel content with the leak
    // embedded — kept scrubbed; doc 7 = doc 3's SCRUBBED text plus the
    // leak again — its post-scrub signature equals doc 3's appended
    // clean signature, so it dedup-drops (proof the dedup index
    // consumed scrubbed text)
    val q2 = startQ()
    try {
      input.addData((6L, s"$c6 $leak", vec(6)), (7L, s"$leak $c4", vec(7)))
      q2.processAllAvailable()
    } finally q2.stop()

    val byBatch = spark.read.parquet(outDir)
      .groupBy("batch_id").agg(collect_set("doc_id").as("ids"))
      .collect()
      .map(r => r.getAs[Number]("batch_id").longValue() ->
        r.getSeq[Long](1).toSet).toMap
    assert(byBatch == Map(0L -> Set(3L), 1L -> Set(6L)),
      s"clean-sink accounting diverged: $byBatch")
    val texts = spark.read.parquet(outDir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(texts == Map(3L -> c4, 6L -> c6),
      s"sink must hold exactly the scrubbed texts: $texts")

    // the lexical leg consumed scrubbed text: the maintained index
    // equals one built whole over the final SCRUBBED corpus, and a
    // leak-vocabulary query matches nothing
    val maintained = Bm25Index.open(spark, bm25Dir)
    val whole = Bm25Index.write(
      Seq((1L, c1), (2L, c2), (3L, c4), (6L, c6)).toDF("doc_id", "text"),
      "doc_id", "text", s"$root/bm25_whole", nBuckets = 8)
    val qdocs = Seq(
      (100L, "harvest report across the northern valley"),
      (101L, "ordinary streaming document words")).toDF("doc_id", "text")
    def sig(ix: Bm25Index.Index) =
      Bm25Index.search(ix, qdocs, "doc_id", "text", topK = 10)
        .collect().map(_.toString).sorted.toSeq
    assert(sig(maintained).nonEmpty && sig(maintained) == sig(whole),
      "maintained index must equal an index built whole over scrubbed text")
    val lq = Seq((102L, "benchmark printed forty"))
      .toDF("doc_id", "text")
    assert(Bm25Index.search(maintained, lq, "doc_id", "text", topK = 10)
      .isEmpty, "leaked benchmark vocabulary must not reach the postings")
  }
}
