package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted BM25 inverted index (SURVEY H18) — the LEXICAL twin of
  * the G11 ANN index, completing the serving story: [[TextAnalysis
  * .bm25Retrieve]] re-tokenizes the corpus on every query batch, which
  * is the one-job shape; this operator writes the posting lists ONCE
  * and serves every later query batch from a partition-pruned read,
  * the same on-disk mechanism AnnIndex uses for cells (reference
  * analog: the partition-pruned ParquetDataset read,
  * python/pyarrow/parquet.py `ParquetDataset(filters=...)`).
  *
  * On-disk layout under `dir`:
  *   postings/term_bucket=N/ — parquet of (term, doc_id, tf, dl, df):
  *       the inverted index, hash-bucketed by term so a query's terms
  *       prune to their buckets on disk. df and dl are DENORMALIZED
  *       into the posting rows at build time, so scoring needs no
  *       joins beyond the bounded query-term broadcast.
  *   meta/ — one row (n_docs, sum_dl, n_buckets): the corpus scalars
  *       BM25 needs, loaded bounded at open. Opening runs no corpus
  *       job.
  *
  * Search cost model at 100 TB: a query batch with T distinct terms
  * reads at most T of `nBuckets` partitions — posting lists for the
  * queried vocabulary slice, never the corpus — and the only shuffle
  * is the (qid, nid)-keyed score aggregation over matched postings
  * (the posting-list fan-out, exactly bm25Retrieve's join bound).
  * Scoring mirrors [[TextAnalysis.bm25TermScore]]'s expression tree
  * term for term, so index search equals the recompute path
  * bit-for-bit (spec-pinned) and inherits q_bm25's oracle.
  *
  * Maintenance discipline: df is denormalized onto posting rows, so
  * a naive append would silently stale every existing term's idf.
  * Rebuild-per-version remains the baseline (cheap: one tokenize
  * pass). r9 adds EXACT incremental append between rebuilds
  * ([[appendDocs]]): appended postings carry df = 0 and each batch
  * writes an additive per-term (bucket-partitioned) df-delta table
  * plus a one-row meta delta; search reconstructs the effective df
  * for the QUERIED terms only — a bounded agg over the already
  * bucket-pruned slice plus the pruned delta rows, never a
  * vocabulary-sized join — so search-after-append equals a
  * from-scratch rebuild bit-for-bit (spec-pinned). Indexes that were
  * never appended to skip the whole path (one fs.exists).
  */
object Bm25Index {

  /** An opened index: bounded scalars + the lazy bucketed postings.
    * `postingsDir` is pinned through the CURRENT pointer at open (r9,
    * [[IndexVersions]]): a rebuild publishing a newer version never
    * changes what this object serves.
    */
  final case class Index(spark: SparkSession, dir: String,
                         nBuckets: Int, nDocs: Long, sumDl: Long,
                         postingsDir: String, version: Long) {
    /** Build postings plus any batch-keyed appended postings (r13:
      * [[appendDocsBatch]] lands micro-batch rows in a sibling
      * batch-partitioned dataset so a streaming replay can REPLACE its
      * crashed attempt). The union is column-aligned; term_bucket
      * pruning pushes into both legs.
      */
    def postings: DataFrame = {
      val base = spark.read.parquet(postingsDir)
      val bdir = batchPostingsDir(this)
      if (!exists(spark, bdir)) base
      else base.unionByName(
        visibleBatches(this, spark.read.parquet(bdir))
          .select("term", "doc_id", "tf", "dl", "df", "term_bucket"))
    }

    // Ledger cache (r15 ADVICE): ledgerEntries re-read the whole
    // unversioned dir at the start of EVERY appendDocsBatch — O(files)
    // opens per batch, O(N²) cumulative over a long-lived stream (the
    // ~0.36 ms/file-open pathology DedupServeProbe measured). The map
    // is bounded (≤ a few rows per batch) so it caches on the handle;
    // every ledger write through this handle invalidates. Same
    // single-writer ownership contract as the DedupIndex listing cache.
    // Reader side: a handle that never writes pins the done-horizon it
    // first read (visibleBatches), so it serves the then-published
    // snapshot — consistent, never torn — until re-opened; freshness
    // across handles is the GEN-watcher re-open contract
    // (GraftServer.watchIndexes), exactly as for file listings.
    // `lazy` so a deserialized handle degrades to a re-read, not an NPE.
    @transient private[Bm25Index] lazy val ledgerCache =
      new java.util.concurrent.atomic.AtomicReference[
        Map[Long, (Long, Boolean, Option[Long])]]()
  }

  private def bucketOf(term: Column, nBuckets: Int): Column =
    pmod(hash(term), lit(nBuckets)).cast(LongType)

  /** The (doc_id, dl, term, tf) relation: dl attaches map-side BEFORE
    * the explode (the token-array size — no doc-keyed window), tf by a
    * composite-keyed aggregate whose key CONTAINS doc_id, so no term,
    * however common, concentrates a partition.
    */
  private[operators] def tfRelation(corpus: DataFrame, idCol: String,
                                    textCol: String): DataFrame =
    corpus
      .select(col(idCol).as("doc_id"),
        TextAnalysis.filteredTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

  /** Denormalize df onto the posting rows via a map-side-combined
    * `groupBy(term)` joined back — NOT a `Window.partitionBy(term)`:
    * a Zipf-head term ("the") appears in essentially every document,
    * so its window partition would be corpus-sized on one reducer and
    * AQE cannot split window partitions, where it CAN skew-split this
    * join (the r9 H12/H18 fix — the same shape H14 uses, the K15
    * lesson).
    */
  private[operators] def withDf(rel: DataFrame, nBuckets: Int): DataFrame =
    rel.join(rel.groupBy("term").agg(count(lit(1)).as("df")), "term")
      .withColumn("term_bucket", bucketOf(col("term"), nBuckets))
      .select("term", "doc_id", "tf", "dl", "df", "term_bucket")

  /** Build and persist. The tf relation is materialized once
    * (DISK_ONLY) because both the df aggregate and the join consume
    * it — without the persist each branch would re-tokenize the
    * corpus; with it the build pays exactly one tokenize pass plus one
    * read of the compact post-aggregate relation. Set
    * `persistRelation = false` when the corpus is a GENERATED or
    * otherwise IO-free relation (the AnnGenServe discipline): two
    * cheap recomputes beat materializing a corpus-sized relation to
    * local disk.
    *
    * The salted repartition before the write is the AnnIndex
    * `filesPerCell` pattern: `filesPerBucket` writer tasks per bucket,
    * so the bucket holding the hottest vocabulary slice doesn't
    * serialize one giant writer (with the D7 bound still in force —
    * nBuckets × filesPerBucket files total, never tasks × buckets).
    *
    * MEMORY SIZING (r13, the 48 GB attribution — BM25_SERVE_r13): the
    * build's heap demand is per-task EXECUTION memory in the tf
    * aggregate and df join — it scales with tokens-per-shuffle-
    * partition, not with any driver-held state (there is none: the
    * only collects are the 1-row corpus stats and the version
    * pointer). At 15M docs / 812M tokens, 32 shuffle partitions
    * GC-thrashed an 8 GB heap into a 630 s build needing 48 GB to run
    * smoothly, while 256 partitions ran the SAME build in 194-209 s
    * inside the 8 GB DEFAULT heap. Size
    * `spark.sql.shuffle.partitions` so a partition holds ≲5M token
    * rows; on a real cluster this is the ordinary per-executor
    * sizing, conflated into one JVM only under local[*].
    */
  def write(corpus: DataFrame, idCol: String, textCol: String,
            dir: String, nBuckets: Int = 64,
            filesPerBucket: Int = 4,
            persistRelation: Boolean = true): Index = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(filesPerBucket >= 1,
      s"filesPerBucket must be >= 1: $filesPerBucket")
    val spark = corpus.sparkSession
    // versioned publication (r9): this index REBUILDS per corpus
    // version (df is denormalized — see the maintenance note above),
    // which is exactly the racy in-place overwrite the CURRENT-pointer
    // flip removes: the new postings+meta land in fresh .v(N+1)
    // directories, readers stay on .vN, and the atomic flip below
    // publishes; a crashed rebuild leaves the old version live
    val v = IndexVersions.current(spark, dir).getOrElse(0L) + 1L
    val relRaw = tfRelation(corpus, idCol, textCol)
    val rel =
      if (persistRelation)
        relRaw.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else relRaw
    try {
      // term-stats sidecar FIRST (r13): the (term, df) relation —
      // one row per vocabulary term, bucket-partitioned like the
      // postings — materialized from the df aggregate the build
      // needs anyway. Searches that must learn df (the maxDfShare
      // head-elision probe, the post-append reconstruction) read
      // THIS vocabulary-sized table instead of scanning the
      // corpus-sized postings: at 30M generated docs the probe
      // against postings cost more than the elision saved
      // (BM25_SERVE_r13). The postings df column then comes from
      // reading the sidecar back — the aggregate is computed once.
      val dfAgg = rel.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("term_bucket", bucketOf(col("term"), nBuckets))
      dfAgg.repartition(col("term_bucket"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$dir/term_stats.v$v")
      val stats = spark.read.parquet(s"$dir/term_stats.v$v")
        .select("term", "df")
      rel.join(stats, "term")
        .withColumn("term_bucket", bucketOf(col("term"), nBuckets))
        .select("term", "doc_id", "tf", "dl", "df", "term_bucket")
        .repartition(nBuckets * filesPerBucket, col("term_bucket"),
          pmod(hash(col("doc_id")), lit(filesPerBucket)))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$dir/postings.v$v")
      TextAnalysis.corpusStats(corpus, textCol)
        .withColumn("n_buckets", lit(nBuckets))
        .write.mode("overwrite").parquet(s"$dir/meta.v$v")
    } finally if (persistRelation) rel.unpersist()
    IndexVersions.publish(spark, dir, v)
    open(spark, dir)
  }

  def open(spark: SparkSession, dir: String): Index = {
    // resolve the published version once and pin it (legacy
    // unversioned layouts resolve as version 0)
    val (postingsDir, v) = IndexVersions.resolve(spark, dir, "postings")
    val metaDir = if (v == 0L) s"$dir/meta" else s"$dir/meta.v$v"
    val m = spark.read.parquet(metaDir).collect()(0)
    Index(spark, dir, m.getAs[Int]("n_buckets"),
      m.getAs[Long]("n_docs"), m.getAs[Long]("sum_dl"), postingsDir, v)
  }

  /** Reclaim superseded versions in a maintenance window. */
  def vacuum(index: Index): Unit =
    IndexVersions.vacuum(index.spark, index.dir, index.version,
      Seq("postings", "meta", "doc_tombstones", "df_deltas",
        "meta_deltas", "postings_batches", "df_delta_batches",
        "meta_delta_batches", "term_stats"))

  // ---------------------------------------------- r9: exact appends
  //
  // The lifecycle twin of AnnIndex.append, made exact despite the
  // denormalized df: appended posting rows carry df = 0 (the additive
  // base), each batch appends (term, df_delta) rows — partitioned by
  // term_bucket, so a query prunes delta IO exactly like postings —
  // and a one-row (n_docs, sum_dl) meta delta. At search time the
  // effective df for each QUERIED term is max(build df over the
  // pruned slice) + sum(pruned deltas): build rows share one df value
  // per term, appended rows contribute 0, and terms born in an append
  // resolve to delta-only. Scalars add the meta deltas. Everything is
  // bounded by the queried vocabulary slice; a never-appended index
  // pays one fs.exists and keeps the row-local scoring plan.

  private def deltaDir(index: Index): String =
    s"${index.dir}/df_deltas.v${index.version}"
  private def metaDeltaDir(index: Index): String =
    s"${index.dir}/meta_deltas.v${index.version}"
  // r13: the batch-keyed twins — [[appendDocsBatch]]'s landing zones,
  // partitioned by batch_id so a streaming replay REPLACES its crashed
  // attempt (dynamic overwrite) instead of appending beside it
  private def batchPostingsDir(index: Index): String =
    s"${index.dir}/postings_batches.v${index.version}"
  private def batchDeltaDir(index: Index): String =
    s"${index.dir}/df_delta_batches.v${index.version}"
  private def batchMetaDeltaDir(index: Index): String =
    s"${index.dir}/meta_delta_batches.v${index.version}"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  // r14: the batch ledger — the UNVERSIONED (batch_id, version, state)
  // record of every appendDocsBatch, state ∈ {intent, done}, intent
  // written BEFORE the data writes and done after all three commit.
  // It closes the replay-across-republish hole (r13 ADVICE):
  // appendDocsBatch resolves CURRENT at call time, so without a ledger
  // a batch that crashed under version v and replays after a
  // compactDeltas publish lands a SECOND copy in v+1's batch dirs
  // while its crashed rows sit folded in the compacted base.
  // With the ledger:
  //  - a replay whose batch is DONE under an OLDER version SKIPS (its
  //    rows are complete in the old version's lineage, which the
  //    compacted base folded in);
  //  - [[compactDeltas]] REFUSES to run while any of the current
  //    version's batches is intent-without-done (folding a possibly
  //    partial batch is the unrecoverable half of the race);
  //  - a replay at the SAME version proceeds — dynamic partition
  //    overwrite replaces the crashed attempt exactly as before;
  //  - intent-without-done under an OLDER version throws: someone
  //    republished (write()) underneath an uncommitted stream batch,
  //    which no replay can reconcile — loud beats silently wrong.
  // The ledger is bounded (≤ 2 tiny rows per batch) and read as a
  // driver-side map; it survives compaction/vacuum by design.
  //
  // r15 (ADVICE): entries also carry `fp`, a content fingerprint of
  // the batch (sum of per-doc xxhash64(id, text) — order-independent,
  // deterministic over the checkpointed offsets a replay recomputes).
  // The done-under-older-version skip VERIFIES the fingerprint: a true
  // replay matches and skips (loudly, see [[appendDocsBatch]]); a
  // FRESH batch reusing an old id after a checkpoint reset mismatches
  // and throws, instead of being silently dropped from the index while
  // the other ingest legs absorb it. Legacy ledgers without the column
  // read fp = None (skip stays loud but unverified).
  private def ledgerDir(dir: String): String = s"$dir/batch_ledger"

  /** Order-independent content fingerprint of a batch (bounded: one
    * scalar aggregate over the micro-batch). bit_xor, not sum — a
    * hash sum overflows Long and ANSI mode turns that into a
    * task-killing exception.
    */
  private def batchFingerprint(docs: DataFrame, idCol: String,
                               textCol: String): Long =
    docs.select(xxhash64(col(idCol), col(textCol)).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)))
      .collect()(0).getLong(0)

  private def ledgerAppend(index: Index, batchId: Long,
                           state: String, fp: Long): Unit = {
    val spark = index.spark
    spark.range(1)
      .select(lit(batchId).cast(LongType).as("batch_id"),
        lit(index.version).cast(LongType).as("version"),
        lit(state).as("state"),
        lit(fp).cast(LongType).as("fp"))
      .coalesce(1)
      .write.mode("append").parquet(ledgerDir(index.dir))
    index.ledgerCache.set(null)
  }

  /** (version, done?, done-row fingerprint) per recorded batch —
    * bounded driver read, cached on the handle (r15 ADVICE: a
    * long-lived stream must not pay O(ledger files) opens per batch).
    */
  private def ledgerEntries(
      index: Index): Map[Long, (Long, Boolean, Option[Long])] = {
    val pre = index.ledgerCache.get()
    if (pre != null) return pre
    val ld = ledgerDir(index.dir)
    val m: Map[Long, (Long, Boolean, Option[Long])] =
      if (!exists(index.spark, ld)) Map.empty
      else {
        val raw = index.spark.read.option("mergeSchema", "true").parquet(ld)
        val withFp = // pre-r15 ledgers have no fp column
          if (raw.columns.contains("fp")) raw
          else raw.withColumn("fp", lit(null).cast(LongType))
        withFp.groupBy("batch_id")
          .agg(max("version").as("version"),
            max(when(col("state") === "done", lit(1)).otherwise(lit(0)))
              .as("done"),
            max(when(col("state") === "done", col("fp"))).as("fp_done"))
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2) == 1,
            if (r.isNullAt(3)) None else Some(r.getLong(3)))))
          .toMap
      }
    index.ledgerCache.compareAndSet(null, m)
    m
  }

  /** Fold the append-only ledger into one row per batch (r15 ADVICE:
    * two tiny files per batch, re-listed per append, is the measured
    * ~0.36 ms/file-open pathology — O(N²) cumulative over a stream's
    * life). The folded rows reproduce [[ledgerEntries]]'s aggregate
    * EXACTLY (max version, done-any, done-row fingerprint), so every
    * consumer is unchanged; crash-safe because the fold APPENDS the
    * folded file first and deletes only the files it listed — a crash
    * between the two leaves duplicates that the max/any aggregate
    * absorbs. Runs inside [[compactDeltas]] (single-writer maintenance
    * window, after the in-flight refusal) once the dir passes
    * `minFiles`.
    */
  private[operators] def foldLedger(index: Index,
                                    minFiles: Int = 16): Unit = {
    val ld = ledgerDir(index.dir)
    val spark = index.spark
    if (!exists(spark, ld)) return
    val p = new org.apache.hadoop.fs.Path(ld)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val old = fs.listStatus(p).filter(_.isFile).map(_.getPath)
    if (old.length < minFiles) return
    val entries = ledgerEntries(index)
    val rows = entries.toSeq.map { case (b, (v, done, fp)) =>
      (b, v, if (done) "done" else "intent", fp.map(Long.box).orNull)
    }
    import spark.implicits._
    rows.toDF("batch_id", "version", "state", "fp")
      .select(col("batch_id").cast(LongType), col("version").cast(LongType),
        col("state"), col("fp").cast(LongType))
      .coalesce(1)
      .write.mode("append").parquet(ld)
    old.foreach(f => fs.delete(f, false))
    index.ledgerCache.set(null)
  }

  /** Publication horizon for the batch-keyed append legs (r15, the
    * serve×mutation seam — VERDICT r14 item 7): batch partitions are
    * readable ONLY once their ledger state is `done`. appendDocsBatch
    * orders intent → data writes → done → GEN bump, so without the
    * gate a plan built mid-append could list SOME of a batch's
    * partitions (dynamic overwrite commits per-partition renames)
    * before the batch's df/meta deltas exist — a torn state that is
    * neither the pre- nor the post-append result. With the gate, the
    * done-row commit IS the atomic publish: a concurrent reader's
    * ledger snapshot either contains it (whole batch + its deltas
    * visible — all landed before done) or not (batch fully invisible).
    * Mechanics: keep `batch_id ≤ max(done)` (hides later batches whose
    * intent the snapshot hasn't seen — ids are monotone under the
    * foreachBatch contract) and drop known in-flight ids; both
    * predicates hit the batch_id PARTITION column, so the gate prunes
    * directories, never scans rows. Indexes with no ledger (legacy /
    * never-batch-appended) read unfiltered, as before. Residual
    * window, documented: the very first batch on a ledger-less index
    * can race a reader that listed data files before the intent row
    * (no horizon exists yet to hide it); [[appendDocs]] (the
    * non-batch form) keeps its mode("append") torn-visibility
    * contract — use appendDocsBatch under concurrent serving.
    */
  private def visibleBatches(index: Index, df: DataFrame): DataFrame = {
    val e = ledgerEntries(index)
    if (e.isEmpty) df
    else {
      val done = e.collect { case (b, (_, true, _)) => b }
      val inflight = e.collect { case (b, (_, false, _)) => b }.toSeq
      val cut =
        if (done.isEmpty) lit(false) // ledger exists, nothing published
        else col("batch_id") <= lit(done.max)
      val pred =
        if (inflight.isEmpty) cut
        else cut && !col("batch_id").isin(inflight.map(Long.box): _*)
      df.where(pred)
    }
  }

  /** The (term, df_delta, term_bucket) delta relation across both
    * append paths, or None when this version was never appended to.
    * The batch leg is gated on the done horizon ([[visibleBatches]]).
    */
  private def dfDeltas(index: Index): Option[DataFrame] = {
    val spark = index.spark
    val legs = Seq(
      Some(deltaDir(index)).filter(exists(spark, _))
        .map(d => spark.read.parquet(d)),
      Some(batchDeltaDir(index)).filter(exists(spark, _))
        .map(d => visibleBatches(index, spark.read.parquet(d))))
      .flatten.map(_.select("term", "df_delta", "term_bucket"))
    legs.reduceOption(_ unionByName _)
  }

  /** The (n_docs, sum_dl) meta-delta relation across both append
    * paths, or None when this version was never appended to.
    * The batch leg is gated on the done horizon ([[visibleBatches]]).
    */
  private def metaDeltas(index: Index): Option[DataFrame] = {
    val spark = index.spark
    val legs = Seq(
      Some(metaDeltaDir(index)).filter(exists(spark, _))
        .map(d => spark.read.parquet(d)),
      Some(batchMetaDeltaDir(index)).filter(exists(spark, _))
        .map(d => visibleBatches(index, spark.read.parquet(d))))
      .flatten.map(_.select("n_docs", "sum_dl"))
    legs.reduceOption(_ unionByName _)
  }

  /** Corpus scalars for this version: base meta plus any accumulated
    * deltas — a bounded driver read (one row per append batch).
    */
  private def effectiveScalars(index: Index): (Long, Long) =
    metaDeltas(index) match {
      case None => (index.nDocs, index.sumDl)
      case Some(md) =>
        // coalesce: a delta dir can exist with zero readable rows (a
        // crashed append's partial landing) — nulls here must read as
        // "no delta", never NPE (r14 ADVICE)
        val d = md.agg(coalesce(sum("n_docs"), lit(0L)),
          coalesce(sum("sum_dl"), lit(0L))).collect()(0)
        (index.nDocs + d.getLong(0), index.sumDl + d.getLong(1))
    }

  /** Append `newDocs` to the index's CURRENT version: one tokenize
    * pass; postings land in the existing bucket partitions (df = 0),
    * the batch's per-term document counts land in the delta table, and
    * the corpus scalars get a delta row. Searches on this version pick
    * the rows up on the next partition discovery; scalars and df are
    * reconstructed per search, so results equal a full rebuild.
    */
  def appendDocs(index: Index, newDocs: DataFrame, idCol: String,
                 textCol: String, filesPerBucket: Int = 1): Unit = {
    require(filesPerBucket >= 1,
      s"filesPerBucket must be >= 1: $filesPerBucket")
    val rel = tfRelation(newDocs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      // token-empty batch guard (r14 ADVICE): a batch whose docs all
      // tokenize to nothing contributes NO postings, NO df deltas and —
      // because corpusStats counts only docs with >= 1 token — NO meta
      // delta either; writing the empty partitioned datasets anyway
      // would leave file-less dirs that poison every later
      // spark.read.parquet (schema inference has nothing to read).
      // Skipping all three writes keeps search == built-whole exactly.
      if (rel.isEmpty) return
      rel.withColumn("df", lit(0L))
        .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
        .select("term", "doc_id", "tf", "dl", "df", "term_bucket")
        .repartition(index.nBuckets * filesPerBucket, col("term_bucket"),
          pmod(hash(col("doc_id")), lit(filesPerBucket)))
        .write.mode("append").partitionBy("term_bucket")
        .parquet(index.postingsDir)
      rel.groupBy("term").agg(count(lit(1)).as("df_delta"))
        .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
        .repartition(col("term_bucket"))
        .write.mode("append").partitionBy("term_bucket")
        .parquet(deltaDir(index))
      TextAnalysis.corpusStats(newDocs, textCol)
        .coalesce(1)
        .write.mode("append").parquet(metaDeltaDir(index))
      // in-version mutation: advance the watcher counter (r12) so a
      // GraftServer.watchIndexes plan pinned to the pre-append file
      // listing rebuilds on its next request
      IndexVersions.bumpGeneration(index.spark, index.dir)
    } finally rel.unpersist()
  }

  /** The REPLAY-IDEMPOTENT form of [[appendDocs]] for the composed
    * streaming ingest (I15, r13): identical search semantics — df = 0
    * postings, per-term df deltas, a meta delta row — but every
    * relation lands in a `batch_id`-partitioned dataset with DYNAMIC
    * overwrite, so a micro-batch killed mid-append and replayed from
    * its checkpoint REPLACES its crashed attempt's partitions instead
    * of appending a second copy beside them (the IncrementalDedup /
    * clean-sink rule; plain [[appendDocs]]'s `mode("append")` would
    * double-count every replayed posting and df delta). The replay is
    * exact because the pipeline is deterministic over checkpointed
    * offsets: a replayed batch computes the same postings, so
    * overwriting its own partitions converges to exactly-once rows.
    *
    * Search-after-restart equals an index built whole over the final
    * corpus (spec-pinned), exactly as for [[appendDocs]]: search and
    * compaction read both append paths through one unioned relation,
    * with bucket pruning pushed into each leg.
    *
    * Versions (r14): replay idempotency is per index VERSION — the
    * batch dirs are version-keyed, so a republish between a crashed
    * batch and its replay would otherwise double-count. The batch
    * ledger (see [[ledgerDir]]) makes the composition safe: a batch
    * already DONE under an older version is skipped (its rows live in
    * that version's lineage, folded forward by compaction), an
    * in-flight batch blocks [[compactDeltas]], and an in-flight batch
    * stranded under an older version throws.
    */
  def appendDocsBatch(index: Index, newDocs: DataFrame, idCol: String,
                      textCol: String, batchId: Long,
                      filesPerBucket: Int = 1): Unit = {
    require(filesPerBucket >= 1,
      s"filesPerBucket must be >= 1: $filesPerBucket")
    // content fingerprint (r15 ADVICE): recorded with the ledger rows
    // and VERIFIED on the done-under-older-version skip, so a fresh
    // batch reusing an old batchId (checkpoint reset, index reuse
    // across streams) throws instead of silently vanishing from this
    // index while the other ingest legs absorb it
    val fpNew = batchFingerprint(newDocs, idCol, textCol)
    ledgerEntries(index).get(batchId) match {
      case Some((v, true, fpOld)) if v < index.version =>
        // complete under an older version: the compacted/republished
        // lineage already contains this batch exactly once — replaying
        // it into the current version's batch dirs would double-count
        if (fpOld.exists(_ != fpNew))
          throw new IllegalStateException(
            s"appendDocsBatch(batch_id=$batchId): ledger has this batch " +
              s"done under older version $v with a DIFFERENT content " +
              s"fingerprint (${fpOld.get} vs $fpNew). The batchId is " +
              "being reused for new data (checkpoint reset / new stream " +
              "on a republished index); skipping would silently drop " +
              "it. Use fresh batchIds (or a fresh ledger) for a new " +
              "stream.")
        org.apache.logging.log4j.LogManager.getLogger(getClass)
          .warn(s"Bm25Index.appendDocsBatch(batch_id=$batchId): skipped" +
            s" — already done under older version $v (CURRENT " +
            s"${index.version}); rows live in the compacted lineage." +
            fpOld.fold(" (legacy ledger row: fingerprint unverified)")(
              _ => " Content fingerprint verified equal."))
        return
      case Some((v, false, _)) if v < index.version =>
        throw new IllegalStateException(
          s"appendDocsBatch(batch_id=$batchId): batch is in-flight " +
            s"(intent without done) under older index version $v, but " +
            s"CURRENT is ${index.version}. A republish ran underneath " +
            "an uncommitted stream batch; its partial rows cannot be " +
            "reconciled by replay. Do not write()/compactDeltas() " +
            "while the ingest stream has an uncommitted batch.")
      case Some((_, true, fpOld)) if fpOld.contains(fpNew) =>
        // SAME-version replay of a COMPLETED batch (the crash fell
        // between the done record and the stream's checkpoint commit):
        // the data is whole and identical — skip, so concurrent
        // readers never catch its partitions mid-rewrite (r15, the
        // serve×mutation seam). A same-version done batch with a
        // DIFFERENT fingerprint falls through to the overwrite below —
        // the deliberate-overwrite escape hatch, outside the
        // deterministic-replay contract.
        return
      case _ => // new batch, or a same-version replay of a crashed
        // (intent-without-done) attempt: proceed — dynamic partition
        // overwrite replaces the crashed attempt's partitions, which
        // the done-horizon gate keeps invisible to readers throughout
    }
    val rel = tfRelation(newDocs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      // token-empty batch guard (r14 ADVICE): see [[appendDocs]] — a
      // file-less partitioned dir breaks every later read, and
      // corpusStats would emit an (n_docs=0, sum_dl=null) delta row
      if (rel.isEmpty) return
      ledgerAppend(index, batchId, "intent", fpNew)
      rel.withColumn("df", lit(0L))
        .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
        .withColumn("batch_id", lit(batchId))
        .select("term", "doc_id", "tf", "dl", "df", "term_bucket",
          "batch_id")
        .repartition(index.nBuckets * filesPerBucket, col("term_bucket"),
          pmod(hash(col("doc_id")), lit(filesPerBucket)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket", "batch_id")
        .parquet(batchPostingsDir(index))
      rel.groupBy("term").agg(count(lit(1)).as("df_delta"))
        .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
        .withColumn("batch_id", lit(batchId))
        .repartition(col("term_bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket", "batch_id")
        .parquet(batchDeltaDir(index))
      TextAnalysis.corpusStats(newDocs, textCol)
        .withColumn("batch_id", lit(batchId))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(batchMetaDeltaDir(index))
      ledgerAppend(index, batchId, "done", fpNew)
      IndexVersions.bumpGeneration(index.spark, index.dir)
    } finally rel.unpersist()
  }

  /** Fold accumulated df deltas and doc tombstones into a fresh
    * postings version WITHOUT re-tokenizing the corpus — the lexical
    * twin of `AnnIndex.compactCells`. Everything derives from the
    * index's own rows: each term's effective df is the exact
    * search-time reconstruction (max build df + delta sum, a
    * map-side-combined groupBy joined back — the same skew-safe shape
    * as the build), tombstoned documents drop physically, and the
    * corpus scalars are base + meta deltas (delete-conservative,
    * matching search semantics). The result publishes as
    * postings.v(N+1)/meta.v(N+1) through the CURRENT flip; the new
    * version carries no delta or tombstone dirs, so searches on it
    * take the row-local single-relation plan again. Search results are
    * IDENTICAL before and after compaction (spec-pinned), and open
    * readers pinned to the old version are undisturbed until
    * [[vacuum]].
    */
  /** Stage one bucket group of compacted version `v` — the
    * partition-pruned unit of [[compactDeltas]]'s bucketsPerJob mode.
    * df is a function of `term` and `term` determines `term_bucket`,
    * so a group folds independently: both postings legs and both delta
    * legs prune to the group's partitions, and the rewrite's transient
    * shuffle is group-sized instead of corpus-sized. Writes stage into
    * the SHARED v directories with dynamic partition overwrite, so a
    * crashed run's redo replaces its own partitions.
    */
  private def compactBucketGroup(index: Index, v: Long,
                                 filesPerBucket: Int,
                                 group: Seq[Int]): Unit = {
    val inG = col("term_bucket")
      .isin(group.map(b => Long.box(b.toLong)): _*)
    val slice = index.postings.where(inG)
    val baseDf = slice.groupBy("term").agg(max(col("df")).as("df_base"))
    val dfEff = dfDeltas(index) match {
      case None =>
        baseDf.select(col("term"), col("df_base").as("df_eff"))
      case Some(deltas) =>
        baseDf.join(
          deltas.where(inG).groupBy("term")
            .agg(sum(col("df_delta")).as("df_add")),
          Seq("term"), "full_outer")
          .select(col("term"),
            (coalesce(col("df_base"), lit(0L)) +
              coalesce(col("df_add"), lit(0L))).as("df_eff"))
    }
    // one aggregate, two consumers — the group's vocabulary slice
    // persists (bounded: vocab/nBuckets × group size) instead of the
    // whole path's read-back, which would need schema inference on a
    // dir the first group may not have populated yet
    val statsG = dfEff.select(col("term"), col("df_eff").as("df"))
      .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      statsG.repartition(col("term_bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket")
        .parquet(s"${index.dir}/term_stats.v$v")
      aliveDocs(index, slice)
        .drop("df").join(statsG.select("term", "df"), "term")
        .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
        .select("term", "doc_id", "tf", "dl", "df", "term_bucket")
        .repartition(group.size * filesPerBucket, col("term_bucket"),
          pmod(hash(col("doc_id")), lit(filesPerBucket)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket")
        .parquet(s"${index.dir}/postings.v$v")
    } finally statsG.unpersist()
  }

  /** `bucketsPerJob` (r15, VERDICT r14 item 2): 0 (default) folds all
    * postings in ONE job — the original shape, whose transient shuffle
    * footprint is the whole corpus re-keyed at once (~50 GB at 100M
    * docs on this box: the measured reason the sliced 100M index could
    * not compact, BM25_SERVE_r14). Because df is a function of `term`
    * and `term` determines `term_bucket`, every bucket folds
    * INDEPENDENTLY: with bucketsPerJob ≥ 1 the rewrite runs as
    * ceil(nBuckets / bucketsPerJob) partition-pruned jobs, each
    * staging its bucket group into the SAME v+1 directories via
    * dynamic partition overwrite — transient footprint ≈
    * bucketsPerJob/nBuckets of the whole job, with version-publish
    * atomicity preserved (all groups stage under v+1; CURRENT flips
    * once at the end; a crash mid-stage leaves the old version live
    * and the redo's dynamic overwrite replaces its own partitions).
    * Search results are identical in either mode (spec-pinned).
    */
  def compactDeltas(index: Index, filesPerBucket: Int = 4,
                    bucketsPerJob: Int = 0): Index = {
    require(filesPerBucket >= 1,
      s"filesPerBucket must be >= 1: $filesPerBucket")
    val spark = index.spark
    // r14: refuse to fold an in-flight stream batch (intent without
    // done in the ledger) — its partitions may be partial, and once
    // compacted into the base the replay can no longer replace them,
    // only double them. The one-sided race from the r13 ADVICE.
    val inflight = ledgerEntries(index).collect {
      case (b, (ver, false, _)) if ver == index.version => b
    }
    require(inflight.isEmpty,
      s"compactDeltas: append batch(es) ${inflight.toSeq.sorted.mkString(",")} " +
        s"are in-flight on version ${index.version}; compacting now would " +
        "make their checkpoint replay double-count. Let the stream commit " +
        "(or clean up the crashed batch) first.")
    // ledger hygiene (r15 ADVICE): fold the two-tiny-files-per-batch
    // history into one row per batch while we hold the single-writer
    // maintenance window — entries-map identical, O(N²) listing gone
    foldLedger(index)
    val v = IndexVersions.current(spark, index.dir).getOrElse(0L) + 1L
    val (nDocs, sumDl) = effectiveScalars(index)
    if (bucketsPerJob >= 1) {
      (0 until index.nBuckets).grouped(bucketsPerJob)
        .foreach(g => compactBucketGroup(index, v, filesPerBucket, g))
    } else {
      val postings = index.postings
      // effective df per term from the RAW rows (deletes must not
      // perturb df — same rule as search): build rows share one value,
      // append rows carry 0, delta rows (either append path) add batch
      // counts
      val baseDf = postings.groupBy("term")
        .agg(max(col("df")).as("df_base"))
      val dfEff = dfDeltas(index) match {
        case None =>
          baseDf.select(col("term"), col("df_base").as("df_eff"))
        case Some(deltas) =>
          baseDf.join(
            deltas.groupBy("term").agg(sum(col("df_delta")).as("df_add")),
            Seq("term"), "full_outer")
            .select(col("term"),
              (coalesce(col("df_base"), lit(0L)) +
                coalesce(col("df_add"), lit(0L))).as("df_eff"))
      }
      // the compacted version's term-stats sidecar: the folded dfEff,
      // materialized FIRST and read back for the postings join (the
      // write() discipline — one aggregate, two consumers)
      dfEff.select(col("term"), col("df_eff").as("df"))
        .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
        .repartition(col("term_bucket"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"${index.dir}/term_stats.v$v")
      val stats = spark.read.parquet(s"${index.dir}/term_stats.v$v")
        .select("term", "df")
      aliveDocs(index, postings)
        .drop("df").join(stats, "term")
        // recompute the bucket so its type stays canonical regardless
        // of what partition-column inference produced on the read
        .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
        .select("term", "doc_id", "tf", "dl", "df", "term_bucket")
        .repartition(index.nBuckets * filesPerBucket, col("term_bucket"),
          pmod(hash(col("doc_id")), lit(filesPerBucket)))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"${index.dir}/postings.v$v")
    }
    spark.range(1)
      .select(lit(nDocs).cast(LongType).as("n_docs"),
        lit(sumDl).cast(LongType).as("sum_dl"),
        lit(index.nBuckets).cast(IntegerType).as("n_buckets"))
      .write.mode("overwrite").parquet(s"${index.dir}/meta.v$v")
    IndexVersions.publish(spark, index.dir, v)
    open(spark, index.dir)
  }

  // ------------------------------------------------- r9: doc deletes
  //
  // The G13 tombstone mechanism composed onto the lexical index: the
  // takedown / right-to-be-forgotten operation between rebuilds. A
  // delete appends (doc_id) rows to a bounded per-version tombstone
  // relation — zero postings IO — and every search anti-joins the
  // broadcast set against ONLY the pruned postings slice, so deleted
  // documents vanish from all searches immediately. df staleness from
  // deletes is bounded and conservative: the denormalized df still
  // counts deleted docs, so idf — and therefore every affected score —
  // only UNDERSTATES until the next rebuild, which starts a fresh
  // version with no tombstones.

  private def tombDir(index: Index): String =
    if (index.version == 0L) s"${index.dir}/doc_tombstones"
    else s"${index.dir}/doc_tombstones.v${index.version}"

  /** Logically delete documents (a `doc_id` column): O(|ids|) writes,
    * zero postings IO; they disappear from every subsequent search on
    * this version.
    */
  def deleteDocs(index: Index, ids: DataFrame,
                 idCol: String = "doc_id"): Unit = {
    ids.select(col(idCol).as("doc_id")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(tombDir(index))
    IndexVersions.bumpGeneration(index.spark, index.dir) // r12: watchers
  }

  /** The pruned postings slice with tombstoned documents removed. */
  private def aliveDocs(index: Index, postings: DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(tombDir(index))
    val fs = p.getFileSystem(index.spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) postings
    else postings.join(
      broadcast(index.spark.read.parquet(p.toString).select("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  /** Query-by-example retrieval from the persisted postings: each
    * query row's distinct tokens form its term bag (bounded,
    * broadcast); their distinct buckets (≤ distinct query terms,
    * collected — the AnnIndex probe sanction) become a LITERAL
    * `term_bucket IN (...)` predicate that Catalyst satisfies by
    * partition pruning, so unqueried vocabulary directories are never
    * listed into the scan. Scoring and ranking replicate
    * bm25Retrieve exactly: same rounded-decimal term scores, same
    * (bm25 desc, nid) tie-break.
    */
  private def statsDir(index: Index): String =
    if (index.version == 0L) s"${index.dir}/term_stats"
    else s"${index.dir}/term_stats.v${index.version}"

  /** Effective df for a bounded term relation: the build-time df
    * (from the vocabulary-sized term-stats sidecar when the version
    * has one — r13; the corpus-sized postings max-scan on legacy
    * layouts) plus any accumulated delta sums — bounded by the
    * queried vocabulary. Shared by the appended-path scoring and the
    * `maxDfShare` head-elision probe; the sidecar is what makes the
    * probe cheaper than the head postings it elides.
    */
  private def dfForTerms(index: Index, qTerms: DataFrame,
                         inBuckets: Column): DataFrame = {
    val sd = statsDir(index)
    val baseDf =
      if (exists(index.spark, sd))
        index.spark.read.parquet(sd).where(inBuckets)
          .join(broadcast(qTerms), "term")
          .groupBy("term").agg(max(col("df")).as("df_base"))
      else index.postings.where(inBuckets)
        .join(broadcast(qTerms), "term")
        .groupBy("term").agg(max(col("df")).as("df_base"))
    dfDeltas(index) match {
      case None =>
        baseDf.select(col("term"), col("df_base").as("df_eff"))
      case Some(allDeltas) =>
        val deltas = allDeltas
          .where(inBuckets)
          .join(broadcast(qTerms), "term")
          .groupBy("term").agg(sum(col("df_delta")).as("df_add"))
        baseDf.join(deltas, Seq("term"), "full_outer")
          .select(col("term"),
            (coalesce(col("df_base"), lit(0L)) +
              coalesce(col("df_add"), lit(0L))).as("df_eff"))
    }
  }

  /** `allowed` (r9): restrict results to a (doc_id) relation — the
    * multi-tenant / per-collection serving filter, the positive twin
    * of the [[deleteDocs]] tombstone anti-join, applied identically:
    * a doc_id-keyed semi join against ONLY the pruned postings slice
    * (bucket partition pruning untouched). Ranks are computed within
    * the allowed set — brute-force-within-filter semantics, matching
    * the AnnIndex `allowed` contract so the fused RRF/MMR serving
    * chain composes filtered end-to-end.
    *
    * `maxDfShare` (r13): drop query terms whose effective df exceeds
    * `maxDfShare · N` BEFORE retrieval — the Zipf/stopword head. Such
    * terms carry idf ≈ 0 (BM25's (N − df + ½)/(df + ½) log is ~0 at
    * df ≈ N) yet drag corpus-scale posting lists through the score
    * aggregate: BM25_SERVE_r13 measured the warm search LINEAR in
    * matched postings precisely because the generated head words
    * defeat the fixed English stopword list. Measured-df elision is
    * the Lucene/ES stopword discipline made corpus-adaptive. EXACT
    * contract: results equal a search whose query bag simply lacks
    * the elided terms (spec-pinned); a query whose entire bag elides
    * matches nothing and returns no rows. Cost: one extra BOUNDED df
    * probe (a narrow (term, df) aggregate over the pruned slice) —
    * paid to avoid the head terms' join fan-out and agg shuffle,
    * which at 10^10 docs is the difference between reading posting
    * lists for the discriminative vocabulary and reading the corpus.
    */
  def search(index: Index, queries: DataFrame, idCol: String,
             textCol: String, topK: Int = 20,
             k1: Double = 1.2, b: Double = 0.75,
             allowed: Option[DataFrame] = None,
             maxDfShare: Option[Double] = None): DataFrame = {
    val qtAll = TextAnalysis.tokenStream(queries, idCol, textCol)
      .select(col("doc_id").as("qid"), col("term")).distinct()
      .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
    // corpus scalars: base meta + (if appended) the meta delta rows —
    // a bounded driver read per search, the probe-set sanction
    val (nDocs, sumDl) = effectiveScalars(index)
    // maxDfShare probe (r13), evaluated ONCE (r14 ADVICE): the bounded
    // (term, df_eff) relation over the full query vocabulary is
    // collected — it is query-vocabulary-sized, the same probe-set
    // sanction as the bucket list — and BOTH the keep set and the
    // post-append scoring df derive from those rows, instead of
    // re-running the sidecar/delta probe jobs a second time on the hot
    // serving path.
    val probedDf: Option[Array[(String, Long)]] = maxDfShare.map { share =>
      require(share > 0.0 && share <= 1.0,
        s"maxDfShare must be in (0, 1]: $share")
      val bucketsAll = qtAll.select("term_bucket").distinct()
        .collect().map(_.getLong(0)).sorted
      val inAll =
        col("term_bucket").isin(bucketsAll.map(_.asInstanceOf[Any]): _*)
      dfForTerms(index, qtAll.select("term").distinct(), inAll)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .filter { case (_, dfEff) => dfEff <= share * nDocs }
    }
    val qt = probedDf match {
      case None => qtAll
      case Some(kept) =>
        import index.spark.implicits._
        val keep = kept.toSeq.map(_._1).toDF("term")
        qtAll.join(broadcast(keep), "term")
          .select("qid", "term", "term_bucket")
    }
    val buckets = qt.select("term_bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    val inBuckets =
      col("term_bucket").isin(buckets.map(_.asInstanceOf[Any]): _*)
    val slicedRaw = index.postings.where(inBuckets)
    val sliced = aliveDocs(index, slicedRaw)
    val pruned = allowed.fold(sliced)(a =>
      sliced.join(a.select(col("doc_id")), Seq("doc_id"), "left_semi"))
    val matched = pruned
      .join(broadcast(qt.select("qid", "term")), "term")
      .where(col("doc_id") =!= col("qid"))
    // effective df: on a never-appended index it is the row's own
    // denormalized value; after appends it is reconstructed by
    // [[dfForTerms]] — bounded by the queried vocabulary either way
    val scoredBase = dfDeltas(index) match {
      case None => matched
      case Some(_) =>
        // reuse the already-collected probe rows when maxDfShare ran
        // (kept terms' df_eff values are exactly what a re-probe over
        // the narrower bucket set would return); probe only when no
        // elision pass paid for them
        val dfRel = probedDf match {
          case Some(kept) =>
            import index.spark.implicits._
            kept.toSeq.toDF("term", "df_eff")
          case None =>
            dfForTerms(index, qt.select("term").distinct(), inBuckets)
        }
        matched.drop("df").join(broadcast(dfRel), "term")
          .withColumnRenamed("df_eff", "df")
    }
    val scored = scoredBase
      .withColumn("n_docs", lit(nDocs))
      .withColumn("sum_dl", lit(sumDl))
      .withColumn("s", TextAnalysis.bm25TermScore(k1, b))
      .groupBy(col("qid"), col("doc_id").as("nid"))
      .agg(sum(col("s")).cast(DoubleType).as("bm25"))
    // bounded per-query rank (r12): the qid window form co-located a
    // query's whole matched-posting set in one task — corpus-scale
    // under a Zipf-head query term. rankTopK reduces map-side and is
    // byte-identical (SkewSpec pins identity vs the window form).
    Similarity.rankTopK(scored, topK, desc = true, "bm25")
  }
}
