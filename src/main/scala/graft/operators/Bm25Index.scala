package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * appending documents would silently stale every existing term's
  * idf — this index REBUILDS per corpus version (cheap: one tokenize
  * pass), unlike the ANN index whose per-row payload is
  * version-independent and therefore appends (G12). The alternative —
  * a separate (term, df) relation — keeps appends cheap but puts a
  * vocabulary-sized join on every query batch; for a serving index
  * the per-version rebuild is the right trade.
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
    def postings: DataFrame = spark.read.parquet(postingsDir)
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
    * read of the compact post-aggregate relation.
    *
    * The salted repartition before the write is the AnnIndex
    * `filesPerCell` pattern: `filesPerBucket` writer tasks per bucket,
    * so the bucket holding the hottest vocabulary slice doesn't
    * serialize one giant writer (with the D7 bound still in force —
    * nBuckets × filesPerBucket files total, never tasks × buckets).
    */
  def write(corpus: DataFrame, idCol: String, textCol: String,
            dir: String, nBuckets: Int = 64,
            filesPerBucket: Int = 4): Index = {
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
    val rel = tfRelation(corpus, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      withDf(rel, nBuckets)
        .repartition(nBuckets * filesPerBucket, col("term_bucket"),
          pmod(hash(col("doc_id")), lit(filesPerBucket)))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$dir/postings.v$v")
      TextAnalysis.corpusStats(corpus, textCol)
        .withColumn("n_buckets", lit(nBuckets))
        .write.mode("overwrite").parquet(s"$dir/meta.v$v")
    } finally rel.unpersist()
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
      Seq("postings", "meta", "doc_tombstones"))

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
                 idCol: String = "doc_id"): Unit =
    ids.select(col(idCol).as("doc_id")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(tombDir(index))

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
  /** `allowed` (r9): restrict results to a (doc_id) relation — the
    * multi-tenant / per-collection serving filter, the positive twin
    * of the [[deleteDocs]] tombstone anti-join, applied identically:
    * a doc_id-keyed semi join against ONLY the pruned postings slice
    * (bucket partition pruning untouched). Ranks are computed within
    * the allowed set — brute-force-within-filter semantics, matching
    * the AnnIndex `allowed` contract so the fused RRF/MMR serving
    * chain composes filtered end-to-end.
    */
  def search(index: Index, queries: DataFrame, idCol: String,
             textCol: String, topK: Int = 20,
             k1: Double = 1.2, b: Double = 0.75,
             allowed: Option[DataFrame] = None): DataFrame = {
    val qt = TextAnalysis.tokenStream(queries, idCol, textCol)
      .select(col("doc_id").as("qid"), col("term")).distinct()
      .withColumn("term_bucket", bucketOf(col("term"), index.nBuckets))
    val buckets = qt.select("term_bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    val sliced = aliveDocs(index, index.postings
      .where(col("term_bucket").isin(buckets.map(_.asInstanceOf[Any]): _*)))
    val pruned = allowed.fold(sliced)(a =>
      sliced.join(a.select(col("doc_id")), Seq("doc_id"), "left_semi"))
    val scored = pruned
      .join(broadcast(qt.select("qid", "term")), "term")
      .where(col("doc_id") =!= col("qid"))
      .withColumn("n_docs", lit(index.nDocs))
      .withColumn("sum_dl", lit(index.sumDl))
      .withColumn("s", TextAnalysis.bm25TermScore(k1, b))
      .groupBy(col("qid"), col("doc_id").as("nid"))
      .agg(sum(col("s")).cast(DoubleType).as("bm25"))
    val w = Window.partitionBy("qid").orderBy(col("bm25").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= topK)
  }
}
