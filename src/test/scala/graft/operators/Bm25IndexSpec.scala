package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted BM25 inverted index (H18): search-from-disk must
  * equal the recompute path bit-for-bit, and the query's term buckets
  * must prune the postings read on disk (the AnnIndexSpec
  * discipline applied to the lexical index).
  */
class Bm25IndexSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val queries = docs.where($"doc_id" < 3)

  private lazy val index = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-index").toString
    Bm25Index.write(docs, "doc_id", "text", dir, nBuckets = 16)
  }

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "nid", "bm25", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(t => (t._1, t._4))
      .toSeq

  test("index search equals the recompute path bit-for-bit") {
    val fromDisk = asTuples(
      Bm25Index.search(index, queries, "doc_id", "text", topK = 20))
    val recompute = asTuples(
      TextAnalysis.bm25Retrieve(docs, queries, "doc_id", "text", topK = 20))
    assert(fromDisk.nonEmpty)
    assert(fromDisk == recompute,
      s"disk=${fromDisk.take(3)} recompute=${recompute.take(3)}")
  }

  test("open() round-trips the meta scalars and search agrees") {
    val reopened = Bm25Index.open(spark, index.dir)
    assert(reopened.nDocs == index.nDocs && reopened.sumDl == index.sumDl &&
      reopened.nBuckets == index.nBuckets)
    assert(asTuples(Bm25Index.search(reopened, queries, "doc_id", "text")) ==
      asTuples(Bm25Index.search(index, queries, "doc_id", "text")))
  }

  test("query terms prune posting buckets on disk") {
    // a single tiny query → few distinct terms → a strict bucket subset
    val oneQ = Seq((9999L, "batch window")).toDF("doc_id", "text")
    val pruned = Bm25Index.search(index, oneQ, "doc_id", "text", topK = 5)
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters:") && plan.contains("term_bucket"),
      s"expected term_bucket partition filters in:\n$plan")
    assert(!plan.contains("PushedFilters: [In(term_bucket"),
      s"bucket predicate leaked into data filters:\n$plan")
    val allFiles = index.postings.select(input_file_name()).distinct()
      .as[String].collect().toSet
    val probed = Seq("batch", "window")
      .map(t => math.floorMod(
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
          org.apache.spark.unsafe.types.UTF8String.fromString(t).getBaseObject,
          org.apache.spark.unsafe.types.UTF8String.fromString(t).getBaseOffset,
          org.apache.spark.unsafe.types.UTF8String.fromString(t).numBytes(), 42),
        16).toLong).distinct
    val readFiles = index.postings.where($"term_bucket".isin(
        probed.map(_.asInstanceOf[Any]): _*))
      .select(input_file_name()).distinct().as[String].collect().toSet
    assert(readFiles.nonEmpty && readFiles.size < allFiles.size,
      s"pruned read must touch fewer files: ${readFiles.size}/${allFiles.size}")
    assert(readFiles.forall(f =>
      probed.exists(b => f.contains(s"term_bucket=$b/"))),
      s"read outside probed buckets: $readFiles vs $probed")
  }

  test("full serving stack: RRF fusion of the two persisted indexes " +
      "equals fusion of the recompute legs") {
    // the round-8 serving story end-to-end: dense leg from the
    // persisted ANN index, lexical leg from the persisted BM25 index,
    // fused with RRF — must equal the same fusion over the one-job
    // recompute paths (both legs are spec-pinned equal individually;
    // this pins the COMPOSITION, ranks flowing through fusion intact)
    val emb = Tables.embeddings(spark, sfDir)
    val eq = emb.where($"vec_id" < 3)
    val annDir = java.nio.file.Files
      .createTempDirectory("graft-ann-rrf").toString
    val ann = AnnIndex.write(emb, annDir, dim = 64, nCells = 8,
      stride = 7, kmeansIters = 1, m = 8, ncodes = 16)
    val denseIdx = AnnIndex.searchExact(ann, eq, k = 20, nprobe = 8)
      .select("qid", "nid", "rank")
    val lexIdx = Bm25Index.search(index, queries, "doc_id", "text",
        topK = 20).select("qid", "nid", "rank")
    val fusedIdx = Similarity.rrfFuse(Seq(denseIdx, lexIdx), topK = 10)
      .select("qid", "nid", "rank")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._3)).toSeq

    val denseRe = Similarity.bruteForceTopK(emb, eq, k = 20)
      .select("qid", "nid", "rank")
    val lexRe = TextAnalysis.bm25Retrieve(docs, queries, "doc_id", "text",
        topK = 20).select("qid", "nid", "rank")
    val fusedRe = Similarity.rrfFuse(Seq(denseRe, lexRe), topK = 10)
      .select("qid", "nid", "rank")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._3)).toSeq
    assert(fusedIdx.nonEmpty && fusedIdx == fusedRe,
      s"idx=${fusedIdx.take(5)} re=${fusedRe.take(5)}")
  }

  test("postings are denormalized: df/dl on rows match corpus stats") {
    // hand-check one term: its df must equal the number of distinct
    // docs containing it, dl the containing doc's token count
    val p = index.postings.where($"term" === "batch")
      .select("doc_id", "tf", "dl", "df").collect()
    assert(p.nonEmpty)
    val expectDf = docs.where(array_contains(
      filter(TextAnalysis.tokens($"text"), t => t =!= ""), "batch")).count()
    assert(p.forall(_.getLong(3) == expectDf),
      s"df mismatch: ${p.head} vs $expectDf")
    val dl0 = docs.where($"doc_id" === p.head.getLong(0))
      .select(size(filter(TextAnalysis.tokens($"text"), t => t =!= "")))
      .collect()(0).getInt(0)
    assert(p.head.getLong(2) == dl0.toLong)
  }
}
