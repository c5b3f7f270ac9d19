package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Multimodal columns (SURVEY §2.E3/E4): media as opaque `binary`
  * columns with typed metadata, and batched feature extraction.
  *
  * The container has no image/audio codecs, so `decode` is STUBBED:
  * media here is a deterministic fake format ("GRFT" magic + LE
  * width/height + payload). Everything around the stub — schema,
  * partition-level batching, feature shape, downstream ANN
  * composition — is real Spark plumbing and is what carries over
  * unchanged when a real codec (JNI/pandas UDF) replaces the stub.
  *
  * Scala-side batching uses mapPartitions over typed Datasets: the
  * JVM twin of `mapInPandas` — each task processes its partition as
  * one streamed batch, no per-row UDF dispatch.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, width: Int,
                       height: Int, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, embedding: Array[Float])

  val MAGIC: Array[Byte] = "GRFT".getBytes("ASCII")

  /** Deterministic fake encoder: text → media binary (the stand-in for
    * real image bytes; width/height derive from the content).
    */
  def encodeFake(docId: Long, text: String): Array[Byte] = {
    val payload = text.getBytes("UTF-8")
    val w = 16 + (math.abs(docId) % 64).toInt
    val h = 16 + (payload.length % 64)
    val buf = ByteBuffer.allocate(4 + 4 + 4 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(MAGIC).putInt(w).putInt(h).put(payload)
    buf.array()
  }

  /** documents → media table (doc_id, media binary). */
  def fakeMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast(LongType), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => MediaRow(id, encodeFake(id, text)) }
  }

  /** STUB decode: parse the fake header. A real deployment swaps the
    * body of `decodeOne` for an actual codec; the operator shape
    * (mapPartitions over binary, typed output schema) is the product.
    */
  def decodeOne(id: Long, media: Array[Byte]): MediaMeta = {
    val buf = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    val ok = java.util.Arrays.equals(magic, MAGIC)
    val w = if (ok) buf.getInt else -1
    val h = if (ok) buf.getInt else -1
    MediaMeta(id, if (ok) "grft" else "unknown", w, h, media.length.toLong)
  }

  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(m => decodeOne(m.doc_id, m.media)))
  }

  /** Batched feature extraction: byte-histogram → 16-dim L2-normalized
    * float vector (deterministic fake for a vision encoder). Batch
    * shape = the partition; output feeds Similarity.* directly.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hist = new Array[Float](dim)
        var i = 0
        while (i < m.media.length) {
          hist((m.media(i) & 0xFF) % dim) += 1f
          i += 1
        }
        var norm = 0.0
        var j = 0
        while (j < dim) { norm += hist(j) * hist(j); j += 1 }
        val inv = if (norm > 0) (1.0 / math.sqrt(norm)).toFloat else 0f
        j = 0
        while (j < dim) { hist(j) *= inv; j += 1 }
        MediaFeatures(m.doc_id, hist)
      }
    }
  }

  /** Frame-sampling plumbing for video-like payloads: split payload
    * into `frameBytes` chunks, keep every `stride`-th (the schema +
    * explode pattern; the chunking stands in for frame decode).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
                   stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val payload = m.media.drop(12)
      payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (m.doc_id, idx, frame) }
    }.toDF("doc_id", "frame_idx", "frame")
  }

  /** Exact media dedup (E5): group identical blobs by content hash —
    * the byte-level twin of text exact dedup, run before any decode
    * (re-crawled/re-encoded identical assets are the bulk of media
    * duplication). One hash-keyed shuffle whose rows are (hash, id) —
    * the payload bytes never shuffle, so cost is independent of asset
    * size, the property that matters when the blobs are images. A
    * perceptual near-dup pass (pHash over decoded pixels) slots in by
    * swapping the hash column; the grouping plumbing is identical.
    */
  def dedupMediaExact(df: DataFrame, idCol: String, blobCol: String)
      : DataFrame =
    // one hash-group dedup implementation: delegate to Dedup
    // (md5 hashes the binary payload directly)
    Dedup.exactGroups(df, idCol, blobCol)
      .select(col("h").as("media_hash"), col("n_dups").as("n_copies"),
        col("keep_id").as("canonical_id"))

  /** Byte-window hash array of a blob (native kernel, no decode). */
  def byteWindowHashes(blob: Column, window: Int = 64,
                       stride: Int = 32): Column = {
    import graft.functions.{exprs, ByteWindowHashes}
    exprs.toColumn(ByteWindowHashes(exprs.toExpr(blob), window, stride))
  }

  /** Content-defined byte-chunk hashes (shift-robust variant). */
  def byteCdcHashes(blob: Column, targetSize: Int = 128, minSize: Int = 32,
                    maxSize: Int = 512): Column = {
    import graft.functions.{exprs, ByteCdcHashes}
    exprs.toColumn(ByteCdcHashes(exprs.toExpr(blob), targetSize, minSize,
      maxSize))
  }

  /** Decode-free media NEAR-dup pairs (E6): blobs sharing ≥ threshold
    * byte-window-hash Jaccard — catches truncated / tail-appended
    * re-uploads of the same asset that [[dedupMediaExact]]'s whole-
    * content hash misses. Candidates collide on any of each blob's
    * `k` smallest window hashes (a bottom-k sketch: near-dups share
    * their minima with high probability), so the join is hash-keyed
    * and bucket-local — never all-pairs — and only (hash, id) +
    * bounded signatures shuffle, never payload bytes. `maxBucket`
    * drops degenerate windows shared by more than that many blobs
    * (runs of zeros etc.), the J4 mega-bucket discipline.
    *
    * Alignment: fixed-stride windows (cdc = false) detect
    * alignment-preserving edits (truncation, append, same-offset
    * patches) at minimal hashing cost; `cdc = true` switches to
    * content-defined byte chunks (the H15 boundary rule over bytes),
    * which also survive PREFIX insertions/deletions — boundaries
    * derive from content, so chunks after the edit hash identically.
    * NOTE: in cdc mode `stride` is unused and `window` is reinterpreted
    * as the chunk-size SCALE (target = 2·window, min = window/2,
    * max = 8·window), so it must be >= 2.
    *
    * Verification is BOUNDED: only each blob's bottom-`verifyB` hashes
    * (a sorted bottom-k sketch) ever leave the hashing pass, and pair
    * similarity is the standard bottom-k Jaccard estimator — take the
    * bottom-B of the sketch union X, estimate J = |X ∩ A ∩ B| / |X|.
    * When a pair's true union has <= B hashes the estimator IS exact
    * Jaccard, so small blobs lose nothing; large blobs shuffle B longs
    * instead of payload/stride (the r7 Θ(payload/stride) verify leak).
    * `verifyB <= 0` restores exact full-signature Jaccard (the gate
    * config). The signature relation is persisted at `sigStorage`
    * (pass StorageLevel.NONE to opt out), so the per-blob hashing pass
    * runs once, not once per consumer branch.
    *
    * CACHE LIFECYCLE: the operator returns a lazy plan, so it cannot
    * unpersist behind its own result — the cached signature relation
    * lives until the session drops it. One-shot jobs (the gate shape)
    * don't care; a long-lived session looping over many DISTINCT
    * inputs should pass `sigStorage = StorageLevel.NONE` (recompute,
    * zero footprint) or sweep with `spark.catalog.clearCache()`
    * between batches — otherwise each distinct input pins one
    * InMemoryRelation for the session lifetime.
    */
  def mediaNearDups(df: DataFrame, idCol: String, blobCol: String,
                    threshold: Double = 0.5, window: Int = 64,
                    stride: Int = 32, k: Int = 12,
                    maxBucket: Int = 64, cdc: Boolean = false,
                    verifyB: Int = 256,
                    sigStorage: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    require(!cdc || window >= 2,
      s"cdc = true reuses window as the chunk-size scale (target 2w, min " +
        s"w/2, max 8w; stride is ignored): need window >= 2, got $window")
    require(verifyB <= 0 || verifyB >= k,
      s"verifyB ($verifyB) must be >= k ($k): probes come from the sketch")
    val sig =
      if (cdc) byteCdcHashes(col(blobCol), targetSize = window * 2,
        minSize = window / 2, maxSize = window * 8)
      else byteWindowHashes(col(blobCol), window, stride)
    val full = df.select(col(idCol).as("media_id"),
        array_sort(array_distinct(sig)).as("hs"))
      .where(size(col("hs")) > 0)
    // the bucket join moves ONLY (media_id, h); signatures re-attach by
    // id on the deduplicated candidate PAIR set, never riding the k-way
    // explode or the self-join fan-out — and with verifyB > 0 each
    // signature is a bounded bottom-B sketch, never the full array
    val bounded =
      if (verifyB > 0) full.select(col("media_id"),
        slice(col("hs"), 1, verifyB).as("hs"))
      else full
    val sigs =
      if (sigStorage == StorageLevel.NONE) bounded else bounded.persist(sigStorage)
    val probes = sigs.select(col("media_id"),
      explode(slice(col("hs"), 1, k)).as("h"))
    // J4 mega-bucket cap: a window hash shared by > maxBucket blobs
    // (constant padding, zero runs) would fan out quadratically and
    // carries no discriminative signal
    val rare = probes.groupBy("h").agg(count(lit(1)).as("n"))
      .where(col("n") <= maxBucket).select("h")
    val cand = probes.join(rare, "h").as("a")
      .join(probes.join(rare, "h").as("x"),
        col("a.h") === col("x.h") && col("a.media_id") < col("x.media_id"))
      .select(col("a.media_id").as("id_a"), col("x.media_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val attached = cand
      .join(sigs.select(col("media_id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(sigs.select(col("media_id").as("id_b"), col("hs").as("hs_b")), "id_b")
    val scored =
      if (verifyB > 0)
        // bottom-B estimator: X = bottom-B of the union (valid because
        // any of the B smallest of A∪B is among the B smallest of the
        // set containing it, so X is computable from the two sketches)
        attached.withColumn("u",
            slice(array_sort(array_union(col("hs_a"), col("hs_b"))), 1, verifyB))
          .withColumn("byte_jaccard",
            size(array_intersect(col("u"),
              array_intersect(col("hs_a"), col("hs_b")))).cast("double") /
              size(col("u")).cast("double"))
      else
        attached.withColumn("byte_jaccard",
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
            size(array_union(col("hs_a"), col("hs_b"))).cast("double"))
    scored
      .where(col("byte_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("byte_jaccard"), 6).as("byte_jaccard"))
  }
}
