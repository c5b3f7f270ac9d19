package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every candidate-generation step is *bucket-local* —
  * work is shuffled by (band, hash) or (band, bits) keys and pairs are
  * only formed inside a bucket. There is never a global cross join, so
  * cost is O(data) + O(sum of bucket^2) which LSH keeps tiny. All
  * hashing is xxhash64 via Catalyst (codegen'd, no UDFs).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: content hash → representative (min id) + count.
    * One shuffle keyed by the 128-bit content hash; at 100 TB the md5
    * key keeps shuffle rows tiny regardless of document size.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).cast(LongType).as("keep_id"),
           count(lit(1)).as("n_dups"))

  /** Keep one representative per exact-duplicate group. */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  // -------------------------------------------------------------- minhash

  /** Word n-gram shingles (default 3) of the lowercased text, distinct. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** MinHash signature: numPerm permutations simulated as
    * xxhash64(perm, shingle); min per permutation. Computed by
    * exploding distinct shingles and taking numPerm `min` aggregates —
    * one shuffle keyed by doc id, map-side partial mins, all codegen.
    */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
                       numPerm: Int = 64, shingleN: Int = 3): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("doc_id"), explode(shingles(col(textCol), shingleN)).as("sh"))
    val mins = (0 until numPerm).map(p => min(xxhash64(lit(p), col("sh"))).as(s"m$p"))
    val agged = exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    agged.select(col("doc_id"),
      array((0 until numPerm).map(p => col(s"m$p")): _*).as("sig"))
  }

  /** LSH band keys: signature split into `bands` bands of
    * numPerm/bands rows; each band hashed to one bucket key.
    */
  def lshBands(sig: Column, numPerm: Int, bands: Int): Column = {
    val rows = numPerm / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rows).map(r => sig.getItem(b * rows + r)): _*)).as("bh"))
    }: _*)
  }

  /** Candidate pairs from LSH: docs sharing any band bucket.
    * Shuffle is keyed by (band, bandhash) — pairs only form within a
    * bucket, and `a < b` halves the pair space.
    */
  def minhashCandidates(sigs: DataFrame, numPerm: Int = 64, bands: Int = 16): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(lshBands(col("sig"), numPerm, bands)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Estimated Jaccard from signatures: fraction of agreeing perms. */
  def signatureJaccard(sigA: Column, sigB: Column): Column =
    (size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast(DoubleType)
      / size(sigA).cast(DoubleType))

  /** Full MinHash-LSH near-dup pipeline: candidates with exact shingle
    * Jaccard >= threshold (verification joins shingle sets back on the
    * candidate pairs only, never all pairs).
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8, numPerm: Int = 64,
                      bands: Int = 16, shingleN: Int = 3): DataFrame = {
    val sigs = minhashSignature(docs, idCol, textCol, numPerm, shingleN)
    val cands = minhashCandidates(sigs, numPerm, bands)
    val sets = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), shingleN).as("shset"))
    val verified = cands
      .join(sets.withColumnRenamed("doc_id", "id_a").withColumnRenamed("shset", "set_a"), "id_a")
      .join(sets.withColumnRenamed("doc_id", "id_b").withColumnRenamed("shset", "set_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast(DoubleType) /
          size(array_union(col("set_a"), col("set_b"))).cast(DoubleType))
      .where(col("jaccard") >= threshold)
    verified.select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens: bit i is the sign of the
    * token-count-weighted sum of (bit i of xxhash64(token)) mapped to
    * ±1. Expressed as 64 conditional-sum aggregates over the exploded
    * tokens — single shuffle by doc, map-side combine, codegen.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val agged = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agged.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: 4 bands of 16 bits — any pair with
    * hamming distance <= 3 must agree on at least one band
    * (pigeonhole), so bucketing by band value finds all of them with a
    * bucket-local join; verified by bit_count(xor) <= maxHamming.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(docs, idCol, textCol)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("bits"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.bits").as("bits"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------ n-gram jaccard

  /** Character/word n-gram Jaccard over blocked candidate pairs.
    * Blocking keys (e.g. (lang, length bucket)) bound bucket sizes so
    * the within-bucket pair join stays local; at 100 TB the blocking
    * key is the shuffle key.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[Column], threshold: Double,
                        n: Int = 3): DataFrame = {
    val prepped = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("grams"),
      struct(blockCols: _*).as("blk"))
    val a = prepped.as("a")
    val b = prepped.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("a.grams"), col("b.grams"))).cast(DoubleType) /
          size(array_union(col("a.grams"), col("b.grams"))).cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}
