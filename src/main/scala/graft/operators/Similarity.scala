package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Three tiers, as a real pipeline would deploy them:
  *  - brute-force cosine top-k: the exact baseline. Query set is
  *    broadcast; corpus streams through once. Correct at any corpus
  *    size as long as the query set is small.
  *  - random-hyperplane LSH: corpus bucketed by sign-pattern; only
  *    same-bucket candidates scored. Shuffle keyed by bucket.
  *  - IVF: corpus partitioned by nearest of k sampled centroids,
  *    queries probe nprobe nearest cells. Centroids are a tiny
  *    broadcast list; at 100 TB cells can also be written as
  *    partitioned parquet for pruned reads.
  *
  * All vector math is `zip_with`/`aggregate` over array columns in
  * double precision — stays inside codegen, no UDFs.
  */
object Similarity {

  /** See Dedup.fanOut: spread a small-file scan across cores before
    * per-row vector math (bucketing, pairwise cosine).
    */
  private def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Sequential-order double dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k for a (small, broadcast) query set.
    * One pass over the corpus, per-query top-k via window rank.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = fanOut(corpus).as("c")
      .join(broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }

  /** Random-hyperplane signature: `planes` deterministic pseudo-random
    * hyperplanes; sign pattern packed into a long bucket key. Native
    * expression — one pass over the vector (`dim` is taken from the
    * array itself; the parameter is kept for API stability).
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int): Column = {
    import graft.functions.{exprs, HyperplaneBucket}
    exprs.toColumn(HyperplaneBucket(exprs.toExpr(vec), planes))
  }

  /** LSH ANN: same-bucket candidates only, then exact cosine + top-k.
    * Recall is tunable by `planes` (fewer planes → bigger buckets).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dim: Int, planes: Int = 8): DataFrame = {
    val cb = fanOut(corpus).withColumn("bucket", hyperplaneBucket(col("embedding"), dim, planes))
    val qb = queries.withColumn("bucket", hyperplaneBucket(col("embedding"), dim, planes))
    val joined = cb.as("c")
      .join(broadcast(qb.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }

  /** IVF-lite: centroids = deterministic sample of the corpus itself
    * (ids ≡ 0 mod stride, capped at nCells). Corpus rows are assigned
    * to their nearest centroid (broadcast loop-join over the tiny
    * centroid set); queries probe `nprobe` nearest cells.
    */
  def ivfAssign(corpus: DataFrame, nCells: Int, stride: Long): DataFrame = {
    val cents = corpus.where(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    val scored = fanOut(corpus).as("c").join(broadcast(cents.as("k")))
      .select(col("c.vec_id").as("vec_id"), col("c.embedding").as("embedding"),
        col("k.cent_id").as("cent_id"),
        cosine(col("c.embedding"), col("k.cent")).as("ccos"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
    scored.withColumn("r", row_number().over(w)).where(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, stride: Long = 7, nprobe: Int = 4): DataFrame = {
    val assigned = ivfAssign(corpus, nCells, stride)
    val cents = corpus.where(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    val qCells = queries.as("q").join(broadcast(cents.as("k")))
      .select(col("q.vec_id").as("qid"), col("q.embedding").as("qe"),
        col("k.cent_id").as("cent_id"),
        cosine(col("q.embedding"), col("k.cent")).as("ccos"))
    val wq = Window.partitionBy("qid").orderBy(col("ccos").desc, col("cent_id"))
    val probes = qCells.withColumn("r", row_number().over(wq)).where(col("r") <= nprobe)
      .select(col("qid"), col("qe"), col("cent_id"))
    val joined = assigned.as("c").join(probes.as("p"),
        col("p.cent_id") === col("c.cent_id") && col("p.qid") =!= col("c.vec_id"))
      .select(col("p.qid").as("qid"), col("c.vec_id").as("nid"),
        cosine(col("p.qe"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (exact
    * cosine verified within buckets; multi-probe by also bucketing
    * with fewer planes would raise recall — kept single-bucket here).
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     dim: Int, planes: Int = 6): DataFrame = {
    val b = fanOut(corpus).withColumn("bucket", hyperplaneBucket(col("embedding"), dim, planes))
    b.as("a").join(b.as("x"),
        col("a.bucket") === col("x.bucket") && col("a.vec_id") < col("x.vec_id"))
      .withColumn("cos", cosine(col("a.embedding"), col("x.embedding")))
      .where(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("x.vec_id").as("id_b"),
        round(col("cos"), 6).as("cos"))
  }
}
