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
  *  - random-hyperplane LSH: corpus bucketed by sign-pattern (multi-
  *    probe for near-dup recall); only same-bucket candidates scored.
  *    Shuffle keyed by bucket.
  *  - IVF: corpus partitioned into k-means cells (Lloyd-refined
  *    deterministic seeds), queries probe nprobe nearest cells.
  *    Centroids are a tiny broadcast list; at 100 TB cells can also
  *    be written as partitioned parquet for pruned reads.
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
    // see Dedup.fanOut: plan-only probe, no AQE materialization
    val files = df.inputFiles.length
    if (files > 0 && files < target) df.repartition(target) else df
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
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int, seed: Int = 0): Column = {
    import graft.functions.{exprs, HyperplaneBucket}
    exprs.toColumn(HyperplaneBucket(exprs.toExpr(vec), planes, seed))
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

  /** Deterministic seed centroids: corpus rows with vec_id ≡ 0 mod
    * stride, capped at nCells.
    */
  def seedCentroids(corpus: DataFrame, nCells: Int, stride: Long): DataFrame =
    corpus.where(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))

  /** Assign each corpus row to its nearest centroid (broadcast
    * loop-join over the tiny centroid set + per-row top-1 window).
    */
  def assignToCentroids(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val scored = fanOut(corpus).as("c").join(broadcast(cents.as("k")))
      .select(col("c.vec_id").as("vec_id"), col("c.embedding").as("embedding"),
        col("k.cent_id").as("cent_id"),
        cosine(col("c.embedding"), col("k.cent")).as("ccos"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
    scored.withColumn("r", row_number().over(w)).where(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
  }

  /** k-means centroids: deterministic seeds refined by `iters` Lloyd
    * steps. Each step is assign (broadcast join) + per-dimension mean
    * (posexplode → groupBy(cell,dim) avg → re-pack ordered array):
    * two shuffles of (cell, dim, partial-mean) rows — never a
    * collect of vectors to the driver. Cells that lose all members
    * drop out (k shrinks), standard Lloyd behavior.
    */
  def kmeansCentroids(corpus: DataFrame, nCells: Int, stride: Long,
                      iters: Int = 2): DataFrame = {
    var cents = seedCentroids(corpus, nCells, stride)
    for (_ <- 0 until iters) {
      val assigned = assignToCentroids(corpus, cents)
      cents = assigned
        .select(col("cent_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cent_id", "pos").agg(avg(col("v")).as("m"))
        .groupBy("cent_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cent_id"),
          transform(col("pm"), s => s.getField("m").cast(FloatType)).as("cent"))
    }
    cents
  }

  /** IVF ANN: corpus partitioned into k-means cells; queries probe the
    * `nprobe` nearest cells. At 100 TB the assigned corpus is written
    * as cell-partitioned parquet so probes prune to nprobe/k of the
    * data on disk.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, stride: Long = 7, nprobe: Int = 4,
              kmeansIters: Int = 2): DataFrame = {
    val cents = kmeansCentroids(corpus, nCells, stride, kmeansIters)
    val assigned = assignToCentroids(corpus, cents)
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

  /** Embedding-cosine near-duplicate pairs via multi-probe LSH
    * buckets: candidates collide in any of `probes` independent
    * hyperplane sets, then exact cosine verifies.
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     dim: Int, planes: Int = 6, probes: Int = 2): DataFrame = {
    // multi-probe: `probes` independent hyperplane sets; a pair is a
    // candidate if it collides in ANY set. Miss probability for a pair
    // at angle θ is ((1-(1-θ/π)^planes))^probes — two probe tables cut
    // the single-table miss rate quadratically for ~2x the bucketing
    // cost (still one shuffle per probe table, each bucket-local).
    val fanned = fanOut(corpus)
    val candidate = (0 until probes).map { s =>
      val b = fanned.withColumn("bucket",
        hyperplaneBucket(col("embedding"), dim, planes, s))
      b.as("a").join(b.as("x"),
          col("a.bucket") === col("x.bucket") && col("a.vec_id") < col("x.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("x.vec_id").as("id_b"),
          col("a.embedding").as("e_a"), col("x.embedding").as("e_b"))
    }.reduce(_ unionAll _).dropDuplicates("id_a", "id_b")
    candidate
      .withColumn("cos", cosine(col("e_a"), col("e_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
