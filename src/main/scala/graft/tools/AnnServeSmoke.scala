package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIndex, Similarity}

/** Serving-path measurement for the persisted ANN index (G11): the
  * same query batch answered `reps` times by (a) ivfTopK, which
  * re-runs assign-to-centroids over the whole corpus per search, and
  * (b) AnnIndex.searchExact over the cent_id-partitioned on-disk
  * index, which reads only the probed cells. The contrast is the
  * reason the index exists: search cost decouples from corpus size
  * and becomes proportional to nprobe/nCells of it.
  *
  * `mult` replicates the corpus in-memory with deterministic jitter
  * (the ScaleGen recipe) before indexing — at gate-scale corpora both
  * paths are job-overhead-bound and the contrast only appears once
  * the corpus is large enough that scanning it dominates.
  *
  * Usage: AnnServeSmoke <sfDir> [reps] [mult]  (env SPARK_GRAFT_CPUS)
  */
object AnnServeSmoke {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnServeSmoke <sfDir> [reps] [mult]")
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val mult = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val span = base.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val emb = (0 until mult).map { m =>
      base.select((col("vec_id") + lit(m * span)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + sin(col("vec_id") * 31 + i * 7 + lit(m * 13)) * lit(0.01d))
            .cast(org.apache.spark.sql.types.FloatType)).as("embedding"))
    }.reduce(_ unionAll _)
    val queries = emb.where(col("vec_id") < 10)
    val (nCells, stride, nprobe, k) = (16, 7L, 4, 5)

    val cents = Similarity.trainIvfCentroids(emb, nCells, stride)
    val dir = java.nio.file.Files.createTempDirectory("graft-annserve").toString
    val tBuild0 = System.nanoTime()
    val idx = AnnIndex.write(emb, dir, dim = 64, nCells = nCells,
      stride = stride, centroids = Some(cents))
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then measure medians
    Similarity.ivfTopK(emb, queries, k, nCells, stride, nprobe,
      centroids = Some(cents)).count()
    AnnIndex.searchExact(idx, queries, k, nprobe).count()
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val recompute = median((0 until reps).map(_ => time(
      Similarity.ivfTopK(emb, queries, k, nCells, stride, nprobe,
        centroids = Some(cents)).count())))
    val fromDisk = median((0 until reps).map(_ => time(
      AnnIndex.searchExact(idx, queries, k, nprobe).count())))

    println(s"""{"metric":"ann_serve","unit":"sec","sf_dir":"$sfDir",""" +
      s""""mult":$mult,"corpus_rows":${emb.count()},""" +
      s""""reps":$reps,"index_build":$buildSec,""" +
      s""""search_recompute_ivf":$recompute,"search_from_disk":$fromDisk,""" +
      s""""speedup":${(recompute / fromDisk * 100).round / 100.0},""" +
      s""""nprobe":$nprobe,"n_cells":$nCells,"cpus":$cpus}""")
    spark.stop()
  }
}
