package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val base = graft.Tables.embeddings(spark, d).select("vec_id", "embedding")
    val planted = (0 until 3).map { j =>
      base.select((col("vec_id") * 8 + lit(1000000 + j)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + sin(col("vec_id") * 131 + i * 17 + lit(j * 37)) * lit(0.04d))
            .cast(FloatType)).as("embedding"))
    }.reduce(_ unionAll _)
    val corpus = base.unionAll(planted)
    val queries = base.where(pmod(col("vec_id"), lit(37)) === 0)
    val k = 3
    val exact = Similarity.bruteForceTopK(corpus, queries, k).select("qid", "nid")
    def recall(name: String, approx: org.apache.spark.sql.DataFrame, t0: Long): Unit = {
      val rec = exact.join(approx.select("qid", "nid").withColumn("hit", lit(1)), Seq("qid", "nid"), "left")
        .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))).as("r")).head.getDouble(0)
      println(f"$name recall=$rec%.4f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    for (refine <- Seq(0, 2, 4)) {
      val t0 = System.nanoTime()
      recall(s"PQ refine=$refine", Similarity.pqTopK(corpus, queries, k,
        dim = 64, m = 8, ncodes = 16, refine = refine), t0)
    }
    for (nprobe <- Seq(2, 4, 8)) {
      val t0 = System.nanoTime()
      recall(s"IVFPQ nprobe=$nprobe", Similarity.ivfPqTopK(corpus, queries, k,
        dim = 64, nCells = 16, nprobe = nprobe, m = 8, ncodes = 16, refine = 4), t0)
    }
    spark.stop()
  }
}
