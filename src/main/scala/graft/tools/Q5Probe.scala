package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Plan-variant probe for q_tpch5 (VERDICT r9 item 8): the r9 plan
  * pass rewrote q5 with an early-ASIA customer restriction, but the
  * sf10 interleaved A/B showed the rewrite consistently ~7% SLOWER in
  * both pairs — within the sitting's noise floor, direction
  * consistent. This probe interleaves the shipped form against the
  * simple dims-last shape (the q4/q16 honesty precedent: keep the
  * simpler plan when the clever one doesn't win) under Bench's exact
  * config. Measurement only; the winner gets promoted.
  *
  * Usage: Q5Probe <sfDir> [reps]
  */
object Q5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def vShipped(): DataFrame = SparkEntry.queries("q_tpch5")(spark, sfDir)

    // the pre-r9 simple shape: facts join first, dims broadcast last,
    // no derived customer-side restriction
    def vSimple(): DataFrame = {
      val joined = Tables.customer(spark, sfDir)
        .join(Tables.orders(spark, sfDir)
            .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
              col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(spark, sfDir),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, sfDir)
            .where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      import graft.QueryDef.revenueTerm
      joined.groupBy("n_name")
        .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }

    def loadavg: String = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
        .split(" ").take(3).mkString(",")).getOrElse("")

    // interleaved A/B so ambient drift hits both forms equally
    val shipped = new Array[Double](reps)
    val simple = new Array[Double](reps)
    for (r <- 0 until reps) {
      val t0 = System.nanoTime()
      vShipped().collect()
      shipped(r) = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      vSimple().collect()
      simple(r) = (System.nanoTime() - t1) / 1e9
    }
    val a = vShipped().collect().map(_.toString).sorted.toSeq
    val b = vSimple().collect().map(_.toString).sorted.toSeq
    require(a == b, "plan variants must agree")
    def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[q5probe] sf=$sfDir reps=$reps loadavg=$loadavg " +
      f"shipped=${shipped.map(x => f"$x%.2f").mkString(",")} " +
      f"simple=${simple.map(x => f"$x%.2f").mkString(",")} " +
      f"med_shipped=${med(shipped)}%.3f med_simple=${med(simple)}%.3f")
    spark.stop()
  }
}
