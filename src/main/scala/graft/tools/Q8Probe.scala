package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Plan-variant probe for q_tpch8 (VERDICT r12 item 8): the r13 gap
  * fit put q8's warm slope at ~2.7× DuckDB's — above the 1.3–1.9×
  * shuffle-materialization band the r8 study adjudicated for the
  * TPC-H core — and the shipped plan joins UNFILTERED orders into the
  * fact join, restricting to ASIA customers only afterwards. DuckDB's
  * optimizer filters first. The variant here joins orders⋈custAsia
  * BEFORE the fact join (ASIA keeps ~1/5 of customers, so the
  * orders side shrinks ~5× — small enough for AQE to broadcast it at
  * bench scales, and a 5×-lighter shuffle at any scale). Interleaved
  * A/B under Bench's exact config, result-identity require()d; the
  * winner ships (the Q5Probe honesty discipline: keep the simple form
  * if the clever one doesn't win).
  *
  * Usage: Q8Probe <sfDir> [reps]
  */
object Q8Probe {
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

    def vShipped(): DataFrame = SparkEntry.queries("q_tpch8")(spark, sfDir)

    // filter-first variant: orders restricted to ASIA customers BEFORE
    // the fact join
    def vFiltered(): DataFrame = {
      import graft.QueryDef.revenueTerm
      import org.apache.spark.sql.types.LongType
      val nCust = Tables.nation(spark, sfDir)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val nSupp = Tables.nation(spark, sfDir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val custAsia = Tables.customer(spark, sfDir)
        .join(broadcast(nCust), col("c_nationkey") === col("c_nk"))
        .join(broadcast(Tables.region(spark, sfDir)
            .where(col("r_name") === "ASIA")),
          col("c_rk") === col("r_regionkey"))
        .select(col("c_custkey"))
      val supp = Tables.supplier(spark, sfDir)
        .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val ordersAsia = Tables.orders(spark, sfDir)
        .join(custAsia, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderdate"))
      val base = Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir).where(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(ordersAsia, col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
      base.groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3",
            revenueTerm(col("l_extendedprice"), col("l_discount"))))
            .cast("double")
          / sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
            .cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }

    def loadavg: String = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
        .split(" ").take(3).mkString(",")).getOrElse("")

    // interleaved A/B so ambient drift hits both forms equally
    val shipped = new Array[Double](reps)
    val filtered = new Array[Double](reps)
    for (r <- 0 until reps) {
      val t0 = System.nanoTime()
      vShipped().collect()
      shipped(r) = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      vFiltered().collect()
      filtered(r) = (System.nanoTime() - t1) / 1e9
    }
    val a = vShipped().collect().map(_.toString).sorted.toSeq
    val b = vFiltered().collect().map(_.toString).sorted.toSeq
    require(a == b, "plan variants must agree")
    def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[q8probe] sf=$sfDir reps=$reps loadavg=$loadavg " +
      f"shipped=${shipped.map(x => f"$x%.2f").mkString(",")} " +
      f"filtered=${filtered.map(x => f"$x%.2f").mkString(",")} " +
      f"med_shipped=${med(shipped)}%.3f med_filtered=${med(filtered)}%.3f")
    spark.stop()
  }
}
