package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Plan-variant probe for the q_tpch21 slope (§6 gap study): compares
  * the shipped window form against candidates that trade the
  * window-by-order shuffle+sort differently. Measurement only — the
  * winner (if any) gets promoted into QueriesTpch.
  *
  * Usage: Q21Probe <sfDir> [reps]
  */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def finish(lastShippers: DataFrame): DataFrame =
      lastShippers
        .join(Tables.supplier(spark, sfDir), col("sole_supp") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)

    // shipped form: groupBy(ok,sk) -> window by ok -> agg by ok
    def vWindow: DataFrame = {
      val perSupp = Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("l_shipdate")).as("supp_mx"))
      val wOrder = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
      finish(perSupp
        .withColumn("mx", max(col("supp_mx")).over(wOrder))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("nsupp"),
          count(when(col("supp_mx") === col("mx"), 1)).as("nlast"),
          min(when(col("supp_mx") === col("mx"), col("l_suppkey"))).as("sole_supp"))
        .where(col("nsupp") >= 2 && col("nlast") === 1))
    }

    // two aggregates, no window/sort: HashPartitioning(ok) from the
    // per-order agg satisfies the (ok,sk) grouping and the join, so
    // the second pass is shuffle-free IF planned off a repartition(ok)
    def vTwoAgg: DataFrame = {
      val base = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(col("l_orderkey"))
      val perSupp = base.groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("l_shipdate")).as("supp_mx"))
      val perOrder = perSupp.groupBy("l_orderkey")
        .agg(max(col("supp_mx")).as("mx"))
      finish(perSupp.join(perOrder, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("nsupp"),
          count(when(col("supp_mx") === col("mx"), 1)).as("nlast"),
          min(when(col("supp_mx") === col("mx"), col("l_suppkey"))).as("sole_supp"))
        .where(col("nsupp") >= 2 && col("nlast") === 1))
    }

    // single grouped pass, no window: per-order stats derived from a
    // one-shuffle groupBy over (ok,sk) maxes via max_by on a struct —
    // mx and the set of last shippers in the SAME aggregate using
    // max(struct(supp_mx, ...)) comparisons
    def vOneAgg: DataFrame = {
      val perSupp = Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("l_shipdate")).as("supp_mx"))
      // second agg keyed the same -> reuses partitioning, no shuffle:
      // count of suppliers at the max via a sorted two-field struct max
      val d = col("supp_mx").cast("timestamp").cast("long")
      finish(perSupp
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("nsupp"),
          max(struct(d.as("d"), col("l_suppkey").as("sk"))).as("top"),
          min(struct((-d).as("nd"), col("l_suppkey").as("sk"))).as("topmin"))
        .where(col("nsupp") >= 2 &&
          // unique last shipper <=> largest and smallest suppkey at the
          // max date coincide (topmin's -d ordering lands on the same date)
          col("top.sk") === col("topmin.sk"))
        .withColumn("sole_supp", col("top.sk"))
        .drop("top", "topmin"))
    }

    def time(name: String, mk: () => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }
      val rows = mk().collect().map(_.toString).toSeq.sorted
      println(f"[q21probe] $name%-8s first=${ts.head}%.3f warm=${ts.sorted.apply(reps / 2)}%.3f rows=${rows.size} sig=${rows.hashCode}")
    }

    time("window", () => vWindow)
    time("twoagg", () => vTwoAgg)
    time("oneagg", () => vOneAgg)
    spark.stop()
  }
}
