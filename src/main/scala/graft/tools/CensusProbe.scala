package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{QueryDef, SparkEntry, Tables}

/** Plan-variant probe for the r14 TPC-H warm-slope census (VERDICT
  * r13 item 1): the two above-band queries with a genuinely improvable
  * plan shape, A/B'd interleaved under Bench's exact config with
  * result identity require()d (the Q8Probe discipline).
  *
  * q_tpch15 — the shipped plan consumes the supplier-revenue aggregate
  * twice (supplier join + global max) and ReuseExchange does NOT fire:
  * the join branch carries an inferred isnotnull(l_suppkey) the max
  * branch lacks, so the two agg subtrees are not canonically equal and
  * lineitem is scanned + aggregated twice. The variant writes the
  * isNotNull onto the shared relation, making both branches identical
  * so one scan + one agg exchange serves both (no semantic change:
  * l_suppkey is a non-null FK, and a null-key group could never join
  * supplier anyway).
  *
  * q_tpch10 — the shipped plan groups by (c_custkey, c_name,
  * c_acctbal, n_name): every wide customer attribute rides the
  * fact-scale aggregation exchange. The attributes are functionally
  * dependent on c_custkey, so the variant aggregates the fact join by
  * o_custkey alone (narrow (key, revenue) shuffle), takes the top 20
  * on the narrow relation (same (revenue desc, custkey) order), and
  * only then attaches customer/nation attributes to the 20 survivors
  * via a broadcast of the bounded top — the wide strings never
  * shuffle. At 100 TB this is the difference between shuffling ~200
  * bytes and 16 bytes per surviving fact row.
  *
  * Usage: CensusProbe <sfDir> [reps]
  */
object CensusProbe {
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

    // the PRE-r14 forms, reconstructed here so the A/B stays
    // meaningful after the fixes shipped into SparkEntry
    def s15(): DataFrame = {
      val rev = Tables.lineitem(spark, sfDir)
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
               col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(QueryDef.revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("mx"))
      Tables.supplier(spark, sfDir)
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(top), col("total_revenue") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }
    def v15(): DataFrame = SparkEntry.queries("q_tpch15")(spark, sfDir)

    def s10(): DataFrame = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir)
          .where(col("o_orderdate") >= to_timestamp(lit("1996-10-01")) &&
                 col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(QueryDef.revenueTerm(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
    def v10(): DataFrame = SparkEntry.queries("q_tpch10")(spark, sfDir)

    def loadavg: String = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
        .split(" ").take(3).mkString(",")).getOrElse("")

    def ab(name: String, a: () => DataFrame, b: () => DataFrame): Unit = {
      val ta = new Array[Double](reps)
      val tb = new Array[Double](reps)
      for (r <- 0 until reps) {
        val t0 = System.nanoTime(); a().collect()
        ta(r) = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); b().collect()
        tb(r) = (System.nanoTime() - t1) / 1e9
      }
      val ra = a().collect().map(_.toString).sorted.toSeq
      val rb = b().collect().map(_.toString).sorted.toSeq
      require(ra == rb, s"$name: plan variants must agree")
      def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[censusprobe] $name sf=$sfDir reps=$reps loadavg=$loadavg " +
        f"old=${ta.map(x => f"$x%.2f").mkString(",")} " +
        f"new=${tb.map(x => f"$x%.2f").mkString(",")} " +
        f"med_old=${med(ta)}%.3f med_new=${med(tb)}%.3f")
    }
    ab("q_tpch15", s15 _, v15 _)
    ab("q_tpch10", s10 _, v10 _)
    spark.stop()
  }
}
