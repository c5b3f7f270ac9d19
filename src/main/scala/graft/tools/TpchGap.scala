package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** TPC-H narrow-output gap study (VERDICT r7 item 8): separates each
  * query's FIXED per-run cost (Catalyst analysis/optimization/physical
  * planning + codegen-cache lookup + task dispatch) from its
  * DATA-DEPENDENT execution cost, so the sf3 DuckDB gap on the TPC-H
  * core can be attributed to constants-vs-plan with evidence instead
  * of asserted.
  *
  * Per query and scale it measures, on fresh DataFrames each rep:
  *   - t_plan: median time to force `queryExecution.executedPlan`
  *     (analysis -> optimized -> physical; no execution, no codegen)
  *   - t_first: the first full count() in this JVM (pays Janino
  *     compilation of the generated classes once per plan shape)
  *   - t_warm: median of the remaining reps' full count()s (planning
  *     repeats -- fresh DF each rep, the Bench protocol -- but
  *     generated-class compilation is cached)
  * so t_warm - t_plan isolates execute+schedule, and comparing t_warm
  * across sf0.1/sf1/sf3 gives the data-dependent slope: a query whose
  * t_warm is flat-ish across 30x data is constant-bound, not
  * plan-deficient.
  *
  * Usage: TpchGap <sfDir> [queryCsv] [reps]
  */
object TpchGap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      (if (args.length > 1) args(1) else "q_tpch21,q_tpch18,q_tpch5")
        .split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup discipline as Bench: don't charge one-time JVM setup
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("customer", "supplier", "part", "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").schema
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }

    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      val plans = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e9
      }
      val totals = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      f"""  "$name": {"t_plan": ${median(plans)}%.3f, "t_first": ${totals.head}%.3f, "t_warm": ${median(totals.tail)}%.3f}"""
    }
    println(s"""{"sf": "$sfDir", "reps": $reps, "queries": {
${out.mkString(",\n")}
}}""")
    spark.stop()
  }
}
