package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Plan-shape assertions: the efficiency half of the contract.
  * A scan that doesn't push filters/projection would still be
  * "correct" on 60k rows and catastrophically wrong at 100 TB.
  */
class PushdownSpec extends SparkSpec {

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString()
  }

  test("filter is pushed to the parquet scan") {
    val df = Tables.lineitem(spark, sfDir)
      .where(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val plan = executedPlanString(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"expected pushed filter in:\n$plan")
  }

  test("projection is pruned to selected columns") {
    val df = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val plan = executedPlanString(df)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"expected pruned ReadSchema in:\n$plan")
  }

  test("dimension joins broadcast, not shuffle") {
    val q = SparkEntry.queries("q_join_broadcast")(spark, sfDir)
    val plan = executedPlanString(q)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dim join must not sort-merge:\n$plan")
  }

  test("q1_agg does partial aggregation before the shuffle") {
    val q = SparkEntry.queries("q1_agg")(spark, sfDir)
    val plan = executedPlanString(q)
    assert(plan.contains("HashAggregate"), plan)
    // partial + final pairs: two HashAggregate nodes around one shuffle
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("whole-stage codegen covers the flagship scan-agg") {
    val q = SparkEntry.queries("q1_agg")(spark, sfDir)
    q.collect() // finalize the adaptive plan
    val plan = executedPlanString(q)
    // codegen stages render as "*(n)" prefixes in the executed plan
    assert(plan.contains("*(1)"), s"expected codegen stage markers in:\n$plan")
  }

  test("tpch6 pushes the shipdate range to the scan") {
    val q = SparkEntry.queries("q_tpch6")(spark, sfDir)
    val plan = executedPlanString(q)
    // PushedFilters renders truncated; the leading entries are stable
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate range must push down:\n$plan")
  }
}
