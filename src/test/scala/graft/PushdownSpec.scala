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

  test("extended TPC-H: dim sides broadcast (q_tpch10/q_tpch19/q_tpch8)") {
    Seq("q_tpch10", "q_tpch19", "q_tpch8").foreach { name =>
      val plan = executedPlanString(SparkEntry.queries(name)(spark, sfDir))
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: expected broadcast joins in:\n$plan")
    }
  }

  test("q_tpch1 selective scan: shipdate filter pushes down, partial agg") {
    val plan = executedPlanString(SparkEntry.queries("q_tpch1")(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("q_asof_join is a single exchange + window, not a join explosion") {
    val plan = executedPlanString(SparkEntry.queries("q_asof_join")(spark, sfDir))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop"),
      s"as-of must not pair-join:\n$plan")
    assert(plan.contains("Window"), s"expected window pass:\n$plan")
  }

  test("partitioned dataset reads prune to the selected partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-part").toString
    Tables.orders(spark, sfDir)
      .repartition(col("o_orderstatus"))
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(dir)
    val plan = executedPlanString(
      spark.read.parquet(dir).where(col("o_orderstatus") === "F"))
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"expected partition filters in:\n$plan")
    // the status predicate must NOT appear as a data filter — it is
    // satisfied entirely by pruning directories
    assert(!plan.contains("PushedFilters: [IsNotNull(o_orderstatus)"),
      s"partition predicate leaked into data filters:\n$plan")
  }

  test("q_tpch11 reads partsupp from the bucketed table, not a re-derive") {
    // the derived partsupp is written once per session as a bucketed
    // table (round 6) — its four consumers must plan a bucketed scan
    // of that table, not re-derive the lineitem-wide distinct
    val df = SparkEntry.queries("q_tpch11")(spark, sfDir)
    val plan = executedPlanString(df)
    assert(plan.contains("graft_partsupp_b8") && plan.contains("Bucketed: true"),
      s"expected a bucketed graft_partsupp scan in:\n$plan")
    assert(!plan.contains("lineitem.parquet"),
      s"q_tpch11 must not re-derive partsupp from lineitem:\n$plan")
  }

  test("q_tpch21 scans lineitem once") {
    // r16: the query is STRAIGHT-LINE — three chained aggregates over
    // one repartition(l_orderkey) exchange, no second branch at all
    // (the r15 two-branch form relied on AQE-time ReusedExchange,
    // which the r16 executed-plan census caught NOT firing: two
    // lineitem scans + two fact exchanges). Execute first, then pin
    // the FINAL adaptive plan: exactly one lineitem FileScan.
    val df = SparkEntry.queries("q_tpch21")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("isFinalPlan=true"),
      s"expected an executed adaptive plan in:\n$plan")
    val lineitemScans = "lineitem\\.parquet".r.findAllIn(finalPlan).size
    assert(lineitemScans == 1,
      s"expected exactly one lineitem scan, got $lineitemScans in:\n$finalPlan")
  }

  test("q_range_join buckets to an equi-join, no nested loop") {
    val plan = executedPlanString(SparkEntry.queries("q_range_join")(spark, sfDir))
    assert(!plan.contains("NestedLoop"),
      s"range join must be bucket equi-join:\n$plan")
  }
}
