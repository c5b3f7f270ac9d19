package graft


import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled storage so repeated joins/aggs on the
  * bucket key need no exchange (SURVEY §4 — the 100 TB co-located
  * join strategy).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without an exchange on the bucket key") {
    // warehouse dir is a static conf; the default ./spark-warehouse is
    // gitignored, so just use it
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse files survive — clear leftovers
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // force the non-broadcast path: at test scale everything would
    // broadcast; at 100 TB neither side does, which is what bucketing
    // is for
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      joined.collect()
      joined.queryExecution.executedPlan.toString()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    // co-located: the join itself must not introduce a shuffle of
    // either bucketed side (only the final tiny agg exchanges)
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected sort-merge join of bucketed tables:\n$plan")
    val afterJoin = plan.substring(joinIdx)
    assert(!afterJoin.contains("Exchange hashpartitioning(l_orderkey") &&
      !afterJoin.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not reshuffle its inputs:\n$plan")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("bucketed derived-partsupp joins and windows without reshuffling itself") {
    import org.apache.spark.sql.expressions.Window
    val ps = Tables.partsuppBucketed(spark, sfDir)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // Q16 shape: part-side join keyed ps_partkey — partsupp must NOT
      // exchange (part does; at 100 TB that is the smaller relation of
      // the two sides only by constant factor, but partsupp is the one
      // reused across four queries)
      val q16ish = ps.join(Tables.part(spark, sfDir),
        col("ps_partkey") === col("p_partkey"))
      q16ish.collect()
      val p1 = q16ish.queryExecution.executedPlan.toString()
      assert(!p1.contains("Exchange hashpartitioning(ps_partkey"),
        s"bucketed partsupp reshuffled for the part join:\n$p1")

      // Q2 shape: window min over ps_partkey directly on the scan —
      // the bucketed partitioning must satisfy the window, no exchange
      val w = Window.partitionBy("ps_partkey")
      val q2ish = ps.withColumn("mincost", min(col("ps_supplycost")).over(w))
        .where(col("ps_supplycost") === col("mincost"))
      q2ish.collect()
      val p2 = q2ish.queryExecution.executedPlan.toString()
      assert(!p2.contains("Exchange"),
        s"window over ps_partkey must reuse the bucket partitioning:\n$p2")

      // Q20 shape: groupBy (ps_partkey, ps_suppkey) — hash partitioning
      // on ps_partkey alone satisfies the superset clustering
      val q20ish = ps.groupBy("ps_partkey", "ps_suppkey")
        .agg(sum(col("ps_availqty")).as("q"))
      q20ish.collect()
      val p3 = q20ish.queryExecution.executedPlan.toString()
      assert(!p3.contains("Exchange"),
        s"agg keyed by a superset of the bucket key must not exchange:\n$p3")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
