package graft

/** Scale-safety contract for the TPC-H suite: tables whose cardinality
  * grows with the scale factor (customer/supplier/part/orders/lineitem)
  * must never carry a hard `broadcast()` hint — at 100 TB a forced
  * broadcast of an sf-scaling table is an executor/driver OOM, and the
  * hint disables AQE's own size check. Only fixed-cardinality dims
  * (nation=25, region=5) and provably-tiny aggregates may be hinted.
  *
  * Method: in a session with auto-broadcast fully disabled
  * (threshold=-1, AQE off), the ONLY BroadcastExchange nodes left in a
  * plan are the ones forced by explicit hints. We then assert every
  * such exchange reads nothing but nation/region.
  */
class BroadcastSafetySpec extends SparkSpec {

  /** Isolated SQLConf (shared SparkContext): hints are the only
    * possible source of broadcast in this session.
    */
  private lazy val noAutoBc = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private val sfScaling =
    Seq("customer.parquet", "supplier.parquet", "part.parquet",
      "orders.parquet", "lineitem.parquet")

  /** Leaves under each BroadcastExchange in the physical plan.
    * Exchanges whose subtree is PROVABLY BOUNDED are skipped: a
    * grouping-free (scalar) aggregate produces at most one row
    * regardless of what table feeds it (q_tpch15's max-revenue row,
    * q_tpch22's average balance), and a GlobalLimit bounds its subtree
    * at the literal limit (q_tpch10's top-20 reattach, r14) — neither
    * can OOM a broadcast no matter the sf.
    *
    * r15 (ADVICE): the bound must hold at the subtree ROOT, reached
    * only through row-preserving unary nodes — the previous `b.exists`
    * accepted a limit ANYWHERE in the subtree, so a future
    * broadcast(join(limit(k), hugeTable)), where the join above the
    * limit multiplies rows unboundedly, would have passed the gate.
    */
  private def provablyBounded(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    p match {
      case a: aggregate.BaseAggregateExec
          if a.groupingExpressions.isEmpty => true
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
      // row-preserving (never row-multiplying) unary pass-throughs
      // only: a join/generate/expand between the bounding node and the
      // exchange root voids the bound
      case _: ProjectExec | _: FilterExec | _: SortExec | _: CoalesceExec |
           _: LocalLimitExec | _: ColumnarToRowExec | _: InputAdapter |
           _: WholeStageCodegenExec | _: ShuffleExchangeExec =>
        provablyBounded(p.children.head)
      case _ => false
    }
  }

  private def broadcastLeaves(name: String): Seq[(String, Seq[String])] = {
    val df = SparkEntry.queries(name)(noAutoBc, sfDir)
    val plan = df.queryExecution.executedPlan
    plan.collect {
      case b if b.nodeName.contains("BroadcastExchange") &&
        !b.children.headOption.exists(provablyBounded) =>
        name -> b.collectLeaves().map(_.toString)
    }
  }

  private val guarded = Seq("q_tpch3", "q_tpch7", "q_tpch8", "q_tpch9",
    "q_tpch10", "q_tpch14", "q_tpch17", "q_tpch19", "q_tpch5",
    "q_tpch21", "q_tpch22", "q_tpch2", "q_tpch11", "q_tpch16", "q_tpch20")

  test("no sf-scaling table is ever force-broadcast") {
    val offenders = for {
      q <- guarded
      (name, leaves) <- broadcastLeaves(q)
      leaf <- leaves
      table <- sfScaling
      if leaf.contains(table)
    } yield s"$name broadcasts a scan of $table"
    assert(offenders.isEmpty,
      s"forced broadcast of sf-scaling tables:\n${offenders.mkString("\n")}")
  }

  test("round-7 pipeline operators never force-broadcast the corpus") {
    // documents/embeddings grow with sf: the only hinted broadcasts
    // allowed in these plans are scalar aggregates (vocab size, corpus
    // stats — the existing carve-out) — never a corpus scan subtree
    // that isn't reduced by a grouping-free aggregate
    val corpus = Seq("documents.parquet", "embeddings.parquet")
    val offenders = for {
      q <- Seq("q_compress_ratio", "q_bigram_perplexity", "q_chunk_cdc",
        "q_media_neardup")
      (name, leaves) <- broadcastLeaves(q)
      leaf <- leaves
      table <- corpus
      if leaf.contains(table)
    } yield s"$name broadcasts a scan of $table"
    assert(offenders.isEmpty,
      s"forced corpus broadcast:\n${offenders.mkString("\n")}")
  }

  test("dimension hints survive: nation/region still broadcast when auto-broadcast is off") {
    // Queries that join nation keep their (safe, fixed-25-row) hint.
    Seq("q_tpch7", "q_tpch8", "q_tpch9", "q_tpch10").foreach { q =>
      val bx = broadcastLeaves(q)
      assert(bx.nonEmpty, s"$q: expected hinted dim broadcasts, found none")
      assert(bx.forall { case (_, leaves) =>
        leaves.exists(l => l.contains("nation.parquet") || l.contains("region.parquet"))
      }, s"$q: a broadcast exchange reads something other than nation/region")
    }
  }
}
