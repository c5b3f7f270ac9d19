package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef._
import graft.operators.Compute

/** Relational layer (SURVEY §2.A/B/C): table ops, compute kernels, and
  * the TPC-H-shaped query suite. Every query is a declarative
  * DataFrame plan — Catalyst does pushdown/pruning/join-selection; we
  * only add explicit `broadcast()` on dimension tables.
  */
object QueriesRelational {

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------- C3 flagship
    QueryDef("q1_agg",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.where(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
              .cast(DoubleType).as("sum_disc_price"),
            (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
            (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
        ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty,
        ${sqlDsum("l_extendedprice")} / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------------ A2
    QueryDef("q_select_project",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_mktsegment").as("segment"))
        .orderBy("id"),
      Some("""SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
        FROM customer ORDER BY id""")),

    // ------------------------------------------------------------------ A3
    QueryDef("q_slice",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(50).limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 50""")),

    // ------------------------------------------------------------------ A4
    QueryDef("q_concat_union",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_name").as("nm"))
        .unionAll(Tables.supplier(s, d)
          .select(col("s_suppkey").as("k"), col("s_name").as("nm")))
        .orderBy("k", "nm"),
      Some("""SELECT c_custkey AS k, c_name AS nm FROM customer
        UNION ALL SELECT s_suppkey, s_name FROM supplier
        ORDER BY k, nm""")),

    // ------------------------------------------------------------------ A5
    QueryDef("q_add_column",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          revenueTerm(col("l_extendedprice"), col("l_discount"))
            .cast(DoubleType).as("net_price"),
          (col("l_quantity") > 25).as("bulk"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
        l_quantity > 25 AS bulk
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // -------------------------------------------------------------- B1 cast
    // price_dec surfaces the double→decimal→double roundtrip as DOUBLE:
    // a raw decimal column is the one dtype the driver's two fetch
    // paths (pyarrow vs duckdb) normalize differently, so it would
    // hash-mismatch even when every value is identical (seen r1).
    QueryDef("q_cast",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(12, 2)).cast(DoubleType).as("price_dec"),
          col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType).as("price_str"),
          col("o_orderkey").cast(StringType).as("key_str"),
          col("o_orderkey").cast(StringType).cast(LongType).as("key_roundtrip"),
          to_date(col("o_orderdate")).as("od"),
          year(col("o_orderdate")).cast(LongType).as("yr"),
          (col("o_orderstatus") === "F").cast(LongType).as("flag_int"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
        CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
        CAST(o_orderdate AS DATE) AS od,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(o_orderstatus = 'F' AS BIGINT) AS flag_int
        FROM orders ORDER BY o_orderkey""")),

    // ------------------------------------------------------------ B2 unique
    QueryDef("q_unique",
      (s, d) => Compute.unique(Tables.customer(s, d), "c_mktsegment").orderBy("v"),
      Some("SELECT DISTINCT c_mktsegment AS v FROM customer ORDER BY v")),

    // ------------------------------------------------- B3 dictionary encode
    QueryDef("q_dictionary_encode",
      (s, d) => Compute.dictionaryEncode(Tables.customer(s, d), "c_mktsegment")
        .select("c_custkey", "value", "code").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment AS value,
        CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) - 1 AS code
        FROM customer ORDER BY c_custkey""")),

    // ------------------------------------------------------ B4 value counts
    QueryDef("q_value_counts",
      (s, d) => Compute.valueCounts(Tables.orders(s, d), "o_orderpriority")
        .orderBy("value"),
      Some("""SELECT o_orderpriority AS value, COUNT(*) AS cnt
        FROM orders GROUP BY o_orderpriority ORDER BY value""")),

    // ------------------------------------------------- A10 table profile
    // pandas describe/info analog via Compute.tableProfile. Gate runs
    // the exact configuration (countDistinct per column — hash-exact
    // against the oracle); the default API is approx_count_distinct.
    // One aggregate per column, NOT one aggregate with 5 distincts:
    // the multi-distinct form plans an Expand that replicates every
    // row 6× into one shuffle (the round-6 regression — ~600 TB of
    // shuffle at 100 TB), while per-column single-distinct aggs each
    // shuffle only that column's distinct values off a column-pruned
    // scan. Budget-pinned in PlanBudgetSpec (0 Expand).
    QueryDef("q_table_profile",
      (s, d) => {
        val cols = Seq("l_orderkey", "l_partkey", "l_quantity",
          "l_returnflag", "l_shipdate")
        graft.operators.Compute.tableProfile(
            Tables.lineitem(s, d), cols, exact = true)
          .orderBy("column")
      },
      Some(Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")
        .map(c => s"""SELECT '$c' AS "column",
            COUNT(*) FILTER (WHERE $c IS NULL) AS n_nulls,
            COUNT(DISTINCT $c) AS n_distinct FROM lineitem""")
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY \"column\""))),

    // ---------------------------------------------------------- B5 hash64
    // xxhash64 has no DuckDB builtin, so the oracle checks the
    // invariant the kernel exists for: a stable injective 64-bit hash
    // has exactly as many distinct values as its input (deterministic
    // on this data — a collision would be a hash bug at these sizes).
    // Per-row stability is spec-tested (ComputeSpec).
    QueryDef("q_hash64",
      (s, d) => Tables.customer(s, d)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(Compute.hash64(col("c_name"))).as("n_hashes")),
      Some("""SELECT COUNT(*) AS n_rows,
        COUNT(DISTINCT c_name) AS n_hashes
        FROM customer""")),

    // ------------------------------------------------------- C1 pushdown
    QueryDef("q_pushdown_scan",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_quantity") > 45 &&
          col("l_shipdate") >= to_timestamp(lit("1999-01-01")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1999-01-01'
        ORDER BY l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------ C2 sort
    QueryDef("q_sort",
      (s, d) => Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(col("s_nationkey").desc, col("s_acctbal").asc, col("s_suppkey").asc),
      Some("""SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        ORDER BY s_nationkey DESC, s_acctbal ASC, s_suppkey ASC""")),

    // ------------------------------------------------------ C4 shuffle join
    QueryDef("q_join_large",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ORDER BY l_orderkey, l_linenumber""")),

    // ---------------------------------------------------- C5 broadcast join
    QueryDef("q_join_broadcast",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ------------------------------------------------------- C6 outer/semi
    QueryDef("q_join_left",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    QueryDef("q_join_semi",
      (s, d) => {
        val c = Tables.customer(s, d)
        c.join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "leftsemi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // Anti join vs *recent* orders so the result is non-trivial (every
    // customer has some order in the full table).
    QueryDef("q_join_anti",
      (s, d) => {
        val c = Tables.customer(s, d)
        val recent = Tables.orders(s, d)
          .where(col("o_orderdate") >= to_timestamp(lit("2001-01-01")))
        c.join(recent, col("o_custkey") === col("c_custkey"), "leftanti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        ORDER BY c_custkey""")),

    // ---------------------------------------------------------- C7 windows
    QueryDef("q_window",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast(LongType).as("rn"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          sum(dec2(col("o_totalprice"))).over(wRows).cast(DoubleType).as("run_spend"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(row_number() OVER w AS BIGINT) AS rn,
        lag(o_totalprice, 1) OVER w AS prev_price,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, rn""")),

    // ------------------------------------- C51 window navigation fns
    // first/last/nth value with explicit frames: the full-partition
    // frame makes last_value/nth deterministic (default frame stops at
    // CURRENT ROW and would be order-dependent prefix values).
    QueryDef("q_window_navfuncs",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wAll = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(wAll).as("first_order"),
          last(col("o_orderkey")).over(wAll).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(wAll).as("second_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        first_value(o_orderkey) OVER wa AS first_order,
        last_value(o_orderkey) OVER wa AS last_order,
        nth_value(o_orderkey, 2) OVER wa AS second_order,
        lead(o_orderkey, 1) OVER w AS next_order
        FROM orders
        WINDOW
          w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
          wa AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey""")),

    // ----------------------------------------------------------- C8 having
    QueryDef("q_having",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("spend"))
        .where(col("n") > 3)
        .orderBy("o_custkey"),
      Some(s"""SELECT o_custkey, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) > 3 ORDER BY o_custkey""")),

    // --------------------------------------------------- C9 distinct rows
    QueryDef("q_distinct_rows",
      (s, d) => Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus""")),

    // --------------------------------------------------------- C10 TPC-H 3
    QueryDef("q_tpch3",
      (s, d) => {
        // customer scales with sf — no forced broadcast (a hint here
        // is an OOM at 100 TB and disables AQE's own size check); the
        // segment filter still reaches the scan, and AQE broadcasts
        // the filtered side when it is genuinely small.
        val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, d)
          .where(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
        cust
          .join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate,
        ${sqlRevenue("l_extendedprice", "l_discount")} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // --------------------------------------------------------- C11 TPC-H 5
    QueryDef("q_tpch5",
      (s, d) => {
        // The region predicate reaches BOTH dimension paths before any
        // fact shuffle: ASIA nations (a handful of rows) broadcast-
        // restrict customer up front, cutting the customer⋈orders
        // result — and every downstream join's probe side — ~5× (the
        // r_name → c_nationkey pushdown Catalyst can't derive through
        // the c_nationkey = s_nationkey transitivity). n_name rides
        // the customer side, so no supplier-side nation join remains;
        // supplier itself is equi-restricted by s_nationkey =
        // c_nationkey inside the join. With AQE, the shrunken
        // order-side relation auto-broadcasts into the lineitem join
        // at small sf while the plan stays shuffle-safe at 100 TB.
        val asiaNations = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables.customer(s, d)
          .join(broadcast(asiaNations),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        val joined = cust
          .join(Tables.orders(s, d)
              .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.supplier(s, d)
              // same projection as the customer-side broadcast so the
              // two exchange subtrees are canonically identical and
              // ReuseExchange keeps nation/region at one scan each
              .join(broadcast(asiaNations),
                col("s_nationkey") === col("n_nationkey"), "left_semi"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
        joined.groupBy("n_name")
          .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, ${sqlRevenue("l_extendedprice", "l_discount")} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // --------------------------------------------------------- C12 TPC-H 6
    QueryDef("q_tpch6",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    // -------------------------------------------------- C12b TPC-H 14
    QueryDef("q_tpch14",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-04-01")))
        val rev = sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
        val promoRev = sum(when(col("p_type") === "PROMO",
          revenueTerm(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(0).cast(DecimalType(18, 2))))
        // part scales with sf → no forced broadcast; AQE decides.
        li.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .agg((promoRev.cast(DoubleType) * 100.0 / rev.cast(DoubleType))
            .as("promo_revenue_pct"))
      },
      Some("""SELECT
        CAST(SUM(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
          AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'""")),

    // --------------------------------------------------- C12c TPC-H 4-ish
    // (adapted: no commit/receipt dates in this schema — "late
    // shipment" = any line shipped >60 days after the order date)
    QueryDef("q_tpch4",
      (s, d) => {
        // Derived pushdown: o_orderdate ≥ 1997-01-01 makes
        // l_shipdate > 1997-03-02 (min orderdate + 60d) a NECESSARY
        // condition for any line to witness the EXISTS, so the scan
        // prunes ~3/4 of lineitem before the semi join — the dropped
        // rows could never satisfy the join condition. (An
        // aggregate-then-join form — max(l_shipdate) per order —
        // shuffles ~4× fewer rows but measured slower at sf10: the
        // multi-million-group hash aggregate costs more than the
        // narrower shuffle saves on this data; the semi join
        // AQE-skew-splits at cluster scale, so the simple shape wins
        // both locally and at 100 TB.)
        val late = Tables.lineitem(s, d)
          .where(col("l_shipdate") > to_timestamp(lit("1997-03-02")))
          .select(col("l_orderkey"), col("l_shipdate"))
        Tables.orders(s, d)
          .where(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01")))
          .join(late,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "leftsemi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---------------------------------------------------------- C13 rollup
    QueryDef("q_rollup",
      (s, d) => Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority"),
      Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ------------------------------------------------------- C14 functions
    QueryDef("q_functions",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("pfx"),
          length(col("p_name")).cast(LongType).as("name_len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          replace(col("p_type"), lit("A"), lit("@")).as("type_sub"),
          lower(col("p_name")).as("low_name"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        upper(substr(p_name, 1, 8)) AS pfx,
        CAST(length(p_name) AS BIGINT) AS name_len,
        p_brand || '#' || p_type AS brand_type,
        replace(p_type, 'A', '@') AS type_sub,
        lower(p_name) AS low_name
        FROM part ORDER BY p_partkey""")),

    // ------------------------------------------- C3b count distinct
    QueryDef("q_count_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------- C7b top-N per group
    QueryDef("q_topn_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast(LongType))
          .where(col("rn") <= 2)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
          FROM orders)
        WHERE rn <= 2 ORDER BY o_custkey, rn""")),

    // ------------------------------------------------ C6b full outer
    QueryDef("q_join_full",
      (s, d) => {
        val recent = Tables.orders(s, d)
          .where(col("o_orderdate") >= to_timestamp(lit("2001-06-01")))
          .groupBy("o_custkey").agg(count(lit(1)).as("n_recent"))
        Tables.customer(s, d)
          .where(col("c_custkey") <= 100)
          .join(recent, col("c_custkey") === col("o_custkey"), "full")
          .select(col("c_custkey"), col("o_custkey"), col("n_recent"))
          .orderBy(col("c_custkey").asc_nulls_first, col("o_custkey").asc_nulls_first)
      },
      Some("""SELECT c_custkey, o_custkey, n_recent
        FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 100) c
        FULL JOIN (SELECT o_custkey, COUNT(*) AS n_recent FROM orders
                   WHERE o_orderdate >= TIMESTAMP '2001-06-01'
                   GROUP BY o_custkey) o
        ON c_custkey = o_custkey
        ORDER BY c_custkey ASC NULLS FIRST, o_custkey ASC NULLS FIRST""")),

    // ---------------------------------------------- C14b string agg
    QueryDef("q_string_agg",
      (s, d) => Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy("r_name"),
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // ------------------------------------------------ C3c percentile
    QueryDef("q_percentile",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          round(min(col("l_quantity")), 6).as("qmin"),
          round(max(col("l_quantity")), 6).as("qmax"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        round(MIN(l_quantity), 6) AS qmin, round(MAX(l_quantity), 6) AS qmax
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------ B7 approx quantile
    // Greenwald-Khanna sketch values are engine-specific, so (like B6
    // HLL) the oracle pins the sketch CONTRACT: with accuracy=1000 the
    // estimate must land between the exact 0.49 and 0.51 quantiles
    // (rank error 1/accuracy << 0.01). p50_exact is value-checked.
    QueryDef("q_approx_quantile",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_exact"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap"),
          expr("percentile(l_extendedprice, 0.49)").as("lo"),
          expr("percentile(l_extendedprice, 0.51)").as("hi"))
        .select(col("l_returnflag"), col("p50_exact"),
          (col("ap") >= col("lo") && col("ap") <= col("hi")).as("approx_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
        TRUE AS approx_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------- B8 frequent items
    // freqItems sketch values are approximate (false positives
    // allowed), but the algorithm GUARANTEES every value above the
    // support threshold appears — so the oracle pins exactly that
    // containment: each exactly-frequent value must be found in the
    // sketch output. The sketch array is a bounded driver collect.
    QueryDef("q_freq_items",
      (s, d) => {
        val ord = Tables.orders(s, d)
        val sketch = ord.stat.freqItems(Array("o_orderpriority"), 0.1)
          .head().getSeq[String](0)
        val tot = ord.agg(count(lit(1)).as("tot"))
        ord.groupBy(col("o_orderpriority").as("value"))
          .agg(count(lit(1)).as("n"))
          .join(broadcast(tot))
          .where(col("n") > col("tot") * 0.1)
          .select(col("value"),
            array_contains(lit(sketch.toArray), col("value")).as("found"))
          .orderBy("value")
      },
      Some("""SELECT o_orderpriority AS value, TRUE AS found
        FROM orders GROUP BY o_orderpriority
        HAVING COUNT(*) > 0.1 * (SELECT COUNT(*) FROM orders)
        ORDER BY value""")),

    // ---------------------------------------------- C3d moment stats
    // rounded: both engines use stable one-pass moment updates but
    // accumulate in different orders, so last-bit noise is expected.
    QueryDef("q_stats",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        round(stddev_samp(l_discount), 6) AS sd_disc,
        round(var_samp(l_discount), 6) AS var_disc,
        round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------- B11 higher moments
    // skewness/excess kurtosis from raw power sums: the builtins are
    // population-vs-sample mismatched across engines, the moment-sum
    // route is engine-exact for the integral l_quantity (see
    // Compute.momentStats). One map-side-combined agg.
    QueryDef("q_moments",
      (s, d) => Compute.momentStats(Tables.lineitem(s, d),
          "l_returnflag", "l_quantity")
        .orderBy("l_returnflag"),
      Some("""WITH a AS (
          SELECT l_returnflag, COUNT(*) AS n,
            sum(l_quantity) AS s1,
            sum(l_quantity*l_quantity) AS s2,
            sum(l_quantity*l_quantity*l_quantity) AS s3,
            sum(l_quantity*l_quantity*l_quantity*l_quantity) AS s4
          FROM lineitem GROUP BY 1
        ), m AS (
          SELECT l_returnflag, n,
            s1/n AS mean,
            s2/n - (s1/n)*(s1/n) AS m2,
            s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3,
            s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
              - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
          FROM a)
        SELECT l_returnflag, n,
          round(mean, 6) AS mean, round(m2, 6) AS m2,
          round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
          round(m4 / (m2 * m2) - 3, 6) AS kurtosis
        FROM m ORDER BY l_returnflag""")),

    // ---------------------------------------------- C13b cube grouping
    QueryDef("q_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        COALESCE(l_linestatus, 'ALL') AS ls,
        COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // ------------------------------------------------- C14c regexp
    QueryDef("q_regexp",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
          (regexp_count(col("p_name"), lit("a")).cast(LongType)).as("n_a"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("devowel"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a,
        regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel
        FROM part ORDER BY p_partkey""")),

    // ----------------------------------------- J2 salted join (oracle)
    // salting is semantics-preserving, so the oracle is the plain join.
    // r16 (guide §2.5): hotCap engages the two-path split — only keys
    // with >= 64k rows get the ×salts dim replication; l_orderkey tops
    // out at 7 lines per order, so the demo pays one narrow key-count
    // pass instead of replicating the whole orders side 8× (the r15
    // unconditional form's dominant cost). SkewSpec pins two-path ==
    // plain-join on a genuinely hot fixture.
    QueryDef("q_salted_join",
      (s, d) => {
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.operators.Skew.saltedJoin(Tables.lineitem(s, d), orders,
            "l_orderkey", salts = 8, hotCap = 1L << 16)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------- A8 set ops / table compare
    // (reference: cpp/src/arrow/compare.cc — array/table equality;
    // relationally that's EXCEPT/INTERSECT)
    QueryDef("q_set_ops",
      (s, d) => {
        // r16 (guide §2.4): EXCEPT and INTERSECT over the same two
        // filtered key sets are one membership aggregate — one orders
        // scan and one map-side-combined exchange instead of two scans
        // per branch and two distinct-join shuffles. A distinct F-key
        // is 'both' iff it also appears under O, else 'f_only' —
        // exactly the union of f.except(o) and f.intersect(o).
        Tables.orders(s, d)
          .groupBy(col("o_custkey").as("k"))
          .agg(max(when(col("o_orderstatus") === "F", 1)).as("in_f"),
            max(when(col("o_orderstatus") === "O", 1)).as("in_o"))
          .where(col("in_f") === 1)
          .select(col("k"),
            when(col("in_o") === 1, "both").otherwise("f_only").as("tag"))
          .orderBy("tag", "k")
      },
      Some("""SELECT k, 'f_only' AS tag FROM (
          SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        UNION ALL
        SELECT k, 'both' AS tag FROM (
          SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        ORDER BY tag, k""")),

    // ------------------------------------------------------ C15 case expr
    QueryDef("q_case_expr",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg2"),
          nullif(col("c_nationkey"), lit(0)).cast(LongType).as("nat_nz"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
        CAST(NULLIF(c_nationkey, 0) AS BIGINT) AS nat_nz
        FROM customer ORDER BY c_custkey""")),

    // ------------------------------------------- C35 range join (bucketed)
    // interval join via bucket equi-join: overlapping price bands
    // derived from nation keys (width 30k, stride 20k → most orders
    // match 1-2 bands). The oracle is the plain BETWEEN theta-join.
    QueryDef("q_range_join",
      (s, d) => {
        val bands = Tables.nation(s, d).select(
          col("n_nationkey").cast(LongType).as("band_id"),
          (col("n_nationkey") * 20000.0).as("lo"),
          (col("n_nationkey") * 20000.0 + 29999.0).as("hi"))
        graft.operators.TemporalJoins
          .rangeJoinByBucket(Tables.orders(s, d), "o_totalprice",
            bands, "lo", "hi", bucketWidth = 10000.0)
          .groupBy("band_id")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("band_id")
      },
      Some(s"""SELECT band_id, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
        FROM orders JOIN (
          SELECT CAST(n_nationkey AS BIGINT) AS band_id,
            n_nationkey * 20000.0 AS lo, n_nationkey * 20000.0 + 29999.0 AS hi
          FROM nation)
        ON o_totalprice BETWEEN lo AND hi
        GROUP BY band_id ORDER BY band_id""")),

    // ------------------------------------------------------ C37 pivot
    // Spark pivot yields NULL for absent combos where a CASE-count
    // oracle yields 0 — coalesce pins the semantics
    QueryDef("q_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------- C38 range-frame window
    // value-range moving sum (RANGE BETWEEN n PRECEDING), decimal-exact
    QueryDef("q_window_range",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderkey")
          .rangeBetween(-1000, 0)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType)
              .as("moving_sum"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderkey
          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ----------------------------------------------- C42 grouping sets
    // explicit GROUPING SETS distinct from rollup/cube (via the SQL
    // entry path — same Catalyst Expand plan as the DataFrame API)
    QueryDef("q_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
            COALESCE(o_orderpriority, 'ALL') AS prio,
            COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY st, prio""")
      },
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        COALESCE(o_orderpriority, 'ALL') AS prio,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY st, prio""")),

    // ------------------------------------- C43 IN + scalar subqueries
    QueryDef("q_in_subquery",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("cust_sq")
        Tables.orders(s, d).createOrReplaceTempView("ord_sq")
        s.sql("""SELECT c_custkey FROM cust_sq
          WHERE c_custkey IN (SELECT o_custkey FROM ord_sq WHERE o_orderstatus = 'P')
             OR c_acctbal > (SELECT max(c_acctbal) * 0.99 FROM cust_sq)
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
           OR c_acctbal > (SELECT max(c_acctbal) * 0.99 FROM customer)
        ORDER BY c_custkey""")),

    // ----------------------------------------------------- C40 unpivot
    // wide→long via stack(); the oracle is the equivalent UNION ALL
    QueryDef("q_unpivot",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          expr("""stack(2, 'acctbal', c_acctbal,
                           'natkey', CAST(c_nationkey AS DOUBLE))
                  AS (metric, value)"""))
        .orderBy("c_custkey", "metric"),
      Some("""SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
        UNION ALL
        SELECT c_custkey, 'natkey', CAST(c_nationkey AS DOUBLE) FROM customer
        ORDER BY c_custkey, metric""")),

    // ------------------------------------- C41 ranking window functions
    QueryDef("q_window_rankfuncs",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority").orderBy("o_orderkey")
        Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_orderkey"),
            ntile(4).over(w).cast(LongType).as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        percent_rank() OVER w AS pr,
        cume_dist() OVER w AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        ORDER BY o_orderpriority, o_orderkey""")),

    // --------------------------------------------- C39 array functions
    // the list-type op surface (arrow list arrays): size/contains/
    // distinct/sort/slice/element_at, mirrored onto DuckDB list ops
    QueryDef("q_array_funcs",
      (s, d) => {
        val toks = split(trim(lower(col("text"))), "\\s+")
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(toks).cast(LongType).as("n_toks"),
            array_contains(toks, "the").as("has_the"),
            // array column surfaced as a joined string: a raw list
            // dtype is hash-fragile across the gate's two fetch paths
            // (child-field naming differs engine to engine)
            concat_ws(" ", slice(sort_array(array_distinct(toks)), 1, 5))
              .as("first5"),
            element_at(toks, 1).as("first_tok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        CAST(len(t) AS BIGINT) AS n_toks,
        list_contains(t, 'the') AS has_the,
        array_to_string(list_sort(list_distinct(t))[1:5], ' ') AS first5,
        t[1] AS first_tok
        FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents)
        ORDER BY doc_id"""))
  )
}
