package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native analogs of the reference's compute kernels
  * (reference: cpp/src/arrow/compute/kernels/cast.h, hash.h).
  *
  * Arrow at this revision ships exactly three kernels — Cast, Unique,
  * DictionaryEncode. Re-expressed declaratively they all reduce to
  * Catalyst expressions / aggregates, which keeps them inside
  * whole-stage codegen and lets them distribute for free.
  */
object Compute {

  /** Cast kernel (reference: cpp/src/arrow/compute/kernels/cast.h:60).
    * Spark `cast` covers the same matrix (numeric↔numeric,
    * string↔numeric, ts→date, bool↔int) and fails→null like Arrow's
    * safe mode with options relaxed; `try_cast` is the explicit safe
    * variant.
    */
  def castColumns(df: DataFrame, casts: (String, DataType)*): DataFrame =
    casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }

  /** Unique kernel (reference: cpp/src/arrow/compute/kernels/hash.h:62).
    * Distributed: partial hash-distinct per partition, shuffle on the
    * value, final distinct — Catalyst plans exactly that for
    * `dropDuplicates`. At 100 TB this is a single shuffle keyed on the
    * value with map-side combine.
    */
  def unique(df: DataFrame, column: String): DataFrame =
    df.select(col(column).as("v")).distinct()

  /** DictionaryEncode (reference: cpp/src/arrow/compute/kernels/hash.h:72).
    * Arrow assigns codes by order of first appearance — nondeterministic
    * under distribution, so we define the dictionary by sorted value
    * order (deterministic everywhere). The dictionary is tiny relative
    * to the data (that's the point of dictionary encoding), so we build
    * it with a distinct + a single-partition windowed row_number, then
    * broadcast-join the codes back: no global sort of the data itself.
    */
  def dictionaryEncode(df: DataFrame, column: String): DataFrame = {
    // null values stay null-coded (left join), matching arrow's
    // kernel: nulls are not dictionary members
    val dict = df.where(col(column).isNotNull)
      .select(col(column).as("value")).distinct()
      .withColumn("code",
        (row_number().over(Window.orderBy(col("value"))) - 1).cast(LongType))
    df.join(broadcast(dict), df(column) === dict("value"), "left")
  }

  /** Dictionary itself (value → code), sorted-value code assignment. */
  def dictionary(df: DataFrame, column: String): DataFrame =
    df.where(col(column).isNotNull).select(col(column).as("value")).distinct()
      .withColumn("code",
        (row_number().over(Window.orderBy(col("value"))) - 1).cast(LongType))

  /** value_counts — the hash-kernel family's natural companion
    * (pyarrow exposes it alongside unique in later revisions).
    */
  def valueCounts(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column).as("value")).agg(count(lit(1)).as("cnt"))

  /** Stable 64-bit column hash (xxhash64), the Spark-native analog of
    * arrow's internal hashing used by the hash kernels.
    */
  def hash64(c: Column): Column = xxhash64(c)

  /** Skewness and excess kurtosis from raw power sums (B11 — the
    * higher-moment end of the aggregation kernel family). Spark's
    * builtin skewness/kurtosis use population formulas while DuckDB's
    * are sample-bias-corrected, so the builtins are not cross-engine
    * comparable; central moments derived from Σxᵏ are. For
    * integer-valued inputs bounded by B, every partial sum of Σxᵏ is
    * an integer below 2⁵³ (B⁴·n ≪ 2⁵³ at any realistic group size),
    * so the four sums are exact and order-independent — the only
    * inexact flops are the handful of derivations after the agg,
    * rounded to 6 dp per the cross-engine float contract. Cost: one
    * map-side-combined aggregation, identical to any plain groupBy.
    */
  def momentStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast(DoubleType)
    val agg = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(x).as("s1"), sum(x * x).as("s2"),
      sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
    val nd = col("n").cast(DoubleType)
    val mean = col("s1") / nd
    val m2 = col("s2") / nd - mean * mean
    val m3 = col("s3") / nd - lit(3.0) * mean * (col("s2") / nd) +
      lit(2.0) * mean * mean * mean
    val m4 = col("s4") / nd - lit(4.0) * mean * (col("s3") / nd) +
      lit(6.0) * mean * mean * (col("s2") / nd) -
      lit(3.0) * mean * mean * mean * mean
    agg.select(col(groupCol), col("n"),
      round(mean, 6).as("mean"),
      round(m2, 6).as("m2"),
      round(m3 / (m2 * sqrt(m2)), 6).as("skewness"),
      round(m4 / (m2 * m2) - 3.0, 6).as("kurtosis"))
  }

  /** Table profile (A10; pandas describe/info analog): per-column null
    * and distinct counts.
    *
    * One aggregate per column, unioned — NOT one aggregate with N
    * `countDistinct`s. Multiple distinct aggregates make Catalyst plan
    * an Expand that replicates every input row N+1 times into a single
    * hash shuffle (at 100 TB, a ~600 TB shuffle to profile a table).
    * Per-column single-distinct aggregates each plan as a column-
    * pruned scan + two-phase hash agg whose shuffle carries only the
    * column's DISTINCT values; total IO across the N branches is each
    * column read once — the same bytes as one full-width scan, with
    * none of the replication.
    *
    * Default is the production configuration: `approx_count_distinct`
    * (HLL++, map-side partial, fixed-size sketch shuffle). `exact =
    * true` is the oracle-gate configuration, the same exhaustive-mode
    * pattern the ANN and dedup operators use.
    */
  def tableProfile(df: DataFrame, cols: Seq[String],
                   exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "tableProfile needs at least one column")
    cols.map { c =>
      df.agg(
          count(when(col(c).isNull, 1)).as("n_nulls"),
          (if (exact) countDistinct(col(c))
           else approx_count_distinct(col(c))).as("n_distinct"))
        .select(lit(c).as("column"), col("n_nulls"), col("n_distinct"))
    }.reduce(_ unionAll _)
  }
}
