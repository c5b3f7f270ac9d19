package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef.dsum

/** Batch event analytics: the SQL-checkable twins of the Structured
  * Streaming operators in graft.streaming (same semantics, same
  * grouping keys — the streaming specs assert agreement on fixtures).
  */
object Events {

  /** Tumbling-window aggregate: events per (hour, type) with an exact
    * decimal value sum. One shuffle; map-side partial aggregation.
    */
  // date_trunc always yields TIMESTAMP; surface NTZ (naive) like the
  // source column and the DuckDB oracle (session tz is UTC, so the
  // wall clock is identical)
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(
      date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"),
      col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))

  /** Gap-based sessionization (classic lag + cumulative-sum): a new
    * session starts when the gap to the previous event of the same
    * user exceeds `gapMinutes`. Wholly window-function based — one
    * shuffle keyed by user_id, no state store needed in batch.
    * The per-user window is the operator's own semantics (session
    * boundaries are an ordered scan of one user's history — not an
    * associative reduction that could be de-skewed into an
    * aggregate); partition size is bounded by a single entity's
    * event count, the same per-key contract every keyed-state
    * streaming engine imposes.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapMinutes * 60L * 1000000L
    // NTZ-safe epoch micros (session tz is UTC, so the cast is exact)
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    events
      .withColumn("prev_us", lag(tsUs, 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull, 0L)
          .otherwise((tsUs - col("prev_us") > gapUs).cast(LongType)))
      .withColumn("session_id", sum(col("new_s")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
  }

  /** Forward fill (C50): replace nulls in `valueCol` with the last
    * non-null value of the same partition in `orderCols` order — the
    * time-series gap-fill primitive (sensor dropouts, sparse
    * attributes). One shuffle on the partition key; the running
    * `last(ignoreNulls)` frame is O(1) state per row.
    */
  def forwardFill(df: DataFrame, partCol: String, orderCols: Seq[String],
                  valueCol: String): DataFrame = {
    val w = Window.partitionBy(partCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${valueCol}_filled",
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Per-group z-score anomaly flags (I12): events whose value
    * deviates from the group mean by more than `k` sample standard
    * deviations. Group stats are one map-side-combined aggregation
    * (rows = |groups|, broadcast-joinable); z is surfaced rounded to
    * 6 dp — the cross-engine float contract for distributed moment
    * reductions.
    */
  def zScoreAnomalies(df: DataFrame, groupCol: String, valueCol: String,
                      k: Double = 2.0): DataFrame = {
    val v = col(valueCol).cast(DoubleType)
    val stats = df.groupBy(groupCol)
      .agg(avg(v).as("mean_v"), stddev_samp(v).as("sd_v"))
    df.join(broadcast(stats), groupCol)
      .withColumn("z", round((v - col("mean_v")) / col("sd_v"), 6))
      .where(abs(col("z")) > k)
  }

  /** Time-decayed engagement score (I13): per user,
    * Σ value · 0.5^⌊days_ago / halfLifeDays⌋ against the corpus max
    * date — the recency-weighted activity feature behind retention /
    * ranking models. The decay step is quantized to whole buckets so
    * the weight is an exact power of two (no transcendental in the hot
    * path): every term is bit-exact across engines, each contribution
    * is rounded to 6 dp and summed as decimal, so the reduction is
    * order-independent. Scale shape: the reference date is a single
    * broadcast scalar; everything else is one map + one user-keyed
    * map-side-combined aggregation.
    */
  def decayedEngagement(events: DataFrame, valueCol: String = "value",
                        halfLifeDays: Int = 7,
                        userCol: String = "user_id",
                        tsCol: String = "ts"): DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    val ref = events.agg(max(to_date(col(tsCol))).as("ref_d"))
    events.join(broadcast(ref))
      .withColumn("buckets",
        floor(datediff(col("ref_d"), to_date(col(tsCol)))
          / lit(halfLifeDays.toDouble)).cast(DoubleType))
      .withColumn("c",
        round(col(valueCol) * pow(lit(0.5), col("buckets")), 6)
          .cast(DecimalType(28, 6)))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_events"),
        sum(col("c")).cast(DoubleType).as("score"))
  }
}
