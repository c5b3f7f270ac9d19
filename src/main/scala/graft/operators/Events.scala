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
}
