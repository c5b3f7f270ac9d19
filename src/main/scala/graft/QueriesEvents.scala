package graft

import org.apache.spark.sql.functions._

import graft.QueryDef.sqlDsum
import graft.operators.Events

/** Event analytics (SURVEY §2.I5): batch twins of the streaming ops,
  * DuckDB-oracle-checked. DuckDB truncates the file's nanosecond
  * timestamps to microseconds exactly like Tables.events does, so
  * timestamps compare exactly.
  */
object QueriesEvents {

  val all: Seq[QueryDef] = Seq(

    // semi-structured: parse the JSON props column (the pipeline's
    // metadata sidecar pattern); DuckDB mirrors via json_extract.
    QueryDef("q_json_props",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy()
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k")),
      Some("""SELECT CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_k
        FROM events""")),

    QueryDef("q_events_window",
      (s, d) => Events.hourlyAgg(Tables.events(s, d))
        .orderBy("hour_ts", "event_type"),
      Some(s"""SELECT date_trunc('hour', ts) AS hour_ts, event_type,
        COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
        FROM events GROUP BY date_trunc('hour', ts), event_type
        ORDER BY hour_ts, event_type""")),

    QueryDef("q_sessionize",
      (s, d) => Events.sessionize(Tables.events(s, d), gapMinutes = 30)
        .orderBy("user_id", "session_id"),
      Some("""WITH g AS (
          SELECT user_id, event_id, ts,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          FROM events),
        n AS (
          SELECT user_id, event_id, ts,
            CASE WHEN prev_us IS NULL THEN 0
                 WHEN epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
          FROM g),
        sid AS (
          SELECT user_id, ts,
            CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM n)
        SELECT user_id, session_id, COUNT(*) AS n_events,
          MIN(ts) AS t_start, MAX(ts) AS t_end
        FROM sid GROUP BY user_id, session_id
        ORDER BY user_id, session_id"""))
  )
}
