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

  /** The 4 hour-long, 15-min-slide window starts covering `ts`:
    * floor(ts, 15min) - k*15min for k in 0..3.
    */
  private def window_slide_starts(ts: org.apache.spark.sql.Column) = {
    val us15 = 900000000L // 15 min in micros
    val tsUs = unix_micros(ts.cast("timestamp"))
    val floored = tsUs - pmod(tsUs, lit(us15))
    transform(sequence(lit(0L), lit(3L)),
      k => timestamp_micros(floored - k * us15).cast("timestamp_ntz"))
  }

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

    // batch twin of the sliding-window stream op: each event lands in
    // the 4 hour-long windows sliding by 15m that cover it
    QueryDef("q_events_sliding",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          explode(window_slide_starts(col("ts"))).as("w_start"))
        .groupBy("w_start", "event_type")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("w_start", "event_type"),
      Some("""SELECT w_start, event_type, COUNT(*) AS n_events
        FROM (
          SELECT event_type,
            date_trunc('hour', ts) - INTERVAL 45 MINUTE
              + to_minutes(15 * s.g) AS w_start, ts
          FROM events, generate_series(0, 6) s(g))
        WHERE ts >= w_start AND ts < w_start + INTERVAL 60 MINUTE
        GROUP BY w_start, event_type ORDER BY w_start, event_type""")),

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
        ORDER BY user_id, session_id""")),

    // as-of join (backward, inclusive): each click matched to the
    // user's latest view at or before it — oracled by DuckDB's native
    // ASOF JOIN. Right side pre-aggregated to unique (user, ts) so the
    // at-equal-ts winner is well-defined in both engines.
    QueryDef("q_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        val views = ev.where(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("view_value"))
        graft.operators.TemporalJoins
          .asofJoin(clicks, views, "user_id", "ts", Seq("view_value"), "_v")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("ts_v").as("view_ts"), col("view_value_v").as("view_value"))
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (
          SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        views AS (
          SELECT user_id, ts AS view_ts, max(value) AS view_value
          FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
        SELECT event_id, c.user_id, ts, view_ts, view_value
        FROM clicks c ASOF JOIN views v
          ON c.user_id = v.user_id AND c.ts >= v.view_ts
        ORDER BY event_id"""))
  )
}
