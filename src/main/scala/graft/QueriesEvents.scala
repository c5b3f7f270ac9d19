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
        ORDER BY event_id""")),

    // ------------------------------------------------- I9 funnel analysis
    // ordered conversion funnel with a 24 h conversion window: first
    // view → first click within a day of it → first purchase within a
    // day of that. Each stage is a keyed aggregate + join on the user
    // key — no window over the raw event stream, so the funnel scales
    // as three shuffles of per-user rows, not per-event rows.
    QueryDef("q_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
        val day = expr("INTERVAL 24 HOURS")
        val v = ev.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t_view"))
        val c = ev.where(col("event_type") === "click")
          .join(v, "user_id")
          .where(col("ts") > col("t_view") && col("ts") <= col("t_view") + day)
          .groupBy("user_id").agg(min("ts").as("t_click"))
        val p = ev.where(col("event_type") === "purchase")
          .join(c, "user_id")
          .where(col("ts") > col("t_click") && col("ts") <= col("t_click") + day)
          .groupBy("user_id").agg(min("ts").as("t_buy"))
        v.select(lit("1_view").as("stage"))
          .unionAll(c.select(lit("2_click").as("stage")))
          .unionAll(p.select(lit("3_purchase").as("stage")))
          .groupBy("stage").agg(count(lit(1)).as("n_users"))
          .orderBy("stage")
      },
      Some("""WITH v AS (
          SELECT user_id, MIN(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY 1),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL 24 HOURS
          WHERE e.event_type = 'click' GROUP BY 1),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t_buy FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
            AND e.ts <= c.t_click + INTERVAL 24 HOURS
          WHERE e.event_type = 'purchase' GROUP BY 1)
        SELECT stage, n_users FROM (
          SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
          UNION ALL SELECT '2_click', COUNT(*) FROM c
          UNION ALL SELECT '3_purchase', COUNT(*) FROM p)
        ORDER BY stage""")),

    // ---------------------------------------------- I10 cohort retention
    // day-0 cohort per user × active-day offset: the standard
    // retention triangle. Aggregates are per (cohort, offset) — the
    // raw events reduce to distinct (user, day) first, so the heavy
    // shuffle carries at most users × days rows.
    QueryDef("q_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
        val active = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val cohort = active.groupBy("user_id").agg(min("day").as("cohort_day"))
        active.join(cohort, "user_id")
          .groupBy(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH active AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        cohort AS (
          SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY 1)
        SELECT c.cohort_day, date_diff('day', c.cohort_day, a.day) AS day_offset,
          COUNT(DISTINCT a.user_id) AS n_users
        FROM active a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY 1, 2 ORDER BY cohort_day, day_offset""")),

    // ------------------------------------------- I11 path transitions
    // consecutive-event transition matrix per user stream (the markov
    // view of user behavior). One per-user window pass + a small
    // (types × types) aggregate.
    QueryDef("q_event_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("next_type", lead("event_type", 1).over(w))
          .where(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy("from_type", "to_type")
      },
      Some("""SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        FROM (
          SELECT event_type,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS next_type
          FROM events)
        WHERE next_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY from_type, to_type""")),

    // ------------------------------------------------- C50 forward fill
    // Gap-fill: 'view' events get a null value, forward-filled from
    // the user's previous non-null event. Pure window op — one
    // user-keyed shuffle, value doubles pass through untouched so the
    // hash compare is exact.
    QueryDef("q_gap_fill",
      (s, d) => {
        val ev = Tables.events(s, d).withColumn("v",
          when(col("event_type") === "view", lit(null).cast("double"))
            .otherwise(col("value")))
        Events.forwardFill(ev, "user_id", Seq("ts", "event_id"), "v")
          .select(col("event_id"), col("user_id"), col("v_filled"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
          last_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        FROM events ORDER BY event_id""")),

    // --------------------------------------------- I12 z-score anomaly
    // Events > 2 sample stddevs from their type's mean. Group moments
    // are distributed double reductions, so z rounds to 6 dp on both
    // sides (the established float contract) — and the filter uses the
    // rounded z so membership is engine-independent too.
    QueryDef("q_anomaly_zscore",
      (s, d) => Events.zScoreAnomalies(Tables.events(s, d), "event_type", "value", 2.0)
        .select(col("event_id"), col("event_type"), col("z"))
        .orderBy("event_id"),
      Some("""WITH stats AS (
          SELECT event_type, avg(value) AS mean_v, stddev_samp(value) AS sd_v
          FROM events GROUP BY event_type)
        SELECT event_id, event_type, round((value - mean_v) / sd_v, 6) AS z
        FROM events JOIN stats USING (event_type)
        WHERE abs(round((value - mean_v) / sd_v, 6)) > 2.0
        ORDER BY event_id""")),

    // ------------------------------------------ I13 time-decayed score
    // recency-weighted engagement per user: Σ value · 0.5^⌊days/7⌋ vs
    // the corpus max date. The decay bucket is integer and the weight
    // an exact power of two, so every term is bit-exact on both
    // engines (no transcendental); terms round 6 dp and decimal-sum.
    // One broadcast scalar + one user-keyed map-side-combined agg.
    QueryDef("q_decay_score",
      (s, d) => Events.decayedEngagement(Tables.events(s, d),
          "value", halfLifeDays = 7)
        .orderBy("user_id"),
      Some("""WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS ref_d FROM events),
        c AS (SELECT user_id,
            CAST(round(value * power(0.5,
                floor(date_diff('day', CAST(ts AS DATE), ref_d) / 7.0)), 6)
              AS DECIMAL(28,6)) AS c
          FROM events CROSS JOIN ref)
        SELECT user_id, COUNT(*) AS n_events,
          CAST(SUM(c) AS DOUBLE) AS score
        FROM c GROUP BY user_id ORDER BY user_id"""))
  )
}
