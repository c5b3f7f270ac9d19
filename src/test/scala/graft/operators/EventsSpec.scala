package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions (gap 45min); user 2: one session.
  private lazy val ev = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), "a", 1.0),
    (1L, 11L, ts("2024-01-01 10:10:00"), "a", 2.0),
    (1L, 12L, ts("2024-01-01 10:55:00"), "b", 3.0),
    (2L, 20L, ts("2024-01-01 09:00:00"), "a", 4.0)
  ).toDF("user_id", "event_id", "ts", "event_type", "value")

  test("sessionize splits on gap > 30min") {
    val s = Events.sessionize(ev, gapMinutes = 30)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(s == Set((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("sessionize t_start/t_end bound the session") {
    val s = Events.sessionize(ev, gapMinutes = 30)
      .where($"user_id" === 1 && $"session_id" === 0)
      .select("t_start", "t_end").as[(Timestamp, Timestamp)].head()
    assert(s._1 == ts("2024-01-01 10:00:00"))
    assert(s._2 == ts("2024-01-01 10:10:00"))
  }

  test("hourlyAgg groups by hour and type with exact sums") {
    val h = Events.hourlyAgg(ev)
      .select("event_type", "n_events", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    // (09:00,a)=4.0 ; (10:00,a)=1+2=3.0 ; (10:00,b)=3.0
    assert(h == Set(("a", 1L, 4.0), ("a", 2L, 3.0), ("b", 1L, 3.0)))
  }

  test("events table loads with microsecond timestamps at sf0.001") {
    val e = graft.Tables.events(spark, sfDir)
    assert(e.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(e.count() == 1000)
  }

  test("forwardFill carries the last non-null value per user in time order") {
    import org.apache.spark.sql.functions._
    // null out type-'b' values: user 1's third event inherits 2.0
    val withNulls = ev.withColumn("v",
      when($"event_type" === "b", lit(null).cast("double")).otherwise($"value"))
    val out = Events.forwardFill(withNulls, "user_id", Seq("ts", "event_id"), "v")
      .select("event_id", "v_filled").as[(Long, Option[Double])].collect().toMap
    assert(out(10L).contains(1.0))
    assert(out(11L).contains(2.0))
    assert(out(12L).contains(2.0), "null filled from previous event")
    assert(out(20L).contains(4.0))
    // a leading null has nothing to inherit → stays null
    val leading = Seq((1L, 1L, ts("2024-01-01 00:00:00"), "b", 9.9))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
      .withColumn("v", lit(null).cast("double"))
    val lf = Events.forwardFill(leading, "user_id", Seq("ts", "event_id"), "v")
      .select("v_filled").collect()
    assert(lf.head.isNullAt(0))
  }

  test("zScoreAnomalies flags only far-from-mean values") {
    import org.apache.spark.sql.functions._
    // group 'a': 9 values at 1.0 and one at 100 → only the spike has |z|>2
    val rows = (1L to 9L).map(i => (i, "a", 1.0)) :+ (10L, "a", 100.0)
    val df = rows.toDF("event_id", "event_type", "value")
    val out = Events.zScoreAnomalies(df, "event_type", "value", 2.0)
      .select("event_id", "z").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(10L), s"got ${out.toSeq}")
    assert(out.head._2 > 2.0)
    // single-member groups have null stddev → never flagged, never crash
    val single = Seq((1L, "solo", 5.0)).toDF("event_id", "event_type", "value")
    assert(Events.zScoreAnomalies(single, "event_type", "value").count() == 0)
  }

  test("decayedEngagement: weekly-quantized powers of two vs max date") {
    // ref date = 2024-02-01. user 1: 0 days → ·1, 7 days → ·0.5,
    // 14 days → ·0.25; user 2: 1 day old → still bucket 0.
    val de = Seq(
      (1L, ts("2024-02-01 12:00:00"), 10.0),
      (1L, ts("2024-01-25 00:00:00"), 8.0),
      (1L, ts("2024-01-18 23:59:59"), 8.0),
      (2L, ts("2024-01-31 06:00:00"), 3.5)
    ).toDF("user_id", "ts", "value")
    val out = Events.decayedEngagement(de, "value", halfLifeDays = 7)
      .select("user_id", "n_events", "score")
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 3L, 10.0 + 4.0 + 2.0), (2L, 1L, 3.5)), s"got $out")
  }

  test("decayedEngagement: longer half-life dominates, zero value safe") {
    val de = Seq(
      (1L, ts("2024-02-01 00:00:00"), 0.0),
      (1L, ts("2024-01-01 00:00:00"), 64.0)
    ).toDF("user_id", "ts", "value")
    // 31 days ago: half-life 7 → bucket 4 → 64/16 = 4; half-life 31 → 32
    val s7 = Events.decayedEngagement(de, "value", 7)
      .select("score").as[Double].head()
    val s31 = Events.decayedEngagement(de, "value", 31)
      .select("score").as[Double].head()
    assert(s7 == 4.0, s"got $s7")
    assert(s31 == 32.0, s"got $s31")
  }
}
