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
}
