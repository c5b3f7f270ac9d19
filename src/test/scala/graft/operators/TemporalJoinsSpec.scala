package graft.operators

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import sqlImplicits._

  test("asofJoin picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 4L, "b"), (2L, 7L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 10L, 200.0), (1L, 15L, 300.0),
        (2L, 9L, 400.0))
      .toDF("k", "ts", "v")
    val res = TemporalJoins.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("tag", "ts_r", "v_r").as[(String, Long, Double)].collect().toSet
    // (1,10) matches right at 10 (inclusive); (1,4) has no prior right
    // row → dropped; (2,7) has no prior right row (9 > 7) → dropped
    assert(res == Set(("a", 10L, 200.0)), s"got $res")
  }

  test("asofJoin never pairs across keys and carries forward per key") {
    val left = Seq((1L, 100L, "x"), (2L, 100L, "y")).toDF("k", "ts", "tag")
    val right = Seq((1L, 1L, 1.0), (2L, 2L, 2.0)).toDF("k", "ts", "v")
    val res = TemporalJoins.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("tag", "v_r").as[(String, Double)].collect().toSet
    assert(res == Set(("x", 1.0), ("y", 2.0)))
  }

  test("rangeJoinByBucket matches overlapping intervals exactly") {
    val pts = Seq((1L, 25.0), (2L, 5.0), (3L, 55.0)).toDF("id", "x")
    val ivs = Seq(("A", 0.0, 30.0), ("B", 20.0, 40.0)).toDF("name", "lo", "hi")
    val res = TemporalJoins.rangeJoinByBucket(pts, "x", ivs, "lo", "hi", 10.0)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(res == Set((1L, "A"), (1L, "B"), (2L, "A")), s"got $res")
  }

  test("rangeJoinByBucket boundary inclusivity") {
    val pts = Seq((1L, 30.0), (2L, 20.0)).toDF("id", "x")
    val ivs = Seq(("A", 20.0, 30.0)).toDF("name", "lo", "hi")
    val res = TemporalJoins.rangeJoinByBucket(pts, "x", ivs, "lo", "hi", 7.0)
      .select("id").as[Long].collect().toSet
    assert(res == Set(1L, 2L))
  }
}
