package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {
  import sqlImplicits._
  import Streams._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture: Seq[Event] = Seq(
    Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
    Event(2, ts("2024-01-01 10:10:00"), 1, "a", 2.0),
    Event(3, ts("2024-01-01 10:55:00"), 1, "b", 3.0),
    Event(4, ts("2024-01-01 09:00:00"), 2, "a", 4.0),
    Event(2, ts("2024-01-01 10:10:00"), 1, "a", 2.0) // duplicate event_id=2
  )

  private def runToMemory[T](df: org.apache.spark.sql.Dataset[T], name: String,
                             mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
  }

  test("I1: tumbling hourly agg with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(fixture.distinct: _*)
    // complete mode: a single AvailableNow batch never advances the
    // watermark past the data, so append would emit nothing yet —
    // complete shows every open window.
    runToMemory(hourlyAgg(input.toDF()), "t_hourly", mode = "complete")
    val rows = spark.table("t_hourly")
      .select("event_type", "n_events", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(rows == Set(("a", 1L, 4.0), ("a", 2L, 3.0), ("b", 1L, 3.0)))
  }

  test("I2: sliding windows produce overlapping buckets") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(fixture.distinct: _*)
    runToMemory(slidingAgg(input.toDF()), "t_sliding", mode = "complete")
    val n = spark.table("t_sliding").count()
    // each event lands in 4 sliding buckets (1h window, 15m slide)
    assert(n > 4, s"expected overlapping windows, got $n rows")
  }

  test("I3: dropDuplicatesWithinWatermark removes the duplicate event") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(fixture: _*)
    runToMemory(dedupe(input.toDF()), "t_dedup")
    val ids = spark.table("t_dedup").select("event_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L, 3L, 4L)))
  }

  test("I4: streaming sessionization agrees with the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(fixture.distinct: _*)
    // batch twin on the same fixture
    val batch = openSessions(fixture.distinct.toDS(), gapMinutes = 30).collect().toSet
    val q = sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("t_sess")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("t_sess").as[SessionOut].collect().toSet
    // append-mode flatMapGroupsWithState only emits *closed* sessions;
    // user 1's first session closes when the 10:55 event arrives.
    assert(streamed.subsetOf(batch),
      s"streamed $streamed must be a subset of batch $batch")
    assert(streamed.exists(s => s.user_id == 1 && s.n_events == 2),
      s"user 1's closed first session must be emitted, got $streamed")
  }

  test("I6: stream-static enrich broadcasts the dim side, no stream shuffle") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(fixture.distinct: _*)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    runToMemory(enrich(input.toDF(), dim, "user_id"), "t_enrich")
    val rows = spark.table("t_enrich").select("event_id", "tier")
      .as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "gold"), (2L, "gold"), (3L, "gold"), (4L, "basic")))
  }

  test("I7: stream-stream interval join pairs clicks with in-horizon views only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(10, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Event(11, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
      Event(12, ts("2024-01-01 08:00:00"), 1, "view", 0.0),  // beyond 60m horizon
      Event(13, ts("2024-01-01 10:40:00"), 2, "view", 0.0),  // other user
      Event(14, ts("2024-01-01 10:50:00"), 1, "view", 0.0))  // after the click
    runToMemory(clickViewJoin(input.toDF(), horizonMinutes = 60), "t_ssjoin")
    val pairs = spark.table("t_ssjoin").select("click_id", "view_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((11L, 10L)), s"got $pairs")
  }

  test("I14: streaming quality gate == batch gate, stateless plan") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{QualityClassifier, TextAnalysis}
    // train-once artifacts on a tiny static corpus (the versioned-input
    // discipline the batch pipeline uses)
    val prose = "the catalog lists every survey with careful notes and "
    val train = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, (prose * 3) + s"entry $i")
      else (i.toLong, s"zxq wvv qq$i kpk zzz xjx")
    }.toDF("doc_id", "text")
    val model = QualityClassifier.train(train, "text",
      org.apache.spark.sql.functions.length($"text") > 100,
      buckets = 256, maxIter = 10)
    val merges = TextAnalysis.bpeTrain(train, "text", numMerges = 30)

    val rows = Seq(
      (100L, (prose * 3) + "entry hundred"), // passes everything
      (101L, "too short"),                   // fails the word band
      (102L, prose * 3 + "qq"))              // passes gopher; prob decides
    val input = MemoryStream[(Long, String)]
    input.addData(rows: _*)
    val gate = (df: org.apache.spark.sql.DataFrame) =>
      Streams.qualityGate(df.toDF("doc_id", "text"), "text", model, merges,
        minWords = 5L, minStop = 0L, minProb = 0.5)
    runToMemory(gate(input.toDF()), "t_qgate")
    val streamed = spark.table("t_qgate")
      .select("doc_id", "quality_prob", "n_bpe_tokens")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val batch = gate(rows.toDF("a", "b"))
      .select("doc_id", "quality_prob", "n_bpe_tokens")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch,
      s"stream and batch gates must agree: $streamed vs $batch")
    assert(streamed.exists(_._1 == 100L), "the clean doc must survive")
    assert(!streamed.exists(_._1 == 101L), "the short doc must be gated")
    // the streaming plan carries NO stateful operator: pure map/filter
    val q = gate(input.toDF()).writeStream.format("memory")
      .queryName("t_qgate_plan").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val explained = q.lastProgress.toString
    assert(!explained.contains("stateOperators\" : [ {"),
      s"gate must be stateless:\n$explained")
  }
}
