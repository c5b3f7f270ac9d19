package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized (seeded, reproducible) property coverage for the
  * deterministic-key family — the reproducibility backbone every
  * sampling/split/shard/layout decision keys off. Runs each property
  * over one generated DataFrame in a handful of Spark jobs rather
  * than per-case.
  */
class DeterministicKeysSpec extends SparkSpec {
  import sqlImplicits._

  private val rnd = new scala.util.Random(0x60af7)

  private lazy val ids = {
    val extremes = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue)
    (extremes ++ Seq.fill(500)(rnd.nextLong())).distinct
  }
  private lazy val idDf = ids.toDF("doc_id")

  test("shardAssign stays in range and is deterministic for any Long id") {
    for (n <- Seq(1, 7, 64, 65536)) {
      val out = idDf.select($"doc_id",
        Curation.shardAssign($"doc_id", n).as("s")).as[(Long, Long)]
        .collect().toMap
      assert(out.values.forall(s => s >= 0 && s < n), s"out of range for n=$n")
      val again = idDf.select($"doc_id",
        Curation.shardAssign($"doc_id", n).as("s")).as[(Long, Long)]
        .collect().toMap
      assert(out == again, s"nondeterministic for n=$n")
    }
  }

  test("hashSample rates nest: a lower threshold always yields a subset") {
    val thresholds = Seq(0, 13, 26, 101, 200, 256)
    val samples = thresholds.map { t =>
      t -> Curation.hashSample(idDf, "doc_id", t)
        .select("doc_id").as[Long].collect().toSet
    }
    samples.sliding(2).foreach { case Seq((t1, s1), (t2, s2)) =>
      assert(s1.subsetOf(s2), s"sample at $t1 is not a subset of $t2")
    }
    assert(samples.head._2.isEmpty && samples.last._2 == ids.toSet)
  }

  test("splitAssign puts every id in exactly one split, stably") {
    val out = idDf.select($"doc_id", Curation.splitAssign($"doc_id").as("sp"))
      .as[(Long, String)].collect()
    assert(out.length == ids.length)
    assert(out.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    val again = idDf.select($"doc_id", Curation.splitAssign($"doc_id").as("sp"))
      .as[(Long, String)].collect()
    assert(out.toMap == again.toMap)
  }

  test("rangeBucket maps every in-range value into [0, 2^bits)") {
    // too-wide ranges must trip the overflow guard, not wrap silently
    intercept[IllegalArgumentException] {
      Layout.rangeBucket($"v", Long.MinValue / 4, Long.MaxValue / 4, 16)
    }
    val cases = Seq((0L, 1000L, 4), (-500L, 500L, 8), (1L, 2L, 1),
      (-(1L << 40), (1L << 40) - 1, 16))
    for ((lo, hi, bits) <- cases) {
      val vals = Seq(lo, hi) ++ Seq.fill(200)(
        lo + (rnd.nextLong().abs % (hi - lo + 1)))
      val out = vals.toDF("v")
        .select(Layout.rangeBucket($"v", lo, hi, bits).as("b"))
        .as[Long].collect()
      assert(out.forall(b => b >= 0 && b < (1L << bits)),
        s"bucket out of range for ($lo,$hi,$bits): ${out.min}..${out.max}")
    }
  }

  test("zValue interleaves losslessly: coordinates recover from the curve") {
    val bits = 8
    val coords = Seq.fill(300)((rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val out = coords.toDF("x", "y", "z")
      .select($"x", $"y", $"z",
        Layout.zValue(Seq($"x", $"y", $"z"), bits).as("zv"))
      .as[(Long, Long, Long, Long)].collect()
    out.foreach { case (x, y, z, zv) =>
      def deinterleave(c: Int): Long =
        (0 until bits).map(i => ((zv >> (i * 3 + c)) & 1L) << i).sum
      assert((deinterleave(0), deinterleave(1), deinterleave(2)) == ((x, y, z)),
        s"z-curve not invertible at ($x,$y,$z) -> $zv")
    }
  }
}
