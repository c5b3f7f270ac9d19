package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic fuzz for the [[BoundedTopK]] aggregate — the kernel EVERY
  * similarity ranker now stands on after the r10/r11 window sweep
  * (brute force, LSH, radius LSH, IVF, PQ, SQ, IVF-PQ, the G16 screen,
  * the AnnIndex search paths, IVF probe selection, exact re-rank).
  * Spark may split a group's rows across any partitions and combine
  * the partials in any merge-tree shape, so the contract is pure
  * Aggregator algebra: for EVERY split and EVERY merge order,
  * finish == the k best (score, id) pairs under Spark SQL's double
  * ordering (NaN greatest and self-equal, −0.0 == 0.0) with id-asc
  * ties, and no intermediate buffer ever exceeds the documented 2k
  * bound. Driver-side (no Spark job): 300 random (input, k, desc,
  * partitioning, merge order) cases with NaN/±0.0/±Inf/tie-heavy
  * scores, seeded.
  */
class BoundedTopKSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator failed"))

  /** Independent replica of Spark SQL's double comparison
    * (SQLOrderingUtil.compareDoubles): primitive compare first so
    * −0.0 ties 0.0, java compare for the NaN cases.
    */
  private def sqlCmp(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else if (x == y) 0
    else java.lang.Double.compare(x, y)

  private val scoreGen: Gen[Double] = Gen.frequency(
    5 -> Gen.oneOf(0.25, 0.5, 0.5, 0.75, -0.5), // tie-heavy bulk
    1 -> Gen.oneOf(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue))

  private val genCase
      : Gen[(Int, Boolean, List[(Double, Long)], List[Int], Long)] =
    for {
      k <- Gen.chooseNum(1, 12)
      desc <- Gen.oneOf(true, false)
      n <- Gen.chooseNum(0, 120)
      entries <- Gen.listOfN(n, for {
        s <- scoreGen
        id <- Gen.chooseNum(0L, 40L) // duplicate-heavy ids too
      } yield (s, id))
      cuts <- Gen.listOfN(6, Gen.chooseNum(0, math.max(n, 1)))
      mergeSeed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (k, desc, entries, cuts, mergeSeed)

  test("BoundedTopK: any partitioning + any merge tree == sort-take " +
      "under Spark SQL double order, buffers bounded, 300 fuzzed cases") {
    (0 until 300).foreach { i =>
      val (k, desc, entries, cuts, mergeSeed) = sample(genCase, 0x70b0L + i)
      val agg = new BoundedTopK(k, desc)
      var maxBuf = 0
      def track(b: Seq[ScoredId]): Seq[ScoredId] = {
        maxBuf = math.max(maxBuf, b.length); b
      }
      val bounds = (cuts :+ 0 :+ entries.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) =>
        entries.slice(a, b)
      }.filter(_.nonEmpty)
      var partials = parts.map(_.foldLeft(agg.zero) { (b, e) =>
        track(agg.reduce(b, ScoredId(e._1, e._2)))
      }).toVector
      if (partials.isEmpty) partials = Vector(agg.zero)
      val rnd = new scala.util.Random(mergeSeed)
      while (partials.size > 1) {
        val a = rnd.nextInt(partials.size)
        val ea = partials(a); partials = partials.patch(a, Nil, 1)
        val b = rnd.nextInt(partials.size)
        val eb = partials(b)
        partials = partials.updated(b, track(agg.merge(ea, eb)))
      }
      val got = agg.finish(partials.head)
      val ord = new Ordering[(Double, Long)] {
        override def compare(a: (Double, Long), b: (Double, Long)): Int = {
          val c = if (desc) sqlCmp(b._1, a._1) else sqlCmp(a._1, b._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
      val want = entries.sorted(ord).take(k)
        .map(e => TopKHit(e._2, if (e._1 == 0.0) 0.0 else e._1))
      // compare scores under SQL equality: −0.0 normalizes to 0.0 and
      // doubleToLongBits canonicalizes NaN — when two physical values
      // are SQL-equal (e.g. (−0.0, id) and (0.0, id)) either may
      // survive, exactly as with the window form
      def key(h: TopKHit) = (h.nid, java.lang.Double.doubleToLongBits(
        if (h.score == 0.0) 0.0 else h.score))
      assert(got.map(key) == want.map(key),
        s"case $i: k=$k desc=$desc got=$got want=$want " +
          s"entries=${entries.take(20)}")
      assert(maxBuf <= 2 * k, s"case $i: buffer grew to $maxBuf > ${2 * k}")
    }
  }

  test("BoundedTopK: hand-pinned NaN/−0.0 fixture matches the window " +
      "form's documented order") {
    // desc: NaN ranks FIRST (greatest), −0.0 ties 0.0 (id breaks it)
    val agg = new BoundedTopK(3, desc = true)
    val in = Seq(ScoredId(0.0, 7L), ScoredId(-0.0, 3L),
      ScoredId(Double.NaN, 9L), ScoredId(1.0, 1L))
    val out = agg.finish(in.foldLeft(agg.zero)(agg.reduce))
    assert(out.map(_.nid) == Seq(9L, 1L, 3L), s"got $out")
  }
}
