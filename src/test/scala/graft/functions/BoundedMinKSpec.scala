package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic fuzz for the [[BoundedMinK]] aggregate — the kernel the
  * skew-safe samplers (K3 groupSample, K34 stratifiedExactSample)
  * stand on. Spark may split a group's rows across any partitions and
  * combine the partials in any merge-tree shape, so the aggregate's
  * contract is exactly Aggregator algebra: for EVERY split of the
  * input and EVERY merge order, finish == the k smallest (key, id)
  * pairs of the whole input, and no intermediate buffer ever exceeds
  * the documented 2k bound. Driver-side (no Spark job): 300 random
  * (input, k, partitioning, merge order) cases, seeded.
  */
class BoundedMinKSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator failed"))

  private val genCase: Gen[(Int, List[(String, Long)], List[Int], Long)] =
    for {
      k <- Gen.chooseNum(1, 12)
      n <- Gen.chooseNum(0, 120)
      // duplicate-heavy keys so ties exercise the id tiebreak
      entries <- Gen.listOfN(n, for {
        key <- Gen.oneOf("aa", "ab", "ba", "zz", "m", "aa", "")
        id <- Gen.chooseNum(0L, 40L)
      } yield (key, id))
      cuts <- Gen.listOfN(6, Gen.chooseNum(0, math.max(n, 1)))
      mergeSeed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (k, entries, cuts, mergeSeed)

  test("BoundedMinK: any partitioning + any merge tree == sort-take, " +
      "buffers bounded, 300 fuzzed cases") {
    (0 until 300).foreach { i =>
      val (k, entries, cuts, mergeSeed) = sample(genCase, 0xb0b0L + i)
      val agg = new BoundedMinK(k)
      var maxBuf = 0
      def track(b: Seq[MinKEntry]): Seq[MinKEntry] = {
        maxBuf = math.max(maxBuf, b.length); b
      }
      // split the input at the random cut points into partitions
      val bounds = (cuts :+ 0 :+ entries.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) =>
        entries.slice(a, b)
      }.filter(_.nonEmpty)
      // reduce each partition left-to-right (Spark's per-partition
      // update order), tracking the bound on every step
      var partials = parts.map(_.foldLeft(agg.zero) { (b, e) =>
        track(agg.reduce(b, MinKEntry(e._1, e._2)))
      }).toVector
      if (partials.isEmpty) partials = Vector(agg.zero)
      // merge in a random order (Spark promises no particular tree)
      val rnd = new scala.util.Random(mergeSeed)
      while (partials.size > 1) {
        val a = rnd.nextInt(partials.size)
        val ea = partials(a); partials = partials.patch(a, Nil, 1)
        val b = rnd.nextInt(partials.size)
        val eb = partials(b)
        partials = partials.updated(b, track(agg.merge(ea, eb)))
      }
      val got = agg.finish(partials.head)
      val want = entries.sortBy(e => (e._1, e._2)).take(k).map(_._2)
      assert(got == want,
        s"case $i: k=$k got=$got want=$want entries=${entries.take(20)}")
      assert(maxBuf <= 2 * k,
        s"case $i: buffer grew to $maxBuf > ${2 * k}")
    }
  }
}
