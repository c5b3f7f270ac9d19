package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic fuzz for [[TopKState]] — the primitive-buffer core of the
  * r15 native [[TopKAgg]] that replaced the udaf(BoundedTopK) path in
  * every similarity ranker. Same contract as BoundedTopKSpec: for
  * EVERY partitioning of the input and EVERY merge-tree shape
  * (including a serialize/deserialize round-trip on each partial,
  * mirroring a shuffle), the finished list equals sort-take-k under
  * Spark SQL's double ordering (NaN greatest and self-equal,
  * −0.0 == 0.0) with id-asc ties — byte-identical to the Aggregator
  * it replaced. 300 seeded cases with NaN/±0.0/±Inf/tie-heavy scores
  * plus the threshold-rejection edge (adds arriving after the buffer
  * has compacted).
  */
class TopKAggSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator failed"))

  private def sqlCmp(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else if (x == y) 0
    else java.lang.Double.compare(x, y)

  private val scoreGen: Gen[Double] = Gen.frequency(
    5 -> Gen.oneOf(0.25, 0.5, 0.5, 0.75, -0.5),
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
        id <- Gen.chooseNum(0L, 40L)
      } yield (s, id))
      cuts <- Gen.listOfN(6, Gen.chooseNum(0, math.max(n, 1)))
      mergeSeed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (k, desc, entries, cuts, mergeSeed)

  /** serialize/deserialize round-trip exactly as TopKAgg ships a
    * partial across the exchange. */
  private def roundTrip(st: TopKState, k: Int, desc: Boolean): TopKState = {
    st.compact()
    val out = new TopKState(k, desc)
    var i = 0
    while (i < st.size) { out.add(st.scores(i), st.ids(i)); i += 1 }
    out
  }

  test("TopKState: any partitioning + any merge tree (+ shuffle " +
      "round-trip) == sort-take under SQL double order, 300 fuzzed cases") {
    (0 until 300).foreach { i =>
      val (k, desc, entries, cuts, mergeSeed) = sample(genCase, 0x70b1L + i)
      val bounds = (cuts :+ 0 :+ entries.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) =>
        entries.slice(a, b)
      }.filter(_.nonEmpty)
      var partials = parts.map { p =>
        val st = new TopKState(k, desc)
        p.foreach { case (s, id) => st.add(s, id) }
        roundTrip(st, k, desc)
      }.toVector
      if (partials.isEmpty) partials = Vector(new TopKState(k, desc))
      val rnd = new scala.util.Random(mergeSeed)
      while (partials.size > 1) {
        val a = rnd.nextInt(partials.size)
        val ea = partials(a); partials = partials.patch(a, Nil, 1)
        val b = rnd.nextInt(partials.size)
        val eb = partials(b)
        val merged = partials(b)
        var j = 0
        while (j < ea.size) { merged.add(ea.scores(j), ea.ids(j)); j += 1 }
        partials = partials.updated(b, merged)
      }
      val (gs, gi, gn) = partials.head.finishSorted()
      val got = (0 until gn).map(j => (gi(j), gs(j)))
      val ord = new Ordering[(Double, Long)] {
        override def compare(a: (Double, Long), b: (Double, Long)): Int = {
          val c = if (desc) sqlCmp(b._1, a._1) else sqlCmp(a._1, b._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
      val want = entries.sorted(ord).take(k).map(e => (e._2, e._1))
      def key(e: (Long, Double)) = (e._1, java.lang.Double.doubleToLongBits(
        if (e._2 == 0.0) 0.0 else e._2))
      assert(got.map(key) == want.map(key),
        s"case $i: k=$k desc=$desc got=$got want=$want " +
          s"entries=${entries.take(20)}")
    }
  }

  test("TopKState: hand-pinned NaN/−0.0 fixture matches the window " +
      "form's documented order") {
    val st = new TopKState(3, true)
    Seq((0.0, 7L), (-0.0, 3L), (Double.NaN, 9L), (1.0, 1L))
      .foreach { case (s, id) => st.add(s, id) }
    val (_, ids, n) = st.finishSorted()
    assert(ids.take(n).toSeq == Seq(9L, 1L, 3L))
  }

  test("TopKState: threshold rejection after compaction never drops a " +
      "qualifying element (dense ascending adds, desc and asc)") {
    for (desc <- Seq(true, false); k <- Seq(1, 3, 8)) {
      val st = new TopKState(k, desc)
      // 10k adds force many compactions; then inject a best-possible
      // element late (must survive) and a worst late (must not)
      (0 until 10000).foreach(i => st.add(i.toDouble / 100.0, i.toLong))
      st.add(if (desc) 1e9 else -1e9, 999999L)
      val (ss, ii, n) = st.finishSorted()
      assert(n == k)
      assert(ii.contains(999999L), s"late best lost: desc=$desc k=$k")
      val all = (0 until 10000).map(i => (i.toDouble / 100.0, i.toLong)) :+
        ((if (desc) 1e9 else -1e9, 999999L))
      val want = (if (desc) all.sortBy { case (s, id) => (-s, id) }
                  else all.sortBy { case (s, id) => (s, id) }).take(k)
      assert((0 until n).map(j => (ss(j), ii(j))) == want)
    }
  }
}
