package graft

class GraftServerSpec extends SparkSpec {

  test("serveRows equals a fresh collect for representative queries; " +
      "repeats hit the cache; invalidate forces a rebuild") {
    val server = new GraftServer(spark)
    // one narrow agg, one join-heavy TPC-H, one windowed query — the
    // encoder path must round-trip decimals, dates, and strings
    val names = Seq("q1_agg", "q_tpch3", "q_tpch1")
    for (name <- names) {
      val fresh = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      val served = server.serveRows(name, sfDir)
        .map(_.toString).sorted.toSeq
      assert(served == fresh, s"$name served rows diverge")
    }
    val (h1, b1) = server.counters
    assert(b1 == names.size && h1 == 0)
    // repeats: no new builds, rows unchanged
    for (name <- names) {
      val again = server.serveRows(name, sfDir)
        .map(_.toString).sorted.toSeq
      val fresh = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(again == fresh, s"$name repeat diverges")
    }
    val (h2, b2) = server.counters
    assert(b2 == names.size && h2 == names.size.toLong)
    // serve() returns a usable DataFrame without a new build
    assert(server.serve("q1_agg", sfDir).count() > 0)
    val (h3, b3) = server.counters
    assert(b3 == names.size && h3 == names.size + 1L)
    // invalidate: the next request rebuilds
    server.invalidate("q1_agg", sfDir)
    server.serveRows("q1_agg", sfDir)
    val (_, b4) = server.counters
    assert(b4 == names.size + 1L)
  }

  test("two sfDirs cache independently") {
    val server = new GraftServer(spark)
    val a = server.serveRows("q1_agg", sfDir)
    val b = server.serveRows("q1_agg", "/root/testdata/sf0.01")
    assert(a.nonEmpty && b.nonEmpty)
    val (_, builds) = server.counters
    assert(builds == 2)
    // and the bigger scale really returned the bigger aggregate input
    val sumA = a.map(_.getAs[Any]("sum_qty").toString.toDouble).sum
    val sumB = b.map(_.getAs[Any]("sum_qty").toString.toDouble).sum
    assert(sumB > sumA)
  }
}
