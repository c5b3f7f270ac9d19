package graft

/** Driver-contract invariants: these are what the round harness
  * actually calls, so breakage here is a zero-score round.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct)}")
  }

  test("all queries have output column names matching their oracle aliases") {
    // structural check: no query output column may contain '(' — an
    // unaliased aggregate like sum(x) can never hash-match the oracle
    SparkEntry.registry.filter(_.oracle.isDefined).foreach { q =>
      val cols = q.fn(spark, sfDir).columns
      val bad = cols.filter(c => c.contains("(") || c.contains(" "))
      assert(bad.isEmpty, s"${q.name}: unaliased output columns $bad")
    }
  }

  test("every query at sf0.001 returns a non-null schema and is executable") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name has empty schema")
    }
  }

  test("no oracle-checked query is vacuous at the gate scale (sf0.01)") {
    // q_media_neardup passed its round-7 gate on an EMPTY result set —
    // both engines returned 0 rows, so the no-false-negative contract
    // was exercised on nothing and would have stayed green had the
    // operator broken. This pins the lesson as a registry-wide
    // property: at the scale the driver gate actually runs, every
    // oracle-checked query must produce at least one row, so a
    // contract oracle can never again pass on empty support.
    val gateDir = "/root/testdata/sf0.01"
    val empty = SparkEntry.registry.filter(_.oracle.isDefined).flatMap { q =>
      if (q.fn(spark, gateDir).limit(1).count() == 0) Some(q.name) else None
    }
    assert(empty.isEmpty, s"vacuous at sf0.01 (gate proves nothing): $empty")
  }

  test("every oracle-checked query is deterministic across two executions") {
    // the driver's gate hashes ordered rows — any run-to-run
    // nondeterminism (missing tiebreak, unordered result, RNG where a
    // hash belongs) fails the oracle compare; catch it here first.
    // toJSON gives comparison-safe renderings (base64 binary, JSON
    // arrays) where Row.toString would compare array identities.
    // Caveat: queries built on SessionMemo-persisted relations reread
    // the materialized cache on the second run, so for those this
    // checks determinism of the plan AROUND the memo, not of the
    // memoized computation itself (that is the oracle gate's job).
    SparkEntry.registry.filter(_.oracle.isDefined).foreach { q =>
      val a = q.fn(spark, sfDir).toJSON.collect().toSeq
      val b = q.fn(spark, sfDir).toJSON.collect().toSeq
      assert(a == b, s"${q.name} returned different rows across two runs")
    }
  }
}
