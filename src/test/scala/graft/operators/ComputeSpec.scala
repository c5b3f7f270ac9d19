package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ComputeSpec extends SparkSpec {
  import sqlImplicits._

  test("castColumns applies the cast matrix") {
    val df = Seq(("1", 2.7, true)).toDF("s", "d", "b")
    val out = Compute.castColumns(df,
      "s" -> LongType, "d" -> IntegerType, "b" -> IntegerType).head()
    assert(out.getLong(0) == 1L)
    assert(out.getInt(1) == 2) // truncation, like arrow unsafe cast
    assert(out.getInt(2) == 1)
  }

  test("safe cast (try_cast) yields null on malformed input, like arrow's safe mode") {
    // Spark 4 runs ANSI: plain cast throws (like arrow unsafe cast);
    // try_cast is the safe variant.
    val out = Seq(("abc")).toDF("s")
      .select(expr("try_cast(s AS INT)")).head()
    assert(out.isNullAt(0))
  }

  test("unique returns distinct values") {
    val vals = Compute.unique(Seq("a", "b", "a", "c").toDF("x"), "x")
      .as[String].collect().sorted
    assert(vals.sameElements(Array("a", "b", "c")))
  }

  test("dictionaryEncode assigns sorted-order codes and joins back") {
    val df = Seq("cherry", "apple", "banana", "apple").toDF("fruit")
    val enc = Compute.dictionaryEncode(df, "fruit")
      .select("fruit", "code").as[(String, Long)].collect().toSet
    assert(enc == Set(("apple", 0L), ("banana", 1L), ("cherry", 2L)))
  }

  test("dictionaryEncode preserves null rows with null codes (arrow semantics)") {
    val df = Seq(Some("b"), None, Some("a")).toDF("x")
    val enc = Compute.dictionaryEncode(df, "x")
    assert(enc.count() == 3, "null rows must not be dropped")
    val nullRow = enc.where(col("x").isNull).head()
    assert(nullRow.isNullAt(enc.columns.indexOf("code")))
    val codes = enc.where(col("x").isNotNull)
      .select("x", "code").as[(String, Long)].collect().toSet
    assert(codes == Set(("a", 0L), ("b", 1L)))
  }

  test("dictionary is value->code, dense from 0") {
    val d = Compute.dictionary(Seq("b", "a", "b").toDF("x"), "x")
      .as[(String, Long)].collect().toSet
    assert(d == Set(("a", 0L), ("b", 1L)))
  }

  test("valueCounts") {
    val vc = Compute.valueCounts(Seq("a", "b", "a").toDF("x"), "x")
      .as[(String, Long)].collect().toSet
    assert(vc == Set(("a", 2L), ("b", 1L)))
  }

  test("approx_count_distinct is within HLL error bounds of exact") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_partkey"))).as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.1, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("hash64 is deterministic and spreads values") {
    val h = Seq("a", "b", "a").toDF("x")
      .select(Compute.hash64(col("x")).as("h")).as[Long].collect()
    assert(h(0) == h(2))
    assert(h(0) != h(1))
  }

  test("momentStats matches hand-computed moments, skew sign, and flat-kurtosis") {
    // g: 1..5 → mean 3, m2 2, m3 0 (symmetric), m4 6.8 → kurtosis -1.3
    // h: 1,1,1,10 → right tail → skewness > 0
    val df = ((1 to 5).map(v => ("g", v.toDouble)) ++
      Seq(1.0, 1.0, 1.0, 10.0).map(("h", _))).toDF("grp", "v")
    val rows = Compute.momentStats(df, "grp", "v").orderBy("grp")
      .select("grp", "n", "mean", "m2", "skewness", "kurtosis")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val g = rows(0)
    assert(g == (("g", 5L, 3.0, 2.0, 0.0, -1.3)), g.toString)
    val h2 = rows(1)
    assert(h2._2 == 4L && h2._3 == 3.25)
    assert(h2._5 > 1.0, s"expected strong right skew, got ${h2._5}")
    // builtin (population) skewness agrees in sign and roughly in value
    val builtin = df.where(col("grp") === "h")
      .select(skewness(col("v"))).as[Double].head()
    assert(math.abs(h2._5 - builtin) < 1e-6, s"moments ${h2._5} vs builtin $builtin")
  }
}
