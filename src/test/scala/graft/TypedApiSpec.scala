package graft

import org.apache.spark.sql.functions._

/** Typed Dataset[T] surface (SURVEY §2.A7) + collect/createDataFrame
  * interop (§2.D12, the pandas_compat analog: JVM objects ⇄ DataFrame
  * with schema preserved).
  */
case class Li(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

class TypedApiSpec extends SparkSpec {
  import sqlImplicits._

  test("typed dataset over the lineitem scan") {
    val ds = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Li]
    val heavy = ds.filter(_.l_quantity > 45).map(_.l_orderkey).distinct().count()
    val sqlHeavy = Tables.lineitem(spark, sfDir)
      .where($"l_quantity" > 45).select("l_orderkey").distinct().count()
    assert(heavy == sqlHeavy)
  }

  test("case-class roundtrip: collect then createDataFrame preserves values and schema") {
    import scala.jdk.CollectionConverters._
    val orig = Seq(Li(1, 2.5, "N"), Li(2, 3.5, "A"))
    val df = orig.toDF()
    val back = spark.createDataFrame(df.collect().toList.asJava, df.schema)
    assert(back.as[Li].collect().toSeq == orig)
    assert(back.schema == df.schema)
  }

  test("arbitrary JVM object serialization via kryo encoder (serialization.py analog)") {
    // the reference serializes arbitrary (non-schema) objects; in
    // Spark that's an opaque binary encoder
    implicit val enc = org.apache.spark.sql.Encoders.kryo[Map[String, List[Int]]]
    val objs = Seq(Map("a" -> List(1, 2)), Map("b" -> List(3)))
    val ds = spark.createDataset(objs)
    assert(ds.schema.head.dataType.typeName == "binary")
    assert(ds.collect().toSeq == objs)
  }

  test("typed aggregation: groupByKey mapGroups") {
    val ds = Seq(Li(1, 1.0, "A"), Li(2, 2.0, "A"), Li(3, 3.0, "B")).toDS()
    val sums = ds.groupByKey(_.l_returnflag)
      .mapGroups((k, it) => (k, it.map(_.l_quantity).sum))
      .collect().toMap
    assert(sums == Map("A" -> 3.0, "B" -> 3.0))
  }
}
