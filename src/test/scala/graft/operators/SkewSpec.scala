package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import sqlImplicits._

  test("saltedJoin matches plain inner join semantics") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    // multiples of 10 map to key 1, plus i=1 itself → 101 hot rows
    assert(plain.count(_.head == 1L) == 101)
  }

  test("keySkewReport surfaces the dominant key first") {
    val df = ((1 to 90).map(_ => 7L) ++ (1 to 10).map(_.toLong)).toDF("k")
    val top = Skew.keySkewReport(df, "k", topN = 1).head()
    assert(top.getLong(0) == 7L)
    assert(top.getLong(1) == 91L) // 90 planted + the 7 from 1..10
  }
}
