package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One registry row: a Spark query + (optionally) the ANSI-SQL oracle
  * DuckDB runs on the same parquet tables. Column names/types must
  * match exactly between the two — see SURVEY.md §5.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact cross-engine sum of a 2-dp double column: accumulate in
    * decimal (order-independent), surface as double.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** decimal-exact revenue term: price * (1 - discount). */
  def revenueTerm(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast(DecimalType(18, 2)) - dec2(discount))

  val sqlDsum: String => String =
    x => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlRevenue(p: String, d: String): String =
    s"CAST(SUM(CAST($p AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($d AS DECIMAL(18,2)))) AS DOUBLE)"
}
