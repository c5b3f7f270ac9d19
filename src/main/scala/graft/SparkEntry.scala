package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2/§5 for the inventory
  * and correctness strategy. Queries live in QueriesRelational /
  * QueriesPipeline (+ later registries); this object just flattens the
  * registry into the driver's map shape.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    QueriesRelational.all ++ QueriesPipeline.all ++ QueriesEvents.all ++
      QueriesFormats.all ++ QueriesTpch.all ++ QueriesCuration.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q1_agg").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
