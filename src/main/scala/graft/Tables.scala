package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked loaders for the driver-generated TPC-H-ish tables.
  *
  * Analog of the reference's table readers (reference:
  * python/pyarrow/parquet.py:read_table) — in Spark the parquet DSv2
  * scan already does column pruning + predicate pushdown, so these are
  * plain declarative scans and Catalyst handles the rest.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS).
    * Spark's vectorized reader has no nanosecond timestamp type, so we
    * read nanos as long (legacy flag set in GraftSession) and derive a
    * microsecond timestamp column — the same truncation DuckDB applies
    * when it reads nanos into its native microsecond timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Runtime-settable; must be on before the scan is planned. Spark
    // otherwise rejects the file with PARQUET_TYPE_ILLEGAL.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: true division routes the ~1.7e18 ns
        // epoch through a double and loses microseconds past 2^53.
        // NTZ (naive) like the source data and like DuckDB reads it —
        // session tz is UTC so the wall clock is unchanged.
        raw.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ => raw
    }
  }
}
