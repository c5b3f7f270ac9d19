package graft

import org.apache.spark.sql.SparkSession

/** Recommended session wiring for the library: graft's SQL extension
  * surface plus the scale defaults every operator here assumes.
  * Returns a Builder so callers can still override anything:
  *
  * {{{
  * val spark = GraftSession.builder("my-pipeline")
  *   .master("yarn")
  *   .config("spark.sql.shuffle.partitions", 2048)
  *   .getOrCreate()
  * }}}
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      // SQL surface: minhash_sig / simhash64 / shingle_set /
      // lsh_band_keys / dot_product / unit_norm / hyperplane_bucket /
      // tensor_pack / tensor_unpack + the codec-elimination rule
      .withExtensions(new GraftExtensions)
      // runtime re-planning: partition coalescing + skew-join split
      // are load-bearing for the shuffle-heavy operators (SURVEY §4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // µs parquet timestamps interop cleanly with arrow/duckdb
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
}
