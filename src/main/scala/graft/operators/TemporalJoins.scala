package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** As-of and range joins — the two time-series join shapes native
  * engines ship that vanilla Spark SQL lacks as operators. Both are
  * built from existing shuffles (SURVEY §2 preference (a): compose)
  * so Catalyst/AQE still own the physical plan.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` on the same key (inclusive, like DuckDB's
    * `ASOF JOIN ... ON l.ts >= r.ts`). Inner semantics: left rows with
    * no prior right row are dropped.
    *
    * Scale shape: tag and union both sides, ONE shuffle keyed by
    * `key`, one ordered window pass carrying the last non-null right
    * payload forward. Never builds per-key pairs, so a hot key costs
    * O(rows) not O(left·right) — the naive join+filter+row_number
    * form explodes exactly when as-of joins matter (dense ticks).
    * The per-key window is inherent, not incidental: an as-of match
    * is a running ORDERED carry, so each key's history must meet in
    * one task under any engine that preserves per-key order (unlike
    * the associative df/min-first decisions de-skewed elsewhere —
    * those reduce; this scans). Partition size is one entity's
    * history, the natural bound of the operator's own semantics.
    *
    * Right columns come back suffixed; the right timestamp as
    * `ts<suffix>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightVals: Seq[String], suffix: String = "_r"): DataFrame = {
    val internal = Seq("_ats", "_tag", "_rpay", "_lrow", "_match")
    val leftCols = left.columns.toSeq
    val outRight = (ts +: rightVals).map(_ + suffix)
    require(!leftCols.exists(internal.contains),
      s"asofJoin reserves internal column names ${internal.mkString(", ")}")
    require(!leftCols.exists(outRight.contains),
      s"left columns collide with suffixed right outputs: " +
        leftCols.filter(outRight.contains).mkString(", "))
    val payload = struct(
      (col(ts).as(s"$ts$suffix") +: rightVals.map(c => col(c).as(s"$c$suffix"))): _*)
    val rTagged = right.select(
      col(key), col(ts).as("_ats"), lit(0).as("_tag"),
      payload.as("_rpay"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType)
        .as("_lrow"))
    val lTagged = left.select(
      col(key), col(ts).as("_ats"), lit(1).as("_tag"),
      lit(null).cast(rTagged.schema("_rpay").dataType).as("_rpay"),
      struct(leftCols.map(col): _*).as("_lrow"))
    // right sorts before left at equal ts (tag 0 < 1) → inclusive match
    val w = Window.partitionBy(key).orderBy(col("_ats"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1 && col("_match").isNotNull)
      .select(col("_lrow.*"), col("_match.*"))
  }

  /** Range join via bucketing: rows of `left` matched to interval rows
    * of `right` with `lo <= left.value <= hi`. Each interval explodes
    * to the buckets it covers; the point side lands in exactly one
    * bucket → equi-join on the bucket key + exact BETWEEN filter. The
    * shuffle is keyed by bucket, so cost scales with interval width /
    * bucketWidth, never all-pairs. Pick bucketWidth ≈ typical interval
    * length (each interval then explodes to O(1) rows).
    */
  def rangeJoinByBucket(left: DataFrame, valueCol: String,
                        right: DataFrame, loCol: String, hiCol: String,
                        bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("_bucket",
      floor(col(valueCol) / bucketWidth).cast(LongType))
    val rb = right.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast(LongType),
        floor(col(hiCol) / bucketWidth).cast(LongType))))
    lb.join(rb, Seq("_bucket"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("_bucket")
  }
}
